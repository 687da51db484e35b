"""WheeledLab-TPU: TPU-native wheeled-robot RL (capabilities of
UWRobotLearning/WheeledLab, built from scratch on JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"
