from .networks import ActorCritic  # noqa: F401
from .ppo import PPOCfg, TrainState, make_learner, make_ppo  # noqa: F401
from .recurrent import ActorCriticRecurrent, make_ppo_recurrent  # noqa: F401
from .runner import LogCfg, RunConfig, TrainCfg, train  # noqa: F401
from . import run_cfgs  # noqa: F401  (registers RSS_* run configs)
