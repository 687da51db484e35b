"""Core state / parameter pytrees for the batched vehicle simulator.

The TPU-native replacement for PhysX articulation state (SURVEY.md §2b): a
single-rigid-body chassis + 4 spring-contact wheels + servo steering, stored as
struct-of-arrays pytrees. Every field is per-vehicle; batching is `vmap` over a
leading env axis, sharding is a `NamedSharding` over that axis.

Wheel order convention everywhere: [back_left, back_right, front_left,
front_right] — matching the reference's wheel_speeds stacking
(source/wheeledlab/wheeledlab/envs/mdp/actions/ackermann_actions.py:199).
Steering order: [left, right].
Quaternions are (w, x, y, z); linear/angular velocity are world-frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class VehicleState(struct.PyTreeNode):
    pos: jax.Array        # (..., 3) world position of body origin
    quat: jax.Array       # (..., 4) world orientation (w,x,y,z)
    lin_vel: jax.Array    # (..., 3) world linear velocity of body origin
    ang_vel: jax.Array    # (..., 3) world angular velocity
    wheel_omega: jax.Array  # (..., 4) wheel spin rates (rad/s), [bl,br,fl,fr]
    steer_pos: jax.Array    # (..., 2) steering joint angles (rad), [l,r]
    steer_vel: jax.Array    # (..., 2) steering joint rates (rad/s)

    @classmethod
    def zero(cls, batch: tuple = ()) -> "VehicleState":
        f = lambda *s: jnp.zeros(batch + s, dtype=jnp.float32)
        quat = jnp.zeros(batch + (4,), jnp.float32).at[..., 0].set(1.0)
        return cls(
            pos=f(3), quat=quat, lin_vel=f(3), ang_vel=f(3),
            wheel_omega=f(4), steer_pos=f(2), steer_vel=f(2),
        )


class VehicleParams(struct.PyTreeNode):
    """Per-vehicle dynamics parameters. All fields are arrays so that domain
    randomization (reference mushr_drift_env_cfg.py:96-154) is per-env state,
    not Python-side config mutation."""

    # Rigid body
    mass: jax.Array            # () kg, chassis + payload
    inertia: jax.Array         # (3,) body-frame diagonal inertia
    com_height: jax.Array      # () height of body origin above wheel contact at rest
    gravity: jax.Array         # () m/s^2 (positive magnitude)

    # Geometry
    wheel_pos_b: jax.Array     # (4, 3) wheel attachment points in body frame
    wheel_radius: jax.Array    # ()

    # Steering servo (implicit PD; params from reference hound.py:4-12)
    steer_kp: jax.Array        # ()
    steer_kd: jax.Array        # ()
    steer_effort_limit: jax.Array  # () N*m
    steer_vel_limit: jax.Array     # () rad/s
    steer_inertia: jax.Array       # () kg*m^2 of steering assembly
    steer_limit: jax.Array         # () max |steer angle| rad

    # Drive motor (DC motor model; params from reference hound.py:13-21)
    motor_damping: jax.Array       # (4,) N*m*s/rad velocity-drive gain (DR target)
    motor_sat_effort: jax.Array    # () N*m stall torque of saturation curve
    motor_effort_limit: jax.Array  # () N*m hard clip
    motor_vel_limit: jax.Array     # () rad/s free-spin speed
    drive_mask: jax.Array          # (4,) 1.0 where the wheel is motor-driven
    wheel_inertia: jax.Array       # () kg*m^2 spin inertia per wheel

    # Tire (brush / Pacejka-lite; produces saturating lateral force => drift)
    tire_mu: jax.Array         # (4,) friction coefficient per wheel (DR buckets)
    tire_stiffness: jax.Array  # () Pacejka B (slip stiffness factor)
    tire_shape: jax.Array      # () Pacejka C (shape factor)
    rolling_resistance: jax.Array  # () N*m*s/rad-ish simple spin drag

    # Suspension / contact (replaces PhysX contact + 1e8-stiff prismatic
    # suspension joints, reference hound.py:24-34)
    susp_stiffness: jax.Array  # () N/m per wheel
    susp_damping: jax.Array    # () N*s/m per wheel
    susp_friction: jax.Array   # () N dry (Coulomb) friction of the
    # prismatic suspension joint (reference hound.py:32: friction=.5 with
    # zero damping) — opposes suspension travel, smoothed tanh for the
    # explicit integrator


def suspension_for_mass(mass, omega_n: float = 70.0, zeta: float = 0.8):
    """Per-wheel spring/damper tuned to the sprung mass: k = (m/4) w_n^2,
    d = 2 zeta (m/4) w_n. Keeps the contact integrator stable (w_n * dt << 2)
    for any DR'd mass — the reference's PhysX solver got this for free; our
    penalty contact must track mass explicitly."""
    quarter = mass / 4.0
    return quarter * omega_n**2, 2.0 * zeta * quarter * omega_n


def default_mushr_params() -> VehicleParams:
    """MuSHR-class RC car (geometry from reference common/actions.py:17-19:
    wheelbase 0.325 m, track 0.2 m, wheel radius 0.05 m; actuator constants
    from reference hound.py — HOUND_SUS_2WD_ACTUATOR_CFG)."""
    L, W, r = 0.325, 0.2, 0.05
    m = 3.8
    lx, wy = L / 2.0, W / 2.0
    h = 0.06  # body origin height above contact at rest
    ixx = m / 12.0 * (W**2 + 0.01) * 3.0
    iyy = m / 12.0 * (L**2 + 0.01) * 3.0
    izz = m / 12.0 * (L**2 + W**2) * 1.5
    wheel_pos = np.array(
        [[-lx, +wy, -h + r], [-lx, -wy, -h + r],
         [+lx, +wy, -h + r], [+lx, -wy, -h + r]], np.float32,
    )
    # numpy on purpose: these leaves get captured by jitted closures and must
    # embed as HLO literals, not device buffers (see utils/host.py).
    f32 = lambda x: np.float32(x)
    return VehicleParams(
        mass=f32(m),
        inertia=np.array([ixx, iyy, izz], np.float32),
        com_height=f32(h),
        gravity=f32(9.81),
        wheel_pos_b=wheel_pos,
        wheel_radius=f32(r),
        steer_kp=f32(100.0),
        steer_kd=f32(10.0),
        steer_effort_limit=f32(3.2),
        steer_vel_limit=f32(10.0),
        steer_inertia=f32(2e-3),
        steer_limit=f32(0.55),
        motor_damping=np.full((4,), 1000.0, np.float32),
        motor_sat_effort=f32(1.05),
        motor_effort_limit=f32(0.5),   # 2WD variant: more torque (hound.py:41)
        motor_vel_limit=f32(450.0),
        drive_mask=np.array([1.0, 1.0, 0.0, 0.0], np.float32),  # RWD
        wheel_inertia=f32(2.5e-4),
        tire_mu=np.full((4,), 1.0, np.float32),
        tire_stiffness=f32(9.0),
        tire_shape=f32(1.5),
        rolling_resistance=f32(1e-4),
        susp_stiffness=f32(suspension_for_mass(m)[0]),
        susp_damping=f32(suspension_for_mass(m)[1]),
        susp_friction=f32(0.5),   # hound.py:32
    )


def default_f1tenth_params() -> VehicleParams:
    """F1Tenth (geometry reference common/actions.py:64-66: wheelbase 0.365 m,
    track 0.284 m; actuators reference f1tenth.py:9-27, 4WD)."""
    p = default_mushr_params()
    L, W = 0.365, 0.284
    lx, wy = L / 2.0, W / 2.0
    m = 4.5
    h = 0.06
    r = 0.05
    wheel_pos = np.array(
        [[-lx, +wy, -h + r], [-lx, -wy, -h + r],
         [+lx, +wy, -h + r], [+lx, -wy, -h + r]], np.float32,
    )
    f32 = lambda x: np.float32(x)
    return p.replace(
        mass=f32(m),
        inertia=np.array(
            [m / 12 * (W**2 + 0.01) * 3.0, m / 12 * (L**2 + 0.01) * 3.0,
             m / 12 * (L**2 + W**2) * 1.5], np.float32),
        wheel_pos_b=wheel_pos,
        steer_kp=f32(120.0),
        steer_kd=f32(8.0),
        steer_effort_limit=f32(2.5),
        motor_damping=np.full((4,), 1100.0, np.float32),
        motor_sat_effort=f32(1.0),
        motor_effort_limit=f32(0.25),
        motor_vel_limit=f32(400.0),
        drive_mask=np.ones((4,), np.float32),  # 4WD
        susp_stiffness=f32(suspension_for_mass(m)[0]),
        susp_damping=f32(suspension_for_mass(m)[1]),
    )


def with_mass(params: VehicleParams, mass) -> VehicleParams:
    """Set (possibly batched) chassis mass, retuning suspension to match —
    use for mass domain randomization."""
    k, d = suspension_for_mass(mass)
    return params.replace(mass=jnp.asarray(mass, jnp.float32),
                          susp_stiffness=k, susp_damping=d)


def batch_params(params: VehicleParams, num_envs: int) -> VehicleParams:
    """Broadcast single-vehicle params to a batch (leading env axis)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), params
    )
