"""Batched wheeled-vehicle dynamics: the TPU-native replacement for the PhysX
GPU articulation step (SURVEY.md §2b row 1).

Model: single rigid-body chassis; four wheels attached by stiff spring-damper
contacts (this *is* the suspension — the reference's prismatic suspension
joints have stiffness 1e8, i.e. near-rigid, reference hound.py:24-34); servo
steering with implicit PD + effort clamp (ImplicitActuatorCfg parity,
hound.py:4-12); DC-motor wheel drives with saturation-curve torque clipping
(DCMotorCfg parity, hound.py:13-21); combined-slip Pacejka-lite tire producing
saturating lateral force — which is what makes controllable drifting possible.

Numerical scheme: semi-implicit Euler at the physics rate (200 Hz for drift).
The stiff couplings (servo PD, velocity drive, tire slip) are integrated with
one-step implicit linearizations so the substep is unconditionally stable at
dt = 5 ms. Everything is elementwise VPU work: `jit(vmap(substep))` fuses into
a handful of XLA kernels with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import math as wmath
from .terrain import Heightfield
from .types import VehicleParams, VehicleState


class ContactAux(NamedTuple):
    """Per-substep diagnostics (per wheel)."""

    normal_force: jax.Array   # (4,)
    long_force: jax.Array     # (4,)
    lat_force: jax.Array      # (4,)
    contact: jax.Array        # (4,) bool


def _steering_update(state: VehicleState, params: VehicleParams,
                     steer_targets: jax.Array, dt: float):
    """Implicit PD servo with effort/velocity/angle limits.

    Equivalent of PhysX implicit joint drive with the reference's steering
    gains (stiffness 100, damping 10, effort 3.2 — hound.py:4-12)."""
    inertia = params.steer_inertia
    kp, kd = params.steer_kp, params.steer_kd
    theta, omega = state.steer_pos, state.steer_vel
    denom = 1.0 + dt * kd / inertia + dt * dt * kp / inertia
    omega_impl = (omega + dt * (kp / inertia) * (steer_targets - theta)) / denom
    torque = inertia * (omega_impl - omega) / dt
    torque = jnp.clip(torque, -params.steer_effort_limit, params.steer_effort_limit)
    omega_new = omega + dt * torque / inertia
    omega_new = jnp.clip(omega_new, -params.steer_vel_limit, params.steer_vel_limit)
    theta_new = theta + dt * omega_new
    theta_clamped = jnp.clip(theta_new, -params.steer_limit, params.steer_limit)
    omega_new = jnp.where(theta_new == theta_clamped, omega_new,
                          (theta_clamped - theta) / dt)
    return theta_clamped, omega_new


def _motor_torque(params: VehicleParams, wheel_omega: jax.Array,
                  wheel_targets: jax.Array, dt: float) -> jax.Array:
    """DC-motor velocity drive, integrated implicitly then clipped by the
    motor saturation curve (DCMotor semantics: torque limit shrinks linearly
    with speed; reference hound.py:13-21)."""
    inertia = params.wheel_inertia
    d = params.motor_damping  # (4,)
    alpha = dt * d / inertia
    omega_impl = (wheel_omega + alpha * wheel_targets) / (1.0 + alpha)
    torque = inertia * (omega_impl - wheel_omega) / dt
    tau_max = jnp.clip(
        params.motor_sat_effort * (1.0 - wheel_omega / params.motor_vel_limit),
        0.0, params.motor_effort_limit)
    tau_min = jnp.clip(
        params.motor_sat_effort * (-1.0 - wheel_omega / params.motor_vel_limit),
        -params.motor_effort_limit, 0.0)
    torque = jnp.clip(torque, tau_min, tau_max)
    return torque * params.drive_mask


def _tire_forces(v_long: jax.Array, v_lat: jax.Array, wheel_omega: jax.Array,
                 fz: jax.Array, mu: jax.Array, params: VehicleParams):
    """Combined-slip Pacejka-lite: F = mu*Fz*sin(C*atan(B*s)) along the slip
    direction. Saturating lateral force vs slip angle is the property that
    produces real drifting (SURVEY.md hard part (a)).

    Returns (fx, fy, dfx_domega_bound) — the last is a positive bound on
    |d(fx)/d(wheel_omega)| used for the implicit wheel-spin update."""
    r = params.wheel_radius
    b, c = params.tire_stiffness, params.tire_shape
    from .soa import atan_approx  # shared curve; keeps Pallas/XLA bit-aligned

    denom = jnp.maximum(jnp.abs(v_long), 0.6)
    sx = (wheel_omega * r - v_long) / denom
    sy = -v_lat / denom
    s = jnp.sqrt(sx * sx + sy * sy + 1e-9)
    f_norm = jnp.sin(c * atan_approx(b * s))
    scale = mu * fz * f_norm / s
    fx = scale * sx
    fy = scale * sy
    dfx_domega = mu * fz * b * c * r / denom  # small-slip stiffness bound
    return fx, fy, dfx_domega


def substep(state: VehicleState, params: VehicleParams, terrain: Heightfield,
            steer_targets: jax.Array, wheel_targets: jax.Array,
            dt: float) -> tuple[VehicleState, ContactAux]:
    """One physics substep for a single vehicle (vmap over envs)."""
    rot = wmath.matrix_from_quat(state.quat)           # (3, 3) body->world

    # --- steering servo ---
    steer_pos, steer_vel = _steering_update(state, params, steer_targets, dt)

    # --- wheel kinematics ---
    wheel_world = state.pos[None, :] + jnp.einsum("ab,wb->wa", rot, params.wheel_pos_b)
    contact_pts = wheel_world - jnp.array([0.0, 0.0, 1.0]) * params.wheel_radius

    ground_h, normals = terrain.lookup_and_normal(wheel_world[:, :2])  # (4,), (4,3)
    penetration = ground_h + params.wheel_radius - wheel_world[:, 2]
    in_contact = penetration > 0.0

    # contact-point velocity (world)
    arm = contact_pts - state.pos[None, :]
    v_contact = state.lin_vel[None, :] + jnp.cross(
        jnp.broadcast_to(state.ang_vel, (4, 3)), arm)

    # --- normal (suspension) force ---
    pen_rate = -jnp.einsum("wa,wa->w", v_contact, normals)
    # spring + damper + suspension-joint dry friction (reference hound.py:32:
    # the prismatic suspension actuator carries friction 0.5 with zero
    # damping); Coulomb term opposes suspension travel, tanh-smoothed
    # (v_eps = 0.05 m/s) so the explicit integrator sees no discontinuity
    fz = (params.susp_stiffness * penetration
          + params.susp_damping * pen_rate
          + params.susp_friction * jnp.tanh(pen_rate * 20.0))
    fz = jnp.where(in_contact, jnp.maximum(fz, 0.0), 0.0)

    # --- tire frame: heading of each wheel projected on the contact plane ---
    steer_angles = jnp.concatenate([jnp.zeros(2), steer_pos])  # (4,): [0,0,l,r]
    cos_d, sin_d = jnp.cos(steer_angles), jnp.sin(steer_angles)
    heading_b = jnp.stack([cos_d, sin_d, jnp.zeros(4)], axis=-1)  # (4, 3)
    heading_w = jnp.einsum("ab,wb->wa", rot, heading_b)
    t_long = heading_w - jnp.einsum("wa,wa->w", heading_w, normals)[:, None] * normals
    t_long = t_long / jnp.maximum(
        jnp.linalg.norm(t_long, axis=-1, keepdims=True), 1e-6)
    t_lat = jnp.cross(normals, t_long)

    v_long = jnp.einsum("wa,wa->w", v_contact, t_long)
    v_lat = jnp.einsum("wa,wa->w", v_contact, t_lat)

    # --- tire forces ---
    mu = params.tire_mu * terrain.friction
    fx, fy, dfx_domega = _tire_forces(
        v_long, v_lat, state.wheel_omega, fz, mu, params)

    # --- wheel spin integration (motor + slip reaction, implicit) ---
    tau_motor = _motor_torque(params, state.wheel_omega, wheel_targets, dt)
    tau_slip = -fx * params.wheel_radius
    tau_roll = -params.rolling_resistance * state.wheel_omega
    inertia_w = params.wheel_inertia
    impl_denom = 1.0 + dt * dfx_domega * params.wheel_radius / inertia_w
    wheel_omega = state.wheel_omega + dt * (
        tau_motor + tau_slip + tau_roll) / inertia_w / impl_denom

    # --- chassis forces / torques ---
    f_wheels = (fz[:, None] * normals + fx[:, None] * t_long
                + fy[:, None] * t_lat)                        # (4, 3)
    f_total = f_wheels.sum(0) + jnp.array([0.0, 0.0, -1.0]) * (
        params.mass * params.gravity)
    tau_total = jnp.cross(arm, f_wheels).sum(0)

    lin_vel = state.lin_vel + dt * f_total / params.mass

    # angular update in body frame (diagonal inertia)
    omega_b = rot.T @ state.ang_vel
    tau_b = rot.T @ tau_total
    inertia = params.inertia
    omega_b = omega_b + dt * (
        tau_b - jnp.cross(omega_b, inertia * omega_b)) / inertia
    ang_vel = rot @ omega_b

    pos = state.pos + dt * lin_vel
    quat = wmath.quat_integrate(state.quat, ang_vel, dt)

    new_state = VehicleState(
        pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel,
        wheel_omega=wheel_omega, steer_pos=steer_pos, steer_vel=steer_vel)
    aux = ContactAux(normal_force=fz, long_force=fx, lat_force=fy,
                     contact=in_contact)
    return new_state, aux


def step(state: VehicleState, params: VehicleParams, terrain: Heightfield,
         steer_targets: jax.Array, wheel_targets: jax.Array,
         dt: float, decimation: int,
         atlas=None) -> tuple[VehicleState, ContactAux]:
    """Scan `decimation` physics substeps with held joint targets — the
    decimation sub-loop of ManagerBasedRLEnv.step (SURVEY.md §3.1).

    `atlas` (PatchAtlas, heightfield terrain only): extract a static (p, p)
    local terrain window ONCE per control step — a single row gather from the
    precomputed atlas — and run every substep's wheel-contact query against it
    as gather-free one-hot contractions (TerrainPatch). Removes the dominant
    cost of rough-terrain physics: TPU element gathers serialize at ~1
    element/cycle, and vmapped dynamic_slice is ~16x slower than the atlas
    row gather (measured; see Heightfield.build_atlas)."""
    local = terrain
    if atlas is not None and not terrain.is_flat:
        local = atlas.extract(state.pos[:2])

    # lax.scan over the decimation substeps. A Python unroll measures the
    # same (25.3M vs 23.7M env-steps/s at 16k envs, honest >=4-call-window
    # A/B) while inflating compile time for decimation-10 tasks — XLA
    # optimizes the inner scan fine; only the last substep's ContactAux
    # survives DCE.
    def body(s, _):
        s, aux = substep(s, params, local, steer_targets, wheel_targets, dt)
        return s, aux

    state, auxes = jax.lax.scan(body, state, None, length=decimation)
    last_aux = jax.tree_util.tree_map(lambda x: x[-1], auxes)
    return state, last_aux
