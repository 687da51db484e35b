"""Quaternion / rotation / frame math for the vehicle simulator.

All quaternions are (w, x, y, z), matching the IsaacLab convention used by the
reference (see /root/reference .../isaaclab usage in
source/wheeledlab/wheeledlab/envs/mdp/observations.py:9-12). Everything here is
pure jax.numpy, shape-polymorphic over leading batch dims, and safe under
jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion basics
# ---------------------------------------------------------------------------


def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def quat_normalize(q: jax.Array, eps: float = 1e-9) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, (w,x,y,z)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v from body to world frame by quaternion q."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v from world to body frame by quaternion q."""
    return quat_rotate(quat_conj(q), v)


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Quaternion from intrinsic XYZ euler angles (matches isaaclab
    math_utils.quat_from_euler_xyz used at
    reference drifting/mdp/events.py:130)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(q: jax.Array) -> jax.Array:
    """Euler XYZ (roll, pitch, yaw) from quaternion; returns stacked (..., 3).

    Mirrors isaaclab math_utils.euler_xyz_from_quat semantics (used by the
    reference `root_euler_xyz` obs term, wheeledlab/envs/mdp/observations.py:9).
    Angles wrap to [0, 2π) like torch's atan2-based implementation composed with
    the reference's downstream use; we keep (-π, π] which is equivalent up to
    2π and what the roll_over check expects after subtracting π.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def yaw_from_quat(q: jax.Array) -> jax.Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_from_yaw(yaw: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(yaw)
    return quat_from_euler_xyz(zeros, zeros, yaw)


def quat_integrate(q: jax.Array, omega_w: jax.Array, dt: float) -> jax.Array:
    """Integrate quaternion by world-frame angular velocity over dt.

    q' = q + 0.5 * dt * (omega_quat ⊗ q), renormalized. Accurate for the small
    per-substep rotations of a 200 Hz integrator.
    """
    zeros = jnp.zeros_like(omega_w[..., :1])
    omega_quat = jnp.concatenate([zeros, omega_w], axis=-1)
    dq = 0.5 * dt * quat_mul(omega_quat, q)
    return quat_normalize(q + dq)


def matrix_from_quat(q: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) from quaternion (w,x,y,z)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def up_dot(q: jax.Array) -> jax.Array:
    """z-component of the body z axis in world frame — R[2,2].

    Used by the elevation `upright_penalty` term (reference
    mushr_elevation_env_cfg.py:217-222)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return 1 - 2 * (x * x + y * y)


def wrap_to_pi(angle: jax.Array) -> jax.Array:
    return jnp.arctan2(jnp.sin(angle), jnp.cos(angle))
