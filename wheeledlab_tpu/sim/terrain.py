"""Terrain as a batched-lookup height function — the TPU replacement for
PhysX mesh collision + the IsaacLab RayCaster (SURVEY.md §2b).

A terrain is a regular heightfield texture; height/normal queries are bilinear
gathers, which `vmap` to pure gather/FMA work on the VPU. A flat plane is the
degenerate case (zero-size grid short-circuited to constants) so the drift task
pays nothing for generality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class Heightfield(struct.PyTreeNode):
    """Regular-grid heightfield centered at the origin.

    height[i, j] is the terrain height at x = (i - (nx-1)/2) * cell,
    y = (j - (ny-1)/2) * cell.
    """

    height: jax.Array        # (nx, ny) f32 heights in meters
    cell: jax.Array          # () grid spacing in meters
    friction: jax.Array      # () ground friction multiplier (combine: multiply)

    @classmethod
    def flat(cls, friction: float = 1.0) -> "Heightfield":
        return cls(
            height=jnp.zeros((1, 1), jnp.float32),
            cell=jnp.asarray(1.0, jnp.float32),
            friction=jnp.asarray(friction, jnp.float32),
        )

    @property
    def is_flat(self) -> bool:
        return self.height.shape == (1, 1)

    def lookup(self, xy: jax.Array) -> jax.Array:
        """Bilinear height at world xy. xy: (..., 2) -> (...)."""
        if self.is_flat:
            return jnp.zeros(xy.shape[:-1], xy.dtype)
        nx, ny = self.height.shape
        gx = xy[..., 0] / self.cell + (nx - 1) / 2.0
        gy = xy[..., 1] / self.cell + (ny - 1) / 2.0
        gx = jnp.clip(gx, 0.0, nx - 1.001)
        gy = jnp.clip(gy, 0.0, ny - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        fx = gx - x0
        fy = gy - y0
        h00 = self.height[x0, y0]
        h01 = self.height[x0, y1]
        h10 = self.height[x1, y0]
        h11 = self.height[x1, y1]
        return (
            h00 * (1 - fx) * (1 - fy)
            + h01 * (1 - fx) * fy
            + h10 * fx * (1 - fy)
            + h11 * fx * fy
        )

    def normal(self, xy: jax.Array) -> jax.Array:
        """Outward surface normal at world xy via central differences.
        xy: (..., 2) -> (..., 3)."""
        if self.is_flat:
            n = jnp.zeros(xy.shape[:-1] + (3,), xy.dtype)
            return n.at[..., 2].set(1.0)
        eps = self.cell * 0.5
        ex = jnp.stack([jnp.full_like(xy[..., 0], eps), jnp.zeros_like(xy[..., 0])], -1)
        ey = jnp.stack([jnp.zeros_like(xy[..., 0]), jnp.full_like(xy[..., 0], eps)], -1)
        dhdx = (self.lookup(xy + ex) - self.lookup(xy - ex)) / (2 * eps)
        dhdy = (self.lookup(xy + ey) - self.lookup(xy - ey)) / (2 * eps)
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    def grid_scan(self, center_xy: jax.Array, yaw: jax.Array,
                  size: float, resolution: float) -> jax.Array:
        """Yaw-aligned grid of height samples around center — the RayCaster
        height-scanner equivalent (reference mushr_elevation_env_cfg.py:132-142:
        GridPatternCfg(size=[2.5, 2.5], resolution=0.1), attach_yaw_only).

        Returns (..., n*n) heights, n = round(size/resolution) + 1.
        """
        n = int(round(size / resolution)) + 1
        axis = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) * resolution
        ox, oy = jnp.meshgrid(axis, axis, indexing="ij")
        offs = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (n*n, 2)
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
        rot_x = offs[..., 0] * c - offs[..., 1] * s
        rot_y = offs[..., 0] * s + offs[..., 1] * c
        pts = jnp.stack(
            [center_xy[..., 0:1] + rot_x, center_xy[..., 1:2] + rot_y], axis=-1
        )  # (..., n*n, 2)
        return self.lookup(pts)
