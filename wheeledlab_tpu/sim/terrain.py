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
import numpy as np
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

    def lookup_and_normal(self, xy: jax.Array):
        """Height AND outward normal from ONE 4-corner bilinear sample
        (analytic gradient of the bilinear patch — no extra gathers; the hot
        contact path uses this). xy: (..., 2) -> ((...), (..., 3))."""
        if self.is_flat:
            h = jnp.zeros(xy.shape[:-1], xy.dtype)
            n = jnp.zeros(xy.shape[:-1] + (3,), xy.dtype).at[..., 2].set(1.0)
            return h, n
        nx, ny = self.height.shape
        gx = jnp.clip(xy[..., 0] / self.cell + (nx - 1) / 2.0, 0.0, nx - 1.001)
        gy = jnp.clip(xy[..., 1] / self.cell + (ny - 1) / 2.0, 0.0, ny - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        fx, fy = gx - x0, gy - y0
        h00 = self.height[x0, y0]
        h01 = self.height[x0, y1]
        h10 = self.height[x1, y0]
        h11 = self.height[x1, y1]
        h = (h00 * (1 - fx) * (1 - fy) + h01 * (1 - fx) * fy
             + h10 * fx * (1 - fy) + h11 * fx * fy)
        dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / self.cell
        dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / self.cell
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n

    def normal(self, xy: jax.Array) -> jax.Array:
        """Outward surface normal at world xy. xy: (..., 2) -> (..., 3)."""
        return self.lookup_and_normal(xy)[1]

    def resample(self, new_cell: float) -> "Heightfield":
        """Bilinearly resample to a finer grid (done ONCE at task build).
        Enables single-gather nearest-neighbor scans at scan resolution —
        TPU gathers are ~1 element/cycle, so quartering the gather count
        quarters the height-scan cost."""
        if self.is_flat:
            return self
        nx, ny = self.height.shape
        extent_x = (nx - 1) * float(self.cell)
        extent_y = (ny - 1) * float(self.cell)
        mx = int(round(extent_x / new_cell)) + 1
        my = int(round(extent_y / new_cell)) + 1
        xs = (jnp.arange(mx, dtype=jnp.float32) - (mx - 1) / 2.0) * new_cell
        ys = (jnp.arange(my, dtype=jnp.float32) - (my - 1) / 2.0) * new_cell
        gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
        pts = jnp.stack([gx, gy], axis=-1)
        return Heightfield(height=self.lookup(pts),
                           cell=jnp.asarray(new_cell, jnp.float32),
                           friction=self.friction)

    def lookup_nearest(self, xy: jax.Array) -> jax.Array:
        """Nearest-cell height — ONE gather per point. xy: (..., 2) -> (...)."""
        if self.is_flat:
            return jnp.zeros(xy.shape[:-1], xy.dtype)
        nx, ny = self.height.shape
        gx = jnp.clip(jnp.round(xy[..., 0] / self.cell + (nx - 1) / 2.0),
                      0, nx - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.round(xy[..., 1] / self.cell + (ny - 1) / 2.0),
                      0, ny - 1).astype(jnp.int32)
        return self.height[gx, gy]

    def grid_scan_mxu(self, center_xy: jax.Array, yaw: jax.Array,
                      size: float, resolution: float) -> jax.Array:
        """Yaw-aligned grid scan with ZERO gathers: per-env `dynamic_slice`
        patch extraction + one-hot row/col selection contracted on the MXU.
        TPU has no hardware gather (~1 elem/cycle serialized); this form runs
        the same sampling as dense matmuls. Nearest-cell sampling — call on a
        texture resampled to ~`resolution` (see `resample`).

        center_xy: (B, 2); yaw: (B,) -> (B, n*n) heights."""
        n = int(round(size / resolution)) + 1
        nx, ny = self.height.shape
        cell = self.cell
        # static patch size: scan diagonal + margin, clamped to the texture
        p = min(int(np.ceil(size * np.sqrt(2.0) / float(cell))) + 4,
                min(nx, ny))

        axis = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) * resolution
        ox, oy = jnp.meshgrid(axis, axis, indexing="ij")
        offs_x = ox.ravel()
        offs_y = oy.ravel()                       # (n*n,)
        sel_iota = jnp.arange(p, dtype=jnp.int32)

        def one(c_xy, th):
            gx = c_xy[0] / cell + (nx - 1) / 2.0  # scalar grid coords
            gy = c_xy[1] / cell + (ny - 1) / 2.0
            sx = jnp.clip(jnp.round(gx).astype(jnp.int32) - p // 2, 0, nx - p)
            sy = jnp.clip(jnp.round(gy).astype(jnp.int32) - p // 2, 0, ny - p)
            patch = jax.lax.dynamic_slice(self.height, (sx, sy), (p, p))
            c, s = jnp.cos(th), jnp.sin(th)
            u = gx + (offs_x * c - offs_y * s) / cell - sx
            v = gy + (offs_x * s + offs_y * c) / cell - sy
            iu = jnp.clip(jnp.round(u).astype(jnp.int32), 0, p - 1)
            iv = jnp.clip(jnp.round(v).astype(jnp.int32), 0, p - 1)
            row_sel = (iu[:, None] == sel_iota[None, :]).astype(patch.dtype)
            rows = row_sel @ patch                       # (n*n, p) via MXU
            col_sel = (iv[:, None] == sel_iota[None, :]).astype(patch.dtype)
            return (rows * col_sel).sum(-1)

        return jax.vmap(one)(center_xy, yaw)

    def grid_scan(self, center_xy: jax.Array, yaw: jax.Array,
                  size: float, resolution: float,
                  nearest: bool = False) -> jax.Array:
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
        return self.lookup_nearest(pts) if nearest else self.lookup(pts)
