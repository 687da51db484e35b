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
        # numpy leaves: terrain is captured by jitted closures and must
        # embed as HLO literals, not device buffers (see utils/host.py)
        return cls(
            height=np.zeros((1, 1), np.float32),
            cell=np.float32(1.0),
            friction=np.float32(friction),
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
        hm = jnp.asarray(self.height)  # host const -> trace-time literal
        h00 = hm[x0, y0]
        h01 = hm[x0, y1]
        h10 = hm[x1, y0]
        h11 = hm[x1, y1]
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
        hm = jnp.asarray(self.height)  # host const -> trace-time literal
        h00 = hm[x0, y0]
        h01 = hm[x0, y1]
        h10 = hm[x1, y0]
        h11 = hm[x1, y1]
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

    def extract_patch(self, center_xy: jax.Array, p: int) -> "TerrainPatch":
        """Cut a static-shape (p, p) local window around world `center_xy`
        (per env; vmap over the batch). ONE contiguous dynamic-slice replaces
        the per-wheel / per-corner single-element gathers in the contact loop
        — TPU has no hardware gather (~1 element/cycle serialized), while a
        row-contiguous slice streams at HBM bandwidth. Subsequent lookups stay
        inside the patch (see TerrainPatch.lookup_and_normal)."""
        nx, ny = self.height.shape
        gx = center_xy[0] / self.cell + (nx - 1) / 2.0
        gy = center_xy[1] / self.cell + (ny - 1) / 2.0
        sx = jnp.clip(jnp.round(gx).astype(jnp.int32) - p // 2, 0, max(nx - p, 0))
        sy = jnp.clip(jnp.round(gy).astype(jnp.int32) - p // 2, 0, max(ny - p, 0))
        patch = jax.lax.dynamic_slice(self.height, (sx, sy), (p, p))
        return TerrainPatch(height=patch, sx=sx, sy=sy, cell=self.cell,
                            friction=self.friction,
                            grid_shape=(nx, ny))

    def build_atlas(self, p: int = 24, stride: int = 6) -> "PatchAtlas":
        """Precompute every (p, p) window at `stride`-cell anchor spacing,
        stored as FLAT CONTIGUOUS ROWS (p*p,). Built once at task build.

        Why: per-env `dynamic_slice` under vmap lowers to a slice-gather that
        measures ~5.8 ms for 4096×(16,16) windows on v5e, while a flat row
        gather of the same bytes takes ~0.36 ms (embedding-lookup pattern).
        The atlas turns per-step patch extraction into exactly that row
        gather. Memory: ~(nx/stride)^2 * p^2 floats (elevation task: ~1.7 MB).
        """
        nx, ny = self.height.shape
        assert not self.is_flat, "atlas of a flat field is pointless"
        assert p <= min(nx, ny), (p, nx, ny)
        nax = max((nx - p + stride - 1) // stride + 1, 1)
        nay = max((ny - p + stride - 1) // stride + 1, 1)
        sxs = np.minimum(np.arange(nax) * stride, nx - p)
        sys_ = np.minimum(np.arange(nay) * stride, ny - p)
        # (nax, nay, p, p) -> (nax*nay, p*p) without per-window copies:
        # strided window view over the host copy of the texture
        h = np.asarray(self.height)
        win = np.lib.stride_tricks.sliding_window_view(h, (p, p))  # (nx-p+1, ny-p+1, p, p)
        rows = win[sxs[:, None], sys_[None, :]].reshape(nax * nay, p * p)
        return PatchAtlas(
            rows=np.ascontiguousarray(rows, np.float32),
            cell=np.asarray(self.cell), friction=np.asarray(self.friction),
            p=p, stride=stride, nax=nax, nay=nay, grid_shape=(nx, ny))

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


class TerrainPatch(struct.PyTreeNode):
    """Static-shape local terrain window (see Heightfield.extract_patch).

    Presents the same query surface as Heightfield (`lookup_and_normal`,
    `friction`) so the physics substep is terrain-representation-agnostic;
    lookups are one-hot row/col contractions against the resident (p, p)
    patch — pure VPU/MXU work, ZERO gathers — so the decimation loop never
    touches the global texture again."""

    height: jax.Array          # (p, p)
    sx: jax.Array              # () int32 patch origin (grid index)
    sy: jax.Array              # () int32
    cell: jax.Array            # ()
    friction: jax.Array        # ()
    grid_shape: tuple = struct.field(pytree_node=False, default=(1, 1))

    @property
    def is_flat(self) -> bool:
        return False

    def lookup_and_normal(self, xy: jax.Array):
        """Bilinear height + analytic normal inside the patch.
        xy: (..., 2) world -> ((...,), (..., 3)). Points are clamped to the
        patch (the patch is sized so in-bounds dynamics never clamp)."""
        p = self.height.shape[0]
        nx, ny = self.grid_shape
        shape = xy.shape[:-1]
        pts = xy.reshape(-1, 2)
        u = pts[:, 0] / self.cell + (nx - 1) / 2.0 - self.sx
        v = pts[:, 1] / self.cell + (ny - 1) / 2.0 - self.sy
        u = jnp.clip(u, 0.0, p - 1.001)
        v = jnp.clip(v, 0.0, p - 1.001)
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        fx = u - x0
        fy = v - y0
        iota = jnp.arange(p, dtype=jnp.int32)
        at0 = (iota[None, :] == x0[:, None]).astype(self.height.dtype)
        at1 = (iota[None, :] == (x0 + 1)[:, None]).astype(self.height.dtype)
        bt0 = (iota[None, :] == y0[:, None]).astype(self.height.dtype)
        bt1 = (iota[None, :] == (y0 + 1)[:, None]).astype(self.height.dtype)
        row_w = at0 * (1.0 - fx[:, None]) + at1 * fx[:, None]      # (m, p)
        col_w = bt0 * (1.0 - fy[:, None]) + bt1 * fy[:, None]      # (m, p)
        drow = at1 - at0
        dcol = bt1 - bt0
        # broadcast-multiply-reduce on the VPU, NOT `@`: with m=4 wheels these
        # contractions are far below MXU tile size, and DEFAULT dot precision
        # truncates f32 operands to bf16 on TPU — a ±2 mm height error the
        # suspension spring (k ~ 1e4 N/m) would turn into ~10 N force noise.
        rows = (row_w[:, :, None] * self.height[None]).sum(1)       # (m, p)
        drows = (drow[:, :, None] * self.height[None]).sum(1)       # (m, p)
        h = (rows * col_w).sum(-1)
        dhdx = (drows * col_w).sum(-1) / self.cell
        dhdy = (rows * dcol).sum(-1) / self.cell
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h.reshape(shape), n.reshape(shape + (3,))

    def _uv(self, pts: jax.Array):
        p = self.height.shape[0]
        nx, ny = self.grid_shape
        u = pts[:, 0] / self.cell + (nx - 1) / 2.0 - self.sx
        v = pts[:, 1] / self.cell + (ny - 1) / 2.0 - self.sy
        return (jnp.clip(u, 0.0, p - 1.001), jnp.clip(v, 0.0, p - 1.001))

    def grid_scan(self, center_xy: jax.Array, yaw: jax.Array,
                  size: float, resolution: float) -> jax.Array:
        """Yaw-aligned bilinear height scan from the resident patch — the
        RayCaster grid scanner (reference mushr_elevation_env_cfg.py:132-142)
        as one-hot MXU contractions, zero gathers. DEFAULT dot precision
        (bf16 operand rounding, ±2 mm on meter-scale heights) is fine here:
        the reference adds Unoise(±0.02 m) to this observation anyway.
        center_xy: (2,), yaw: () -> (n*n,) heights; vmap over envs."""
        p = self.height.shape[0]
        n = int(round(size / resolution)) + 1
        axis = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) * resolution
        ox, oy = jnp.meshgrid(axis, axis, indexing="ij")
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        pts = jnp.stack(
            [center_xy[0] + ox.ravel() * c - oy.ravel() * s,
             center_xy[1] + ox.ravel() * s + oy.ravel() * c], axis=-1)
        u, v = self._uv(pts)                                  # (n*n,)
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        fx, fy = u - x0, v - y0
        iota = jnp.arange(p, dtype=jnp.int32)
        at0 = (iota[None, :] == x0[:, None]).astype(self.height.dtype)
        at1 = (iota[None, :] == (x0 + 1)[:, None]).astype(self.height.dtype)
        bt0 = (iota[None, :] == y0[:, None]).astype(self.height.dtype)
        bt1 = (iota[None, :] == (y0 + 1)[:, None]).astype(self.height.dtype)
        row_w = at0 * (1.0 - fx[:, None]) + at1 * fx[:, None]   # (n*n, p)
        col_w = bt0 * (1.0 - fy[:, None]) + bt1 * fy[:, None]   # (n*n, p)
        rows = row_w @ self.height                               # MXU
        return (rows * col_w).sum(-1)


class PatchAtlas(struct.PyTreeNode):
    """All (p, p) terrain windows at `stride`-cell anchors, flattened to
    contiguous rows so per-env extraction is ONE embedding-style row gather
    (see Heightfield.build_atlas for the why + measured numbers).

    Coverage contract: a query point stays inside its extracted patch iff
    |point - center| ≤ (p/2 - stride/2 - 1) * cell in each axis. Elevation
    defaults (p=24, stride=6, cell=0.25 m) give 2.1 m — covering wheel reach
    + per-control-step travel (contact) and the 2.5 m scan half-diagonal."""

    rows: jax.Array            # (nax*nay, p*p)
    cell: jax.Array            # ()
    friction: jax.Array        # ()
    p: int = struct.field(pytree_node=False, default=24)
    stride: int = struct.field(pytree_node=False, default=6)
    nax: int = struct.field(pytree_node=False, default=1)
    nay: int = struct.field(pytree_node=False, default=1)
    grid_shape: tuple = struct.field(pytree_node=False, default=(1, 1))

    def lookup(self, xy: jax.Array) -> jax.Array:
        """Batched bilinear height via the atlas — a gather-free replacement
        for `Heightfield.lookup` on the hot step path (spawn-ground snapping,
        height terminations/metrics). One embedding row gather + four masked
        corner reductions over the patch rows; measured ~3x faster than the
        full-grid 4-corner element gather at 1024 envs (TPU serializes
        element gathers at ~1/cycle). xy: (B, 2) -> (B,). Heights equal
        `Heightfield.lookup` up to float associativity (same cells, same
        bilinear)."""
        p = self.p
        nx, ny = self.grid_shape
        rows, org = self.extract_rows(xy[:, 0], xy[:, 1])   # (p*p, B), (2, B)
        u = xy[:, 0] / self.cell + (nx - 1) / 2.0 - org[0]
        v = xy[:, 1] / self.cell + (ny - 1) / 2.0 - org[1]
        u = jnp.clip(u, 0.0, p - 1.001)
        v = jnp.clip(v, 0.0, p - 1.001)
        from .soa_hf import patch_corners

        h00, h01, h10, h11, fx, fy = patch_corners(rows, u, v, p)
        hr0 = (1.0 - fx) * h00 + fx * h10
        hr1 = (1.0 - fx) * h01 + fx * h11
        return hr0 * (1.0 - fy) + hr1 * fy

    def extract_rows(self, px: jax.Array, py: jax.Array):
        """Batched lane-major extraction for the fused heightfield kernel
        (ops/pallas_substep_hf.py): world centers (B,), (B,) ->
        (patch_rows (p*p, B) f32, org (2, B) f32 grid origins).

        One embedding-style row gather from the flat atlas (the measured-fast
        pattern, see Heightfield.build_atlas) + a transpose into the packed
        (rows, B) layout the kernel tiles as (rows, B/128, 128). Anchor
        selection math is identical to `extract`."""
        p, s = self.p, self.stride
        nx, ny = self.grid_shape
        gx = px / self.cell + (nx - 1) / 2.0
        gy = py / self.cell + (ny - 1) / 2.0
        ix = jnp.clip(jnp.round((gx - p / 2.0) / s).astype(jnp.int32),
                      0, self.nax - 1)
        iy = jnp.clip(jnp.round((gy - p / 2.0) / s).astype(jnp.int32),
                      0, self.nay - 1)
        sx = jnp.minimum(ix * s, nx - p)
        sy = jnp.minimum(iy * s, ny - p)
        rows = jnp.asarray(self.rows)[ix * self.nay + iy]       # (B, p*p)
        org = jnp.stack([sx, sy]).astype(jnp.float32)           # (2, B)
        return rows.T, org

    def extract(self, center_xy: jax.Array) -> TerrainPatch:
        """Nearest-anchor patch for world `center_xy` (per env; vmap)."""
        p, s = self.p, self.stride
        nx, ny = self.grid_shape
        gx = center_xy[0] / self.cell + (nx - 1) / 2.0
        gy = center_xy[1] / self.cell + (ny - 1) / 2.0
        ix = jnp.clip(jnp.round((gx - p / 2.0) / s).astype(jnp.int32), 0, self.nax - 1)
        iy = jnp.clip(jnp.round((gy - p / 2.0) / s).astype(jnp.int32), 0, self.nay - 1)
        sx = jnp.minimum(ix * s, nx - p)
        sy = jnp.minimum(iy * s, ny - p)
        patch = jnp.asarray(self.rows)[ix * self.nay + iy].reshape(p, p)
        return TerrainPatch(height=patch, sx=sx, sy=sy, cell=self.cell,
                            friction=self.friction, grid_shape=self.grid_shape)
