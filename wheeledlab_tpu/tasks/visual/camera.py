"""Batched on-device camera for the visual task — the TPU replacement for the
RTX TiledCamera (SURVEY.md §2b row 2).

The visual world is a flat colored grid (white traversable corridors on
black), so a full rasterizer is unnecessary: each pixel is one ray-ground
intersection + one map gather (projective sampling). The whole 80x60xB render
is pure VPU/gather work inside the jitted step.

Camera model parity (reference mushr_visual_env_cfg.py:230-246):
PinholeCameraCfg focal_length 1.93 mm, apertures 3.896 x 2.453 mm
(-> FOV ~90.4 x 64.9 deg), 80x60, mounted at +8 cm forward on the chassis,
ROS convention facing +x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ...utils import math as wmath

WIDTH, HEIGHT = 80, 60
FOCAL = 1.9299999475479126
APERTURE_H = 3.8959999084472656
APERTURE_V = 2.453000068664551
CAM_OFFSET_B = np.array([0.08, 0.0, 0.10], np.float32)  # camera_link offset (body frame); numpy: jit-captured


class ColorMap(struct.PyTreeNode):
    """World-grid color source. grid[row, col] in [0,1]; world x -> col,
    y -> row (reference traversability_utils.py:68-88 index convention)."""

    grid: jax.Array       # (rows, cols) f32 intensity (1 traversable, 0 not)
    cell: jax.Array       # () spacing (0.5 m)
    rows: int = struct.field(pytree_node=False, default=500)
    cols: int = struct.field(pytree_node=False, default=500)
    grid_rgb: jax.Array = None   # optional (rows, cols, 3) true-RGB world
    # colors (the reference world is an RGB-colored USD mesh; the default
    # binary world renders identically through either path)

    @property
    def width(self) -> float:
        return self.cols * float(self.cell)  # world x extent

    @property
    def height(self) -> float:
        return self.rows * float(self.cell)  # world y extent

    def sample(self, xy: jax.Array) -> jax.Array:
        """Nearest-cell intensity at world xy: (..., 2) -> (...).
        Index math mirrors TraversabilityHashmapUtil.get_map_id."""
        x, y = xy[..., 0], xy[..., 1]
        col = jnp.floor((x + self.width / 2) / self.cell).astype(jnp.int32)
        row = jnp.floor((y + self.height / 2) / self.cell).astype(jnp.int32)
        col = jnp.clip(col, 0, self.cols - 1)
        row = jnp.clip(row, 0, self.rows - 1)
        return jnp.asarray(self.grid)[row, col]  # host const -> literal

    def sample_rgb(self, xy: jax.Array) -> jax.Array:
        """Nearest-cell RGB at world xy: (..., 2) -> (..., 3). Falls back to
        replicating the grayscale grid when no RGB world was built."""
        x, y = xy[..., 0], xy[..., 1]
        col = jnp.floor((x + self.width / 2) / self.cell).astype(jnp.int32)
        row = jnp.floor((y + self.height / 2) / self.cell).astype(jnp.int32)
        col = jnp.clip(col, 0, self.cols - 1)
        row = jnp.clip(row, 0, self.rows - 1)
        if self.grid_rgb is None:
            g = jnp.asarray(self.grid)[row, col]
            return jnp.stack([g, g, g], axis=-1)
        return jnp.asarray(self.grid_rgb)[row, col]


class ColorMapAtlas(struct.PyTreeNode):
    """All (p, p) color-map windows at `stride`-cell anchors as flat rows —
    the camera-render counterpart of sim.terrain.PatchAtlas. Per-env pixel
    sampling becomes ONE row gather + one-hot MXU contractions instead of
    ~4800 serialized element gathers (TPU has no hardware gather; measured
    30 ms -> ~3 ms for 512 envs x 80x60).

    Exactness: one-hot selection of {0,1} cells is exact in bf16 MXU passes.
    Pixels whose ground hit falls outside the patch (ray length beyond
    ~(p/2 - stride/2 - 1) cells, i.e. the 2-3 pixel rows nearest the horizon
    on a flat pose) clamp to the patch border color — a deliberate far-field
    approximation; the exact `render` stays available and is the reference
    in tests."""

    rows: jax.Array            # (nax*nay, p*p) over (row, col) windows
    cell: jax.Array            # ()
    p: int = struct.field(pytree_node=False, default=40)
    stride: int = struct.field(pytree_node=False, default=8)
    nar: int = struct.field(pytree_node=False, default=1)
    nac: int = struct.field(pytree_node=False, default=1)
    map_rows: int = struct.field(pytree_node=False, default=500)
    map_cols: int = struct.field(pytree_node=False, default=500)

    @classmethod
    def build(cls, colormap: ColorMap, p: int = 40, stride: int = 8):
        import numpy as np
        g = np.asarray(colormap.grid)
        R, C = g.shape
        nar = max((R - p + stride - 1) // stride + 1, 1)
        nac = max((C - p + stride - 1) // stride + 1, 1)
        srs = np.minimum(np.arange(nar) * stride, R - p)
        scs = np.minimum(np.arange(nac) * stride, C - p)
        win = np.lib.stride_tricks.sliding_window_view(g, (p, p))
        rows = win[srs[:, None], scs[None, :]].reshape(nar * nac, p * p)
        return cls(rows=np.ascontiguousarray(rows, np.float32),
                   cell=np.asarray(colormap.cell), p=p,
                   stride=stride, nar=nar, nac=nac, map_rows=R, map_cols=C)

    def extract(self, xy: jax.Array):
        """Window anchored at world xy -> (patch (p,p), sr, sc). Per env."""
        p, s = self.p, self.stride
        width = self.map_cols * self.cell
        height = self.map_rows * self.cell
        col_f = (xy[0] + width / 2) / self.cell
        row_f = (xy[1] + height / 2) / self.cell
        ir = jnp.clip(jnp.round((row_f - p / 2.0) / s).astype(jnp.int32),
                      0, self.nar - 1)
        ic = jnp.clip(jnp.round((col_f - p / 2.0) / s).astype(jnp.int32),
                      0, self.nac - 1)
        sr = jnp.minimum(ir * s, self.map_rows - p)
        sc = jnp.minimum(ic * s, self.map_cols - p)
        return (jnp.asarray(self.rows)[ir * self.nac + ic].reshape(p, p),
                sr, sc)

    def sample_patch(self, patch: jax.Array, sr: jax.Array, sc: jax.Array,
                     xy: jax.Array) -> jax.Array:
        """ColorMap.sample (nearest/floor cell) against a resident patch via
        one-hot row/col contractions. xy: (m, 2) -> (m,). Out-of-patch points
        clamp to the border."""
        return self.sample_patch_xy(patch, sr, sc, xy[:, 0], xy[:, 1])

    def sample_patch_xy(self, patch: jax.Array, sr: jax.Array, sc: jax.Array,
                        x: jax.Array, y: jax.Array) -> jax.Array:
        """`sample_patch` on separate x/y component arrays (any shape) —
        the hot render path keeps hit coordinates as planar components so no
        (..., 2)/(..., 3) stacked intermediates ever materialize in HBM."""
        p = self.p
        shape = x.shape
        width = self.map_cols * self.cell
        height = self.map_rows * self.cell
        col = (jnp.floor((x + width / 2) / self.cell).astype(jnp.int32)
               - sc).reshape(-1)
        row = (jnp.floor((y + height / 2) / self.cell).astype(jnp.int32)
               - sr).reshape(-1)
        col = jnp.clip(col, 0, p - 1)
        row = jnp.clip(row, 0, p - 1)
        # one-hot row/col contraction, NOT a gather: measured IN CONTEXT
        # (full training rollout) a `patch.reshape(p*p)[row*p+col]` batched
        # gather runs the iteration at 2174 ms vs 42.5 ms — the rollout
        # program lowers it to the serialized element-gather path, even
        # though the same expression microbenches at 58 us standalone
        # (where XLA picks a specialized lowering). Fourth documented
        # attempt on this sampler; the one-hot MXU form stands.
        iota = jnp.arange(p, dtype=jnp.int32)
        row_sel = (iota[None, :] == row[:, None]).astype(patch.dtype)
        col_sel = (iota[None, :] == col[:, None]).astype(patch.dtype)
        rows = row_sel @ patch                        # (m, p) via MXU
        return (rows * col_sel).sum(-1).reshape(shape)


def near_split_row(crop_top: int, near_slack_m: float,
                   cam_z_max: float = 0.25,
                   margin_deg: float = 5.0) -> int:
    """First cropped-image row (top-down) whose WHOLE row is guaranteed to
    hit the ground within `near_slack_m` of the camera for any vehicle
    attitude within `margin_deg` of level — the static far/near split for
    the two-patch renderer. Computed from the static ray table in numpy at
    build time."""
    rz = np.asarray(_RAYS[crop_top:, :, 2])
    dep = -np.arcsin(np.clip(rz, -1.0, 1.0))          # depression angle, rad
    dep_worst = dep - np.deg2rad(margin_deg)
    # worst-case ground distance for the row's shallowest pixel
    row_min = dep_worst.min(axis=1)
    safe = np.tan(np.maximum(row_min, 1e-3)) >= cam_z_max / near_slack_m
    idx = np.nonzero(safe)[0]
    return int(idx[0]) if idx.size else rz.shape[0]


def render_fast(atlas: ColorMapAtlas, pos: jax.Array, quat: jax.Array,
                crop_top: int = 0,
                near_atlas: ColorMapAtlas | None = None) -> jax.Array:
    """Patch-atlas camera render: (B, HEIGHT - crop_top, WIDTH) grayscale.
    Same ray-ground model as `render`; map sampling via ColorMapAtlas
    (gather-free, far-field border clamp — see class docstring). `crop_top`
    drops the top image rows at render time (the visual obs discards the top
    third anyway, reference mdp_sensors/observations.py:78)."""
    cam_pos = pos + wmath.quat_rotate(quat, jnp.broadcast_to(
        CAM_OFFSET_B, pos.shape))
    # static per-pixel ray components, kept PLANAR: the rotation below is 9
    # scalar-broadcast FMAs per component instead of quat_rotate over a
    # stacked (h, W, 3) — the stacked form materialized ~20 MB of (B, h, W,
    # {2,3}) intermediates per control step in HBM (measured ~5 ms of the
    # 35 ms visual rollout at 512 envs; same trick as the SoA physics)
    rx = _RAYS[crop_top:, :, 0]
    ry = _RAYS[crop_top:, :, 1]
    rz = _RAYS[crop_top:, :, 2]

    # optional two-patch sampling: rows guaranteed to hit the ground close
    # to the camera (the bottom ~55% of the image) sample a SMALL near
    # patch — the one-hot contraction cost scales with p^2, and p=24 vs 40
    # is 2.8x cheaper for those pixels. Far rows keep the big patch. Pixels
    # outside their patch clamp to the border (the same far-field
    # approximation the single-patch path already makes at ~7.5 m).
    # MEASURED NEGATIVE on the training hot path (42.5 -> 46.8 ms/iter at
    # 512 envs): splitting the single well-packed (3200, p) @ (p, p)
    # batched contraction into two half-height ones costs more MXU packing
    # efficiency than the smaller patch saves — kept as an option for
    # larger images where the arithmetic favors it.
    split = (near_split_row(
        crop_top, (near_atlas.p / 2 - near_atlas.stride / 2 - 1)
        * float(near_atlas.cell)) if near_atlas is not None else None)

    def one(cp, q):
        qw, qx, qy, qz = q[0], q[1], q[2], q[3]
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qw * qz)
        r02 = 2 * (qx * qz + qw * qy)
        r10 = 2 * (qx * qy + qw * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qw * qx)
        r20 = 2 * (qx * qz - qw * qy)
        r21 = 2 * (qy * qz + qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        dx = r00 * rx + r01 * ry + r02 * rz               # (h, W)
        dy = r10 * rx + r11 * ry + r12 * rz
        dz = r20 * rx + r21 * ry + r22 * rz
        t = -cp[2] / jnp.where(dz < -1e-6, dz, -1e-6)
        hx = cp[0] + t * dx
        hy = cp[1] + t * dy
        patch, sr, sc = atlas.extract(cp[:2])
        if split is None or split >= hx.shape[0]:
            color = atlas.sample_patch_xy(patch, sr, sc, hx, hy)
        else:
            npatch, nsr, nsc = near_atlas.extract(cp[:2])
            color = jnp.concatenate([
                atlas.sample_patch_xy(patch, sr, sc,
                                      hx[:split], hy[:split]),
                near_atlas.sample_patch_xy(npatch, nsr, nsc,
                                           hx[split:], hy[split:]),
            ], axis=0)
        return jnp.where(dz < -1e-6, color, 0.0)

    if pos.ndim == 1:
        return one(cam_pos, quat)
    return jax.vmap(one)(cam_pos, quat)


def _pixel_rays():
    """Unit ray directions in camera frame (x forward, y left, z up),
    shape (HEIGHT, WIDTH, 3). Pixel (0,0) is top-left. Computed in f32 numpy
    so module import stays off-device (utils/host.py rationale); the array
    embeds as a trace-time literal in the jitted renderers."""
    us = ((np.arange(WIDTH, dtype=np.float32) + 0.5) / WIDTH - 0.5).astype(
        np.float32)
    vs = ((np.arange(HEIGHT, dtype=np.float32) + 0.5) / HEIGHT - 0.5).astype(
        np.float32)
    # camera-frame: forward x = focal dir; left y = -u * aperture; up z = -v
    y = -(us * np.float32(APERTURE_H))[None, :].repeat(HEIGHT, 0)
    z = -(vs * np.float32(APERTURE_V))[:, None].repeat(WIDTH, 1)
    x = np.full((HEIGHT, WIDTH), FOCAL, np.float32)
    d = np.stack([x, y, z], axis=-1)
    norm = np.sqrt((d * d).sum(-1, keepdims=True, dtype=np.float32))
    return (d / norm).astype(np.float32)


_RAYS = _pixel_rays()


def render(colormap: ColorMap, pos: jax.Array, quat: jax.Array) -> jax.Array:
    """Render grayscale (..., HEIGHT, WIDTH) images for vehicle pose(s).

    Ray-ground intersection: t = -o_z / d_z for downward rays; above-horizon
    pixels render 0 (black, matching the black world edge)."""
    cam_pos = pos + wmath.quat_rotate(quat, jnp.broadcast_to(
        CAM_OFFSET_B, pos.shape))

    def one(cp, q):
        d_world = wmath.quat_rotate(q[None, None, :], _RAYS)  # (H, W, 3)
        dz = d_world[..., 2]
        t = -cp[2] / jnp.where(dz < -1e-6, dz, -1e-6)
        hit_xy = cp[None, None, :2] + t[..., None] * d_world[..., :2]
        color = colormap.sample(hit_xy)
        return jnp.where(dz < -1e-6, color, 0.0)

    if pos.ndim == 1:
        return one(cam_pos, quat)
    return jax.vmap(one)(cam_pos, quat)


LUMA = np.array([0.299, 0.587, 0.114], np.float32)  # torchvision grayscale


def render_rgb(colormap: ColorMap, pos: jax.Array, quat: jax.Array) -> jax.Array:
    """True-RGB render (..., HEIGHT, WIDTH, 3) — the `camera_data_rgb`
    sensor output (reference visual/mdp_sensors/observations.py:60-62); the
    grayscale obs terms are derived from it via LUMA like torchvision's
    rgb_to_grayscale. Uses the exact per-pixel sampler (no atlas fast path —
    this is the parity surface, not the training hot path)."""
    cam_pos = pos + wmath.quat_rotate(quat, jnp.broadcast_to(
        CAM_OFFSET_B, pos.shape))

    def one(cp, q):
        d_world = wmath.quat_rotate(q[None, None, :], _RAYS)
        dz = d_world[..., 2]
        t = -cp[2] / jnp.where(dz < -1e-6, dz, -1e-6)
        hit_xy = cp[None, None, :2] + t[..., None] * d_world[..., :2]
        color = colormap.sample_rgb(hit_xy)
        return jnp.where((dz < -1e-6)[..., None], color, 0.0)

    if pos.ndim == 1:
        return one(cam_pos, quat)
    return jax.vmap(one)(cam_pos, quat)


def camera_rgb_flattened(colormap: ColorMap, pos: jax.Array,
                         quat: jax.Array) -> jax.Array:
    """Non-augmented flattened camera obs through the TRUE RGB path —
    `camera_data_rgb_flattened` parity (reference observations.py:64-73:
    crop top third -> grayscale -> gray_normalize -> flatten)."""
    crop = HEIGHT // 3
    rgb = render_rgb(colormap, pos, quat)[..., crop:, :, :]
    gray = rgb @ jnp.asarray(LUMA)
    norm = (gray - 0.5) / 0.5
    return norm.reshape(norm.shape[:-2] + (-1,))


def render_depth(pos: jax.Array, quat: jax.Array) -> jax.Array:
    """Distance-to-ground-plane depth image (..., HEIGHT, WIDTH) — the
    `camera_data_depth` obs variant (reference
    visual/mdp_sensors/observations.py:89-91). Above-horizon pixels clamp to
    the far clip (100 m, PinholeCameraCfg clipping_range)."""
    far = 100.0
    cam_pos = pos + wmath.quat_rotate(quat, jnp.broadcast_to(
        CAM_OFFSET_B, pos.shape))

    def one(cp, q):
        d_world = wmath.quat_rotate(q[None, None, :], _RAYS)
        dz = d_world[..., 2]
        t = -cp[2] / jnp.where(dz < -1e-6, dz, -1e-6)
        return jnp.where(dz < -1e-6, jnp.minimum(t, far), far)

    if pos.ndim == 1:
        return one(cam_pos, quat)
    return jax.vmap(one)(cam_pos, quat)


def lidar_ranges(colormap: ColorMap, pos: jax.Array, quat: jax.Array,
                 num_beams: int = 360, max_range: float = 10.0) -> jax.Array:
    """Planar lidar ranges to non-traversable cells — the `lidar_ranges` obs
    term (reference visual/mdp_sensors/observations.py:25-33; defined but
    unused by registered reference tasks, provided for completeness).
    Ray-marches the traversability grid: a hit is the first sample whose cell
    is non-traversable. Returns (..., num_beams)."""
    n_samples = 64
    angles = jnp.linspace(0.0, 2 * jnp.pi, num_beams, endpoint=False)
    ts = jnp.linspace(0.1, max_range, n_samples)

    def one(p, q):
        yaw = wmath.yaw_from_quat(q)
        dirs = jnp.stack(
            [jnp.cos(yaw + angles), jnp.sin(yaw + angles)], -1)  # (beams, 2)
        pts = p[None, None, :2] + ts[None, :, None] * dirs[:, None, :]
        free = colormap.sample(pts) > 0.5          # (beams, n_samples)
        blocked = ~free
        any_hit = blocked.any(axis=1)
        first = jnp.argmax(blocked, axis=1)
        return jnp.where(any_hit, ts[first], max_range)

    if pos.ndim == 1:
        return one(pos, quat)
    return jax.vmap(one)(pos, quat)


def lidar_ranges_normalized(colormap: ColorMap, pos: jax.Array,
                            quat: jax.Array, key: jax.Array,
                            num_beams: int = 360, max_range: float = 10.0,
                            noise_std: float = 0.1) -> jax.Array:
    """Noisy normalized lidar (reference observations.py:35-59)."""
    r = lidar_ranges(colormap, pos, quat, num_beams, max_range)
    r = r + noise_std * jax.random.normal(key, r.shape)
    r = jnp.clip(r, 0.0, max_range)
    return r / max_range
