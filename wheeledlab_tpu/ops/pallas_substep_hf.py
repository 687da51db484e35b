"""Fused Pallas TPU kernel for the HEIGHTFIELD vehicle physics step.

Rough-terrain counterpart of `ops/pallas_substep.py` (SURVEY.md §2b row 1):
one `pallas_call` executes ALL `decimation` substeps for a tile of
environments with BOTH the vehicle state and each env's local terrain patch
resident in VMEM — the patch (p*p rows) is read from HBM once per control
step instead of once per wheel-contact query, and the ~100 elementwise ops
per substep never round-trip to HBM. This is the elevation task's profiled
next lever (docs/ARCHITECTURE.md "Elevation profile": 33.6 ms of the 58.6 ms
iteration was decimation-10 AoS substeps with PatchAtlas contact).

Layout matches `pallas_substep.py`: packed row matrices viewed as
(rows, B/128, 128) so every physics quantity is a full (sublane, lane) VPU
tile. The patch adds p*p rows per env (p=24 -> 576 rows = 2.4 MB/tile at
sub=8), so the sublane tile is capped at 8 (vs 32 for the flat kernel) to
stay well inside the ~16 MB VMEM budget. The math is
`sim.soa_hf.substep_soa_hf` — shared verbatim with the XLA parity path, so
kernel parity is by construction (tests/test_fused_elevation.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs none of it
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from ..sim.soa_hf import NUM_PARAM, NUM_STATE, substep_soa_hf

SUB_TILE_HF = 8  # sublane tile: 8 x 128 = 1024 envs/step; patch-bounded


def _kernel(state_ref, params_ref, patch_ref, org_ref, steer_ref, wheel_ref,
            out_ref, *, dt: float, decimation: int, p: int, nx: int, ny: int,
            cell: float):
    state = state_ref[:]
    params = params_ref[:]
    patch = patch_ref[:]
    org = org_ref[:]
    steer_t = steer_ref[:]
    wheel_t = wheel_ref[:]

    def body(_, s):
        return substep_soa_hf(s, params, patch, org, steer_t, wheel_t, dt,
                              p=p, nx=nx, ny=ny, cell=cell)

    out_ref[:] = jax.lax.fori_loop(0, decimation, body, state)


@functools.partial(jax.jit, static_argnames=(
    "dt", "decimation", "p", "nx", "ny", "cell", "interpret"))
def pallas_step_hf(state: jax.Array, params: jax.Array, patch: jax.Array,
                   org: jax.Array, steer_t: jax.Array, wheel_t: jax.Array,
                   dt: float, decimation: int, p: int, nx: int, ny: int,
                   cell: float, interpret: bool = False) -> jax.Array:
    """Packed heightfield control step: (NUM_STATE, B) -> (NUM_STATE, B).

    patch: (p*p, B) per-env resident terrain rows (PatchAtlas.extract_rows);
    org: (2, B) f32 patch grid origins. B must be a multiple of 128 on TPU
    (the env layer picks batch sizes accordingly)."""
    b = state.shape[1]
    p2 = p * p
    assert patch.shape[0] == p2, (patch.shape, p)
    if b % 128 == 0:
        lanes = b // 128
        sub = next(s for s in (SUB_TILE_HF, 4, 2, 1) if lanes % s == 0)
        grid = (lanes // sub,)
        shape3 = lambda rows: (rows, lanes, 128)
        block = lambda rows: (rows, sub, 128)
        index_map = lambda i: (0, i, 0)
    else:  # interpret/test path; TPU requires lane multiples of 128
        grid = (1,)
        shape3 = lambda rows: (rows, 1, b)
        block = lambda rows: (rows, 1, b)
        index_map = lambda i: (0, 0, 0)

    def spec(rows):
        return pl.BlockSpec(
            block(rows), index_map,
            **({} if _VMEM is None else {"memory_space": _VMEM}))

    view = lambda x: x.reshape(shape3(x.shape[0]))
    out = pl.pallas_call(
        functools.partial(_kernel, dt=dt, decimation=decimation, p=p, nx=nx,
                          ny=ny, cell=cell),
        grid=grid,
        in_specs=[spec(NUM_STATE), spec(NUM_PARAM), spec(p2), spec(2),
                  spec(2), spec(4)],
        out_specs=spec(NUM_STATE),
        out_shape=jax.ShapeDtypeStruct(shape3(NUM_STATE), jnp.float32),
        interpret=interpret,
    )(view(state), view(params), view(patch), view(org), view(steer_t),
      view(wheel_t))
    return out.reshape(NUM_STATE, b)
