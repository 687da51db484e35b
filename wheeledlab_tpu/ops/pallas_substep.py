"""Fused Pallas TPU kernel for the vehicle physics step (flat ground).

The hot inner loop of the whole framework (SURVEY.md §2b row 1: "tire/contact
inner loop as Pallas kernels"): one `pallas_call` executes ALL `decimation`
substeps for a tile of environments with state resident in VMEM — one HBM
read and one write per control step instead of ~100 dispatched elementwise
kernels per substep.

Layout: states/params are packed row matrices (NUM_STATE x B, NUM_PARAM x B)
viewed as (rows, B/128, 128) so each physics quantity is a full
(sublane, lane) = (SUB, 128) VPU tile — an earlier (rows, B) layout left each
quantity on a single sublane and ran 4x slower. The view is a contiguous
split of the last axis, so the reshape is free at the HBM level. The math
itself is `sim.soa.substep_soa` — shared verbatim with the XLA reference
path, so kernel parity is by construction (and asserted in
tests/test_pallas.py)."""

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

from ..sim.soa import NUM_PARAM, NUM_STATE, substep_soa

SUB_TILE = 32  # sublane-dim tile: each grid step owns 32 x 128 = 4096 envs


def _kernel(state_ref, params_ref, steer_ref, wheel_ref, out_ref,
            *, dt: float, decimation: int):
    state = state_ref[:]
    params = params_ref[:]
    steer_t = steer_ref[:]
    wheel_t = wheel_ref[:]

    def body(_, s):
        return substep_soa(s, params, steer_t, wheel_t, dt)

    out_ref[:] = jax.lax.fori_loop(0, decimation, body, state)


@functools.partial(jax.jit, static_argnames=("dt", "decimation", "interpret"))
def pallas_step(state: jax.Array, params: jax.Array, steer_t: jax.Array,
                wheel_t: jax.Array, dt: float, decimation: int,
                interpret: bool = False) -> jax.Array:
    """Packed flat-ground control step: (NUM_STATE, B) -> (NUM_STATE, B).

    B must be a multiple of 128 on TPU (the env layer pads/chooses batch
    sizes accordingly; standard RSS configs are 1024/512-multiples)."""
    b = state.shape[1]
    if b % 128 == 0:
        lanes = b // 128
        sub = next(s for s in (SUB_TILE, 16, 8, 4, 2, 1) if lanes % s == 0)
        grid = (lanes // sub,)
        shape3 = lambda rows: (rows, lanes, 128)
        block = lambda rows: (rows, sub, 128)
        index_map = lambda i: (0, i, 0)
    else:  # interpret/test path; TPU requires lane multiples of 128
        lanes, sub = 1, 1
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
        functools.partial(_kernel, dt=dt, decimation=decimation),
        grid=grid,
        in_specs=[spec(NUM_STATE), spec(NUM_PARAM), spec(2), spec(4)],
        out_specs=spec(NUM_STATE),
        out_shape=jax.ShapeDtypeStruct(shape3(NUM_STATE), jnp.float32),
        interpret=interpret,
    )(view(state), view(params), view(steer_t), view(wheel_t))
    return out.reshape(NUM_STATE, b)
