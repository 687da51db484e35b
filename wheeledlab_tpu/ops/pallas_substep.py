"""Fused Pallas TPU kernel for the vehicle physics step (flat ground).

The hot inner loop of the whole framework (SURVEY.md §2b row 1: "tire/contact
inner loop as Pallas kernels"): one `pallas_call` executes ALL `decimation`
substeps for a tile of environments with state resident in VMEM — one HBM
read and one write per control step instead of ~100 dispatched elementwise
kernels per substep.

Layout: states/params are packed row matrices (NUM_STATE x B, NUM_PARAM x B)
so the env batch is the TPU lane dimension; each physics quantity is a (rows,
TILE_B) vector op on the VPU. The math itself is `sim.soa.substep_soa` —
shared verbatim with the XLA reference path, so kernel parity is by
construction (and asserted in tests/test_pallas.py)."""

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

TILE_B = 1024  # lane-dim tile: 8 x 128 lanes


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

    B must be a multiple of TILE_B (the env layer pads/choses batch sizes
    accordingly; standard RSS configs are 1024/512-multiples)."""
    b = state.shape[1]
    if b % TILE_B == 0:
        tile = TILE_B
    elif b % 128 == 0:
        tile = 128
    else:
        tile = b  # interpret/test path; TPU requires lane multiples of 128
    grid = (b // tile,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, tile), lambda i: (0, i),
            **({} if _VMEM is None else {"memory_space": _VMEM}))

    return pl.pallas_call(
        functools.partial(_kernel, dt=dt, decimation=decimation),
        grid=grid,
        in_specs=[spec(NUM_STATE), spec(NUM_PARAM), spec(2), spec(4)],
        out_specs=spec(NUM_STATE),
        out_shape=jax.ShapeDtypeStruct((NUM_STATE, b), jnp.float32),
        interpret=interpret,
    )(state, params, steer_t, wheel_t)
