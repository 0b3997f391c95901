"""Fused descriptor-matching kernel in Pallas (TPU).

The XLA path (ops/matching.py) materializes the full (NA, NB) similarity
matrix in HBM before the row/column reductions. This kernel fuses the MXU
matmul with the top-2 row reduction so similarity tiles only ever live in
VMEM — the brute-force Matcher primitive (reference src/Matcher.cc:220-263)
without the HBM round-trip.

Schedule: grid over A row-blocks; the whole B descriptor table stays
resident in VMEM (SLAM-scale NB<=8192, D=256 -> <=8 MB, comfortably under
the ~16 MB budget). A streaming variant that revisited the output block
across a B-tile grid axis tripped Mosaic compiler crashes on this
toolchain, so the resident-B schedule is the supported one; it is also
faster at these sizes (no block re-entry overhead).

The mutual cross-check runs the same kernel with A and B swapped.
Geometric `allowed` masks are dense (NA, NB) and would defeat the fusion,
so windowed searches stay on the XLA path; this kernel serves the pure
brute-force matchers (SearchByBoW, loop association, relocalization).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _match_kernel(a_ref, b_ref, bvalid_ref, best_ref, second_ref, idx_ref):
    # all refs are 2-D with 128-multiple lane dims (the layout Mosaic
    # guarantees); outputs are (1, ta) row tiles of a (grid, ta) array
    s = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TA, NB)
    s = jnp.where(bvalid_ref[0, :][None, :] > 0, s, _NEG)
    tile_best = jnp.max(s, axis=1)
    tile_arg = jnp.argmax(s, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s2 = jnp.where(cols == tile_arg[:, None], _NEG, s)
    i = pl.program_id(0)
    best_ref[pl.ds(i, 1), :] = tile_best[None, :]
    second_ref[pl.ds(i, 1), :] = jnp.max(s2, axis=1)[None, :]
    idx_ref[pl.ds(i, 1), :] = tile_arg[None, :]


@functools.partial(jax.jit, static_argnames=("ta", "interpret"))
def row_top2(dA, dB, maskB, ta: int = 128, interpret: bool = False):
    """Fused row-wise top-2 similarity: returns (best, second, idx).

    dA: (NA, D), dB: (NB, D); NA % ta == 0 and D % 128 == 0 are the
    caller's responsibility (SLAM shapes are already padded).
    """
    NA, D = dA.shape
    NB = dB.shape[0]
    G = NA // ta
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ta, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, ta), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ta), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ta), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, ta), jnp.float32),
            jax.ShapeDtypeStruct((G, ta), jnp.float32),
            jax.ShapeDtypeStruct((G, ta), jnp.int32),
        ],
        interpret=interpret,
    )(dA, dB, maskB.astype(jnp.int32)[None, :])
    return best.reshape(NA), second.reshape(NA), idx.reshape(NA)


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio", "interpret"))
def match_descriptors_fused(
    dA, maskA, dB, maskB,
    max_dist: float = 0.6, ratio: float = 1.0, interpret: bool = False,
):
    """Drop-in for ops.matching.match_descriptors (mutual=True, no allowed
    mask): fused Pallas forward+reverse top-2 passes + on-device gating.
    Returns (idx (NA,) int32 or -1, dist (NA,))."""
    bestA, secondA, idxB = row_top2(dA, dB, maskB, interpret=interpret)
    _, _, idxA_of_B = row_top2(dB, dA, maskA, interpret=interpret)

    ok = bestA > _NEG / 2
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(bestA, -1.0, 1.0), 0.0))
    d2nd = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(secondA, -1.0, 1.0), 0.0))
    ok &= d < max_dist
    if ratio < 1.0:
        ok &= d < ratio * d2nd
    mutual = idxA_of_B[jnp.clip(idxB, 0, dB.shape[0] - 1)] == jnp.arange(dA.shape[0])
    ok &= mutual & maskA
    idx = jnp.where(ok, idxB, -1).astype(jnp.int32)
    return idx, jnp.where(idx >= 0, d, 0.0)
