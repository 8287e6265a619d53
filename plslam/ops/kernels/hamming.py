"""Pallas TPU kernel: packed-bit Hamming distance matrix.

The descriptor-matching hot loop of the reference
(`BinaryDescriptorMatcher::match` for LBD lines — SURVEY.md §2.2 — and
`KeyFrame::searchByBRIEFDes` for loop closure, §2.4). Descriptors are 256-bit
packed into 8×uint32; distance = popcount(xor). The kernel tiles the [N1,N2]
output so each program XOR+popcounts a [TILE1, TILE2] block with both
descriptor slabs resident in VMEM — one pass over HBM, VPU-bound.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE1 = 128
TILE2 = 128


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    # d1: [TILE1, 8] u32, d2: [TILE2, 8] u32
    a = d1_ref[:]  # [T1,8]
    b = d2_ref[:]  # [T2,8]
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])  # [T1,T2,8]
    # cast before the reduction: Mosaic has no unsigned-int reductions
    out_ref[:] = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(d1, d2, interpret: bool = False):
    """[N1,8]u32 × [N2,8]u32 → [N1,N2] int32 Hamming distances."""
    n1, n2 = d1.shape[0], d2.shape[0]
    p1 = (-n1) % TILE1
    p2 = (-n2) % TILE2
    d1p = jnp.pad(d1, ((0, p1), (0, 0)))
    d2p = jnp.pad(d2, ((0, p2), (0, 0)))
    N1, N2 = d1p.shape[0], d2p.shape[0]
    out = pl.pallas_call(
        _hamming_kernel,
        grid=(N1 // TILE1, N2 // TILE2),
        in_specs=[
            pl.BlockSpec((TILE1, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE2, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE1, TILE2), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1, N2), jnp.int32),
        interpret=interpret,
    )(d1p, d2p)
    return out[:n1, :n2]
