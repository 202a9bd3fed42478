"""Streaming Gram accumulation G = Y^T Y (the identification hot op).

The stacked regressor Y has millions of rows for long trajectories
(walkman: ~490k x ~340+) and never needs to be materialized at full
length; the production path fuses regressor generation with the Gram
contraction (model.py `_streaming_fns`), so Y never leaves registers/
VMEM at all. This module provides the standalone op for pre-stacked
matrices (random structural regressor, sharded accumulation).

Implementation notes, measured on one v5e chip (M=495k, P=340, f32,
in-jit loop so relay dispatch overhead is excluded):

  | impl                           | ms   | max rel err vs f64 |
  |--------------------------------|------|--------------------|
  | XLA einsum, default (1x bf16)  | 2.8  | 8.8e-5             |
  | XLA einsum, HIGH (3x bf16)     | 3.2  | 1.2e-5             |
  | XLA einsum, HIGHEST (6x bf16)  | 5.5  | 5.7e-6             |
  | Pallas split-2 kernel (below)  | 7.2  | 3.1e-6             |

XLA's einsum is at HBM speed-of-light here (the op is a pure row
stream into a tiny resident output block — exactly what XLA's own
pipelining does well), so `gram` dispatches to einsum-HIGH by default:
same accuracy class as the f32 accumulation floor at 1.7x the speed of
HIGHEST. The Pallas kernel is kept (method="pallas") as the building
block for kernels where the producer is fused in and XLA cannot help;
it exploits Gram symmetry to cut the split-precision cross terms to a
single MXU pass (lo.T@hi == (hi.T@lo).T), which is why its accuracy
beats einsum-HIGH, but its DMA pipeline reaches only ~60% of
streaming bandwidth — do not use it for pre-materialized inputs.

Benchmarking gotcha (cost a day): through the remote-execution relay,
`block_until_ready()` returns before the device work actually ran, and
identical dispatches are served from a cache. Time kernels with an
in-jit `lax.fori_loop` over data-perturbed iterations and force a
result fetch (`float(out[0, 0])`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(y_ref, out_ref, hl_ref):
    # Split-precision Gram: y = hi + lo in bf16, G = hh + hl + lh + ll.
    # Symmetry gives lh = hl^T (same matrix on both sides) and ll is
    # ~2^-18 relative (dropped): two bf16 MXU passes for better-than-
    # einsum-HIGH accuracy (measured 3.1e-6 vs 1.2e-5 max rel err).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        hl_ref[:] = jnp.zeros_like(hl_ref)

    y = y_ref[:]
    hi = y.astype(jnp.bfloat16)
    lo = (y - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    out_ref[:] += jax.lax.dot_general(
        hi, hi, dims, preferred_element_type=jnp.float32
    )
    hl_ref[:] += jax.lax.dot_general(
        hi, lo, dims, preferred_element_type=jnp.float32
    )

    # symmetrize the cross term once, at the last step (a per-step
    # transpose costs a lane-crossing VPU pass per tile)
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hl = hl_ref[:]
        out_ref[:] += hl + hl.T


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def gram_pallas(
    Y: jax.Array, row_tile: int = 1024, interpret: bool = False
) -> jax.Array:
    """G = Y^T Y streaming row tiles through the Pallas kernel.

    Full tiles are read straight from the source array (no padded copy;
    Mosaic lane-pads the non-128-multiple block width internally); the
    row remainder is accumulated with a small einsum. VMEM budget caps
    row_tile at ~4k for P~400.
    """
    M, P = Y.shape
    Y32 = Y.astype(jnp.float32)
    n_full = M // row_tile
    G = None
    if n_full:
        main = jax.lax.slice(Y32, (0, 0), (n_full * row_tile, P))
        G = pl.pallas_call(
            _gram_kernel,
            out_shape=jax.ShapeDtypeStruct((P, P), jnp.float32),
            grid=(n_full,),
            in_specs=[
                pl.BlockSpec(
                    (row_tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec((P, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((P, P), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=4 * n_full * row_tile * P * P,
                bytes_accessed=n_full * row_tile * P * 4 + P * P * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(main)
    if M - n_full * row_tile:
        tail = jax.lax.slice(Y32, (n_full * row_tile, 0), (M, P))
        Gt = jnp.einsum(
            "mp,mq->pq", tail, tail, precision=jax.lax.Precision.HIGHEST
        )
        G = Gt if G is None else G + Gt
    return G


def gram(
    Y: jax.Array,
    row_tile: int = 1024,
    interpret: bool = False,
    method: str = "auto",
) -> jax.Array:
    """G = Y^T Y, (P, P) float32.

    method="auto" uses the measured-fastest path (XLA einsum at HIGH
    precision — HBM speed-of-light on TPU, see module docstring);
    "pallas" forces the streaming kernel; "highest" the 6-pass einsum.
    """
    if method == "pallas" or interpret:
        return gram_pallas(Y, row_tile=row_tile, interpret=interpret)
    Y32 = Y.astype(jnp.float32)
    prec = (
        jax.lax.Precision.HIGHEST if method == "highest" else jax.lax.Precision.HIGH
    )
    return jnp.einsum("mp,mq->pq", Y32, Y32, precision=prec)


def gram_xla(Y: jax.Array) -> jax.Array:
    """XLA reference path at HIGHEST precision (also used on CPU)."""
    Y32 = Y.astype(jnp.float32)
    return jnp.einsum("mp,mq->pq", Y32, Y32, precision=jax.lax.Precision.HIGHEST)


def gram_augmented(Y: jax.Array, tau: jax.Array, use_pallas: bool | None = None):
    """Return (Y^T Y, Y^T tau, tau^T tau) in one streaming pass by
    augmenting tau as an extra column."""
    aug = jnp.concatenate([Y, tau[:, None]], axis=1)
    G = gram(aug, method="pallas" if use_pallas else "auto")
    P = Y.shape[1]
    return G[:P, :P], G[:P, P], G[P, P]
