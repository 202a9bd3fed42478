"""Pallas TPU kernel: streaming Gram accumulation G = Y^T Y.

This is the hot op of the identification pipeline (BASELINE.json):
the stacked regressor Y has millions of rows for long trajectories
(walkman: ~490k x ~480) and never needs to be materialized in HBM at
full length — row tiles stream HBM->VMEM and accumulate into a single
resident (P x P) block on the MXU.

The wrapper pads P up to a lane multiple (128) and the row count up to
the tile size; `gram` transparently falls back to a jnp einsum on
non-TPU backends (interpret mode is used for tests).

Augmentation trick: to also get Y^T tau and tau^T tau in the same pass,
append tau as an extra column before calling (see `gram_augmented`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(y_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    y = y_ref[:]
    out_ref[:] += jax.lax.dot_general(
        y,
        y,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def gram(Y: jax.Array, row_tile: int = 512, interpret: bool = False) -> jax.Array:
    """G = Y^T Y for a (M, P) matrix, streaming row tiles on TPU.

    Output is (P, P) float32. Rows/columns are zero-padded internally;
    padding contributes exact zeros to the Gram matrix.
    """
    M, P = Y.shape
    Pp = _round_up(max(P, 128), 128)
    Mp = _round_up(max(M, row_tile), row_tile)
    Yp = jnp.zeros((Mp, Pp), dtype=jnp.float32)
    Yp = jax.lax.dynamic_update_slice(Yp, Y.astype(jnp.float32), (0, 0))

    grid = (Mp // row_tile,)
    out = pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((Pp, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, Pp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((Pp, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Pp * Pp,
            bytes_accessed=Mp * Pp * 4 + Pp * Pp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Yp)
    return out[:P, :P]


def gram_xla(Y: jax.Array) -> jax.Array:
    """XLA reference path (also used on CPU)."""
    Y32 = Y.astype(jnp.float32)
    return jnp.einsum("mp,mq->pq", Y32, Y32, precision=jax.lax.Precision.HIGHEST)


def gram_augmented(Y: jax.Array, tau: jax.Array, use_pallas: bool | None = None):
    """Return (Y^T Y, Y^T tau, tau^T tau) in one streaming pass by
    augmenting tau as an extra column."""
    aug = jnp.concatenate([Y, tau[:, None]], axis=1)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    G = gram(aug) if use_pallas else gram_xla(aug)
    P = Y.shape[1]
    return G[:P, :P], G[:P, P], G[P, P]
