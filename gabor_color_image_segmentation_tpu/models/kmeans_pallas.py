"""Fused Pallas Lloyd step (SURVEY.md C8 — TPU-optimized k-means).

The XLA Lloyd iteration reads the (N, D) feature tensor twice per iteration
(assignment matmul + update matmul, separated by the argmin so XLA cannot
fuse them). At D ~ 243 / N ~ 154k per image the solver is pure HBM
bandwidth; this kernel streams X ONCE per iteration: per N-block it computes
assignment scores, one-hot weights, and accumulates per-cluster (sum, count)
into VMEM scratch, writing them out on the last block. Centers update (the
tiny (k, D) division + empty-cluster rule) stays in XLA.

Used by ``kmeans_fused`` — a drop-in for models.kmeans.kmeans with identical
math (same assignment scores c_sq - 2 x.c, same tie-break, f32 accumulation),
so it inherits the golden-parity contract.

STATUS (measured 2026-08-16, v5 lite, batch 16 x (154401, 243), 25 iters):
fused 280-303 ms vs plain-XLA bf16 113 ms at BOTH block=2048 and block=8192
— not per-step overhead: the same-output-block accumulation serializes the
grid (no DMA/compute pipelining across steps), and the k=5-wide matmuls
waste MXU lanes. The plain XLA solver remains the production default; a
revisit needs per-block partial outputs reduced afterwards. The
interpret-mode parity test (tests/test_kmeans.py) pins the semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)


def _lloyd_step_kernel(x_ref, c_ref, sums_ref, counts_ref, *, k: int, n_rows: int):
    """One grid step: x block (BN, D), centers (k, D) -> accumulate sums/counts.

    sums_ref: (k, D) f32, counts_ref: (1, k) f32 — accumulated across the
    grid (same output block for every step; initialized at step 0).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        counts_ref[...] = jnp.zeros_like(counts_ref)

    x = x_ref[...]  # (BN, D) mm dtype
    c = c_ref[...]  # (k, D) f32
    c_mm = c.astype(x.dtype)
    c_sq = jnp.sum(c * c, axis=1)  # (k,) f32
    scores = c_sq - 2.0 * jnp.dot(
        x, c_mm.T, preferred_element_type=jnp.float32
    )  # (BN, k)

    # mask padded rows (N not divisible by block): give them no vote
    bn = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)
    valid = (row + step * bn) < n_rows  # (BN, 1)

    labels = jnp.argmin(scores, axis=1)  # (BN,)
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32) * valid.astype(
        jnp.float32
    )  # (BN, k)
    sums_ref[...] += jnp.dot(
        onehot.T.astype(x.dtype), x, preferred_element_type=jnp.float32
    )
    counts_ref[...] += jnp.sum(onehot, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _lloyd_step(x, centers, k: int, block: int, n_rows: int):
    n_pad, d = x.shape
    grid = n_pad // block
    kernel = functools.partial(_lloyd_step_kernel, k=k, n_rows=n_rows)
    sums, counts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, centers)
    return sums, counts[0]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def kmeans_fused(
    x: jnp.ndarray, k: int, n_iter: int = 25, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for models.kmeans.kmeans with a single-pass fused Lloyd step.

    x: (N, D) -> (labels (N,) int32, centers (k, D) f32).
    """
    n, d = x.shape
    # large blocks: the first attempt used 2048 (76 grid steps/image) and
    # drowned in per-step overhead; 8192 keeps the double-buffered X block
    # within the (raised) scoped-VMEM budget in both dtypes
    block = 8192
    x_mm = x.astype(dtype)
    n_pad = -(-n // block) * block
    if n_pad != n:
        x_pad = jnp.zeros((n_pad, d), dtype).at[:n].set(x_mm)
    else:
        x_pad = x_mm
    centers0 = maximin_init(x_mm, k).astype(jnp.float32)

    def body(_, centers):
        sums, counts = _lloyd_step(x_pad, centers, k, block, n)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = lax.fori_loop(0, n_iter, body, centers0)
    labels = jnp.argmin(_assign_scores(x_mm, centers, dtype), axis=1).astype(
        jnp.int32
    )
    return labels, centers
