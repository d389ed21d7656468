"""Fused Pallas Lloyd step (SURVEY.md C8 — TPU-optimized k-means).

Why a kernel at all: the XLA Lloyd iteration is at the MXU's 128-lane
padding floor — BOTH matmuls (assignment (N,D)@(D,k) and update
(k,N)@(N,D)) pay 128 lanes for k=5 real outputs, so each iteration costs
two full padded MXU passes over x plus two HBM reads. This kernel streams
x ONCE per iteration and replaces the padded update matmul with k masked
VPU reductions over the VMEM-resident block (real FLOPs: k*N*D, not
128*N*D).

STATUS (measured 2026-08-16, v5 lite, batch 16 x (154401, 243) bf16, early
exit in both paths): fused 49 ms vs plain-XLA 23 ms real. The masked-VPU
update is INSTRUCTION-bound, not FLOP-bound: 5 masked where+add reduction
chains over (8192, 256) blocks issue ~6M VPU instructions per iteration —
slower than the padded MXU matmul they replace. The plain XLA solver stays
production (models/kmeans.py::kmeans_batch); interpret-mode parity tests
keep this kernel honest for future-hardware re-evaluation.

Design notes (v2 — the v1 failure is instructive):
  * v1 accumulated (sums, counts) into the SAME output block on every grid
    step, which serialized the grid (no DMA/compute pipelining) and used the
    padded one-hot matmul for the update: 2.5x SLOWER than XLA. v2 writes
    per-block PARTIAL sums (grid steps are independent — full pipelining)
    and reduces the (nb, k, D) partials in XLA (tiny).
  * The ones-column trick: x is padded with a constant-1 column, so the
    masked reduction's column D doubles as the member count — no separate
    count accumulation. Extending centers with their own ones-column shifts
    every assignment score by the same -1 (csq gains +1, -2*cross gains -2),
    so argmin labels are untouched — the golden contract survives verbatim.
  * Assignment scores, tie-breaks, f32 accumulation and the empty-cluster
    rule are identical to models/kmeans.py::kmeans, which remains the
    semantic reference (and the CPU/interpret-mode fallback).

Used by ``kmeans_fused`` — a drop-in for models.kmeans.kmeans (same early
exit at the Lloyd fixed point). The interpret-mode parity test
(tests/test_kmeans.py) pins the semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.models.kmeans import maximin_init

_K_PAD = 8  # center count padded to one sublane tile; fused path needs k <= 8


def _lloyd_kernel(
    x_ref,  # (1, block, Dp) mm dtype; col D is the ones-column
    c_ref,  # (1, _K_PAD, Dp) f32 extended centers (ones-col included)
    labels_ref,  # (1, 1, 8, block // 8) int32 (row-major view of the block)
    psums_ref,  # (1, 1, _K_PAD, Dp) f32 per-block partial sums
    *,
    k: int,
    block: int,
    n_rows: int,
):
    i = pl.program_id(1)
    x = x_ref[0]  # (block, Dp)
    c = c_ref[0]  # (_K_PAD, Dp) f32
    csq = jnp.sum(c * c, axis=1)  # (_K_PAD,)
    # f32 mode pins HIGHEST (Mosaic DEFAULT f32 dots round operands to bf16
    # — the precision-audit failure mode); bf16 mode stays DEFAULT-lossless
    from gabor_color_image_segmentation_tpu.ops.precision import precision_for

    prec = precision_for(x.dtype)
    cross = jnp.dot(
        x, c.T.astype(x.dtype), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (block, _K_PAD)
    scores = csq - 2.0 * cross
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(lane < k, scores, jnp.float32(3.4e38))
    labels = jnp.argmin(scores, axis=1).astype(jnp.int32)  # (block,) sublanes

    row = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    valid = (row + i * block) < n_rows  # (block, 1); padded rows get no vote

    for j in range(_K_PAD):
        if j < k:
            m = (labels == j)[:, None] & valid
            psums_ref[0, 0, j] = jnp.sum(
                jnp.where(m, x, jnp.zeros_like(x)).astype(jnp.float32), axis=0
            )
        else:
            psums_ref[0, 0, j] = jnp.zeros_like(psums_ref[0, 0, j])
    labels_ref[0, 0] = labels.reshape(8, block // 8)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _lloyd_pass(x_ext, centers_ext, k: int, block: int, n_rows: int, interpret: bool):
    """One fused assignment+accumulate pass over the whole batch.

    x_ext: (B, N_pad, Dp) with ones-column; centers_ext: (B, _K_PAD, Dp) f32.
    Returns (labels (B, N_pad) int32, sums (B, _K_PAD, Dp) f32) where
    sums[..., d_ones] is the member count.
    """
    b, n_pad, dp = x_ext.shape
    nb = n_pad // block
    kernel = functools.partial(_lloyd_kernel, k=k, block=block, n_rows=n_rows)
    labels, psums = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block, dp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _K_PAD, dp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 8, block // 8), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _K_PAD, dp), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nb, 8, block // 8), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, _K_PAD, dp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n_pad * dp * _K_PAD * 16 + 3 * b * n_pad * dp * k),
            bytes_accessed=int(x_ext.dtype.itemsize * b * n_pad * dp),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_ext, centers_ext)
    return labels.reshape(b, n_pad), jnp.sum(psums, axis=1)


def _extend(x: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, int]:
    """(B, N, D) -> (B, N_pad, Dp) mm-dtype with a ones-column at index D and
    zero padding beyond; N padded to a block multiple. Returns (x_ext, Dp)."""
    b, n, d = x.shape
    dp = -(-(d + 1) // 128) * 128
    block = _block_for(n)
    n_pad = -(-n // block) * block
    out = jnp.zeros((b, n_pad, dp), dtype)
    out = out.at[:, :n, :d].set(x.astype(dtype))
    out = out.at[:, :n, d].set(1.0)
    return out, dp


def _block_for(n: int) -> int:
    for blk in (8192, 4096, 2048, 1024, 512, 256, 128, 8):
        if blk <= n:
            return blk
    return 8


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def kmeans_fused(
    x: jnp.ndarray, k: int, n_iter: int = 25, dtype=jnp.float32, init_stride: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched drop-in for vmapped models.kmeans.kmeans, single-pass Lloyd.

    x: (B, N, D) -> (labels (B, N) int32, centers (B, k, D) f32). Requires
    k <= 8 (one sublane tile of centers); callers dispatch to the XLA path
    otherwise (models/kmeans.py::kmeans_batch).
    """
    if x.ndim == 2:  # single image convenience
        labels, centers = kmeans_fused(x[None], k, n_iter, dtype, init_stride)
        return labels[0], centers[0]
    if k > _K_PAD:
        raise ValueError(f"fused Lloyd supports k <= {_K_PAD}, got {k}")
    b, n, d = x.shape
    block = _block_for(n)
    x_ext, dp = _extend(x, dtype)
    # the ones-column shifts every maximin distance equally -> same seeds
    centers0 = jax.vmap(lambda xe: maximin_init(xe, k, init_stride))(
        x_ext[:, :n]
    ).astype(jnp.float32)
    cpad = jnp.zeros((b, _K_PAD, dp), jnp.float32).at[:, :k].set(centers0)
    interpret = jax.default_backend() != "tpu"

    def update(centers_ext):
        labels, sums = _lloyd_pass(x_ext, centers_ext, k, block, n, interpret)
        counts = sums[:, :, d]  # ones-column = member count
        new = sums / jnp.maximum(counts, 1.0)[:, :, None]
        new = new.at[:, :, d].set(1.0)  # keep the ones-column exact
        new = jnp.where(counts[:, :, None] > 0, new, centers_ext)
        return labels, new

    # Early exit at the Lloyd fixed point (same contract as models/kmeans.py):
    # each pass assigns with the current centers AND computes the update; the
    # final pass (t == n_iter, or converged) contributes the labels.
    def cond(carry):
        _, _, _, go = carry
        return go

    def body(carry):
        t, centers_ext, _, _ = carry
        labels, upd = update(centers_ext)
        new = jnp.where(t < n_iter, upd, centers_ext)
        return t + 1, new, labels, jnp.any(new != centers_ext)

    labels0 = jnp.zeros((b, x_ext.shape[1]), jnp.int32)
    _, centers_ext, labels, _ = lax.while_loop(
        cond, body, (jnp.int32(0), cpad, labels0, True)
    )
    return labels[:, :n], centers_ext[:, :k, :d]
