"""Fused Pallas Lloyd step (SURVEY.md C8 — TPU-optimized k-means).

Why a kernel at all: the XLA Lloyd iteration is at the MXU's 128-lane
padding floor — BOTH matmuls (assignment (N,D)@(D,k) and update
(k,N)@(N,D)) pay 128 lanes for k=5 real outputs, so each iteration costs
two full padded MXU passes over x plus two HBM reads. This kernel streams
x ONCE per iteration and replaces the padded update matmul with k masked
VPU reductions over the VMEM-resident block (real FLOPs: k*N*D, not
128*N*D).

STATUS (measured 2026-08-16, v5 lite, batch 16 x (154401, 243), 24 fixed
iterations, experiments/exp_lloyd_t_iter.py):

  * v2 (kmeans_fused, masked-VPU update): 49 ms vs plain-XLA 23 ms real —
    INSTRUCTION-bound, not FLOP-bound: 5 masked where+add reduction chains
    over (8192, 256) blocks issue ~6M VPU instructions per iteration.
    Kept as a documented dead end with interpret-mode parity tests.
  * v3 (kmeans_fused_t, transposed layout): 1.42 ms/iter bf16 vs XLA's
    3.42 (2.4x), 4.03 vs 6.85 f32 (1.7x) — at the HBM floor (one 1.27 GB
    pass over x per iteration at ~890 GB/s). PRODUCTION on TPU for k <= 8
    (dispatched from models/kmeans.py::kmeans_batch). Label agreement vs
    the XLA solver: 1.000000 (both dtypes).

The v3 fix over v1/v2: keep k on the 8-SUBLANE axis in BOTH matmuls —
assignment as (8, Dp) @ (Dp, block) and the update as a dot_general that
contracts the LANE axes ((8, block) x (Dp, block) -> (8, Dp), the Q@K^T
form the MXU runs natively) — so neither pays the 128-lane padding for
k=5, the update never touches the VPU, and each iteration streams x once
with fully pipelined grid steps.

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
from gabor_color_image_segmentation_tpu.ops.precision import precision_for

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


def _lloyd_t_kernel(
    xt_ref,  # (1, Dp, block) mm dtype, transposed features; row D is ones
    c_ref,  # (1, _K_PAD, Dp) f32 centers (ones-row entry zeroed)
    labels_ref,  # (1, 1, 1, block) int32 (lane-major, singleton sublane)
    psums_ref,  # (1, 1, _K_PAD, Dp) f32 per-block partial sums
    *,
    k: int,
    block: int,
    n_rows: int,
):
    i = pl.program_id(1)
    xt = xt_ref[0]  # (Dp, block)
    c = c_ref[0]  # (_K_PAD, Dp) f32
    prec = precision_for(xt.dtype)
    csq = jnp.sum(c * c, axis=1, keepdims=True)  # (_K_PAD, 1)
    # assignment scores with k on SUBLANES: (8, Dp) @ (Dp, block) -> (8, block)
    cross = jax.lax.dot_general(
        c.astype(xt.dtype), xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    scores = csq - 2.0 * cross  # (_K_PAD, block) f32
    sub = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    scores = jnp.where(sub < k, scores, jnp.float32(3.4e38))
    labels = jnp.argmin(scores, axis=0, keepdims=True).astype(jnp.int32)  # (1, block)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    valid = (col + i * block) < n_rows  # padded pixels get no vote
    onehot = ((sub == labels) & valid & (sub < k)).astype(xt.dtype)  # (_K_PAD, block)
    # update with k on SUBLANES: contract the LANE axes (the Q @ K^T form the
    # MXU handles natively) -> (8, Dp); ones-row of xt doubles as the count
    psums_ref[0, 0] = jax.lax.dot_general(
        onehot, xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    labels_ref[0, 0] = labels


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _lloyd_t_pass(xt, centers_pad, k: int, block: int, n_rows: int, interpret: bool):
    """One fused assignment+accumulate pass, transposed layout.

    xt: (B, Dp, Np) with a ones-row at index D; centers_pad: (B, _K_PAD, Dp)
    f32 with the ones-row entry zeroed (so it never shifts scores). Returns
    (labels (B, Np) int32, sums (B, _K_PAD, Dp) f32); sums[..., D] = counts.
    """
    b, dp, n_pad = xt.shape
    nb = n_pad // block
    kernel = functools.partial(_lloyd_t_kernel, k=k, block=block, n_rows=n_rows)
    labels, psums = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, dp, block), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _K_PAD, dp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, block), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _K_PAD, dp), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nb, 1, block), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, _K_PAD, dp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * n_pad * dp * _K_PAD),
            bytes_accessed=int(xt.dtype.itemsize * b * n_pad * dp),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, centers_pad)
    return labels.reshape(b, n_pad), jnp.sum(psums, axis=1)


def fused_solver_eligible(k: int, n: int, n_max: int = 10_000_000) -> bool:
    """Shared dispatch gate for the fused transposed solvers (k-means, GMM).

    TPU only; k on one sublane tile; pixel-scale N — tiny problems (the
    spectral-discretize k-means over ~300 superpixel rows) are
    kernel-launch-dominated, and the upper bound refuses sizes whose
    transposed copy would not fit HBM alongside the NHWC features (the
    default admits 4K frames at dp=48). ONE predicate so the kmeans/gmm and
    with_features=True/False paths of the same config never drift apart."""
    return (
        jax.default_backend() == "tpu"
        and k <= _K_PAD
        and 4096 <= n <= n_max
    )


def build_xt(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, N, D) -> the solvers' shared transposed buffer (xt_geometry
    layout): features in rows [:D], ones-row at index D, zero padding."""
    b, n, d = x.shape
    dp, n_pad, _ = xt_geometry(n, d, dtype)
    xt = jnp.zeros((b, dp, n_pad), dtype)
    xt = xt.at[:, :d, :n].set(jnp.swapaxes(x.astype(dtype), 1, 2))
    xt = xt.at[:, d, :n].set(1.0)
    return xt


def xt_geometry(n: int, d: int, dtype):
    """Padded geometry of the transposed solver layout for (n pixels, d dims):
    returns (dp, n_pad, block). dp = d + 1 (ones-row) padded to the sublane
    tile; n_pad = lane-block multiple. Shared by kmeans_fused_t and the
    transposed feature-assembly fast path so both build identical buffers."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    dp = -(-(d + 1) // sub) * sub
    block = _block_for_t(n, dp, jnp.dtype(dtype).itemsize)
    n_pad = -(-n // block) * block
    return dp, n_pad, block


def _block_for_t(n: int, dp: int, itemsize: int) -> int:
    """Lane-block size: ~2 MB of streamed x per grid step, so small-D shapes
    (config0's dp=48) get wide blocks — a fixed 2048 there means thousands of
    overhead-dominated grid steps per pass (measured: config0 62 -> 48 MP/s
    e2e). Power of two, >= 128 lanes, no wider than the padded pixel count."""
    target = max(128, (2 * 1024 * 1024) // (dp * itemsize))
    blk = min(1 << (target.bit_length() - 1), 32768)
    while blk > 128 and blk // 2 >= n:
        blk //= 2
    return blk


def _maximin_kernel(
    xt_ref,  # (1, dp, block) mm dtype
    c_ref,  # (1, 8, dp) f32; row 0 = probe center (extended, ones-entry set)
    dmin_ref,  # (1, 1, block) f32 running min-distance (ignored when reset)
    dmin_out_ref,  # (1, 1, block) f32
    best_ref,  # (1, 1, 8, dp) f32; row 0 = this block's argmax column
    bestv_ref,  # (1, 1, 1, 1) f32; this block's max value
    *,
    reset: bool,
    block: int,
    n_valid: int,
):
    i = pl.program_id(1)
    xt = xt_ref[0]  # (dp, block)
    c = c_ref[0]  # (8, dp) f32, rows 1..7 zero
    prec = precision_for(xt.dtype)
    csq = jnp.sum(c[0:1] * c[0:1])
    xsq = jnp.sum(jnp.square(xt.astype(jnp.float32)), axis=0, keepdims=True)
    cross = jax.lax.dot_general(
        c.astype(xt.dtype), xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (8, block)
    d2 = xsq - 2.0 * cross[0:1] + csq  # (1, block)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    valid = (col + i * block) < n_valid
    d2 = jnp.where(valid, d2, -jnp.inf)
    dmin_new = d2 if reset else jnp.minimum(dmin_ref[0], d2)
    dmin_out_ref[0] = dmin_new
    j = jnp.argmax(dmin_new, axis=1, keepdims=True)  # (1, 1)
    onehot = jnp.where(
        (col == j)
        & (jax.lax.broadcasted_iota(jnp.int32, (8, block), 0) == 0),
        1.0, 0.0,
    ).astype(xt.dtype)  # (8, block), single 1 at (0, j)
    best_ref[0, 0] = jax.lax.dot_general(
        onehot, xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (8, dp): row 0 = column j of xt
    bestv_ref[0, 0] = jnp.max(dmin_new, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _maximin_pass(xt, c, dmin, reset: bool, block: int, n_valid: int,
                  interpret: bool):
    """One fused maximin step: dist to c, running min, per-block argmax column.

    xt: (B, dp, Np); c: (B, 8, dp) f32 row 0 = probe; dmin: (B, Np) f32.
    Returns (dmin_out (B, Np) f32, next_center (B, dp) f32) where next_center
    is the column of xt at the global argmax of dmin_out — selected from tiny
    per-block partials, never via a lane-gather of the full array (XLA's
    dynamic column gather measured ~5 ms at config1 scale)."""
    b, dp, n_pad = xt.shape
    nb = n_pad // block
    kernel = functools.partial(
        _maximin_kernel, reset=reset, block=block, n_valid=n_valid
    )
    dmin_out, best, bestv = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, dp, block), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, dp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, dp), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 8, dp), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 1, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(6 * b * n_pad * dp),
            bytes_accessed=int(xt.dtype.itemsize * b * n_pad * dp),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, c, dmin[:, None, :])
    bi = jnp.argmax(bestv[:, :, 0, 0], axis=1)  # (B,) winning block
    nxt = jnp.take_along_axis(
        best[:, :, 0, :], bi[:, None, None], axis=1
    )[:, 0]  # (B, dp) f32
    return dmin_out[:, 0, :], nxt


def _maximin_init_t_fused(
    xt: jnp.ndarray, k: int, n: int, block: int, interpret: bool
) -> jnp.ndarray:
    """Pallas maximin seeding on the transposed layout (stride-1 only).

    Same seed sequence as _maximin_init_t / models.kmeans.maximin_init: probe
    the extended mean, then farthest-point steps on the f32 running min. Each
    step is ONE fused HBM pass; the XLA form measured ~2x slower inside the
    composed solver program (scheduling + full-array column gathers).
    """
    b, dp, n_pad = xt.shape
    mean = (jnp.sum(xt, axis=2, dtype=jnp.float32) / n)  # (B, dp) f32
    centers = jnp.zeros((b, k, dp), jnp.float32)
    dmin = jnp.zeros((b, n_pad), jnp.float32)
    c = mean
    for step in range(k):
        cpad8 = jnp.zeros((b, 8, dp), jnp.float32).at[:, 0].set(c)
        dmin, c = _maximin_pass(
            xt, cpad8, dmin, step < 2, block, n, interpret
        )
        centers = centers.at[:, step].set(c)
    return centers


def _maximin_init_t(xt: jnp.ndarray, k: int, n: int, stride: int = 1) -> jnp.ndarray:
    """Transposed-layout maximin seeding: xt (B, Dp, Np) -> (B, k, Dp) f32.

    Same math as models.kmeans.maximin_init, but every distance pass is a
    batched (1, Dp) @ (Dp, N) matvec with the OUTPUT on lanes — the row-major
    form pays the 128-lane padding on its (N, Dp) @ (Dp, 1) matvec instead
    (measured 2.4 ms/pass vs the ~1.5 ms HBM floor at config1 scale).

    Distances are computed on the EXTENDED vectors verbatim: the ones-row
    contributes +1 (|x|^2) - 2 (x.c) + 1 (|c|^2) = 0, so they equal the true
    feature-space distances exactly; zero-padded rows contribute nothing.
    Padded/invalid columns are masked to -inf so they never seed.
    """
    b, dp, n_pad = xt.shape
    view = xt[:, :, ::stride] if stride > 1 else xt
    nv = view.shape[2]
    n_real = -(-n // stride)  # real (strided) pixels are a prefix of columns
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1) < n_real
    xsq = jnp.sum(jnp.square(view.astype(jnp.float32)), axis=1)  # (B, nv)

    def dist_to(c):  # c: (B, dp) view dtype -> (B, nv) f32, -inf off the end
        # VPU broadcast-multiply-reduce, NOT a matvec: an M=1 dot_general is
        # MXU weight-load-bound (each 128x128 xt tile loads for one row of
        # output — measured ~3x the HBM floor per pass inside the composed
        # program); the elementwise form streams xt once at memory speed.
        # f32 products of bf16 operands are exact, so bf16 mode matches the
        # MXU scores up to summation order.
        cf = c.astype(jnp.float32)
        cross = jnp.sum(view.astype(jnp.float32) * cf[:, :, None], axis=1)
        d2 = xsq - 2.0 * cross + jnp.sum(cf * cf, axis=1, keepdims=True)
        return jnp.where(valid, d2, -jnp.inf)

    def col_at(idx):  # (B,) int -> (B, dp) gather of one column per image
        return jnp.take_along_axis(view, idx[:, None, None], axis=2)[..., 0]

    mean = (jnp.sum(view, axis=2, dtype=jnp.float32) / n_real).astype(view.dtype)
    c0 = col_at(jnp.argmax(dist_to(mean), axis=1))
    centers = jnp.zeros((b, k, dp), view.dtype)
    centers = centers.at[:, 0].set(c0)
    dmin = dist_to(c0)

    def body(i, carry):
        centers, dmin = carry
        c = col_at(jnp.argmax(dmin, axis=1))
        centers = centers.at[:, i].set(c)
        dmin = jnp.minimum(dmin, dist_to(c))
        return centers, dmin

    # last center: argmax only — its dmin update is a wasted full pass
    centers, dmin = lax.fori_loop(1, k - 1, body, (centers, dmin))
    if k > 1:
        centers = centers.at[:, k - 1].set(col_at(jnp.argmax(dmin, axis=1)))
    return centers.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def kmeans_fused_t(
    x: jnp.ndarray, k: int, n_iter: int = 25, dtype=jnp.float32,
    init_stride: int = 1, hw: Tuple[int, int] = None, coarse_iters: int = 0,
    refine_iters: int = 10, coarse_levels: int = 1, mid_iters: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v3 fused Lloyd: transposed (D, N) layout, k on the 8-sublane axis.

    Fixes both prior failure modes (see module STATUS): like v2 the grid
    steps are independent (partial sums, full DMA pipelining), but the update
    is an MXU ``dot_general`` contracting the lane axes instead of v2's
    instruction-bound masked-VPU reduction — so NEITHER matmul pays the
    128-lane padding for k=5, and each iteration streams x once.

    x: (B, N, D) -> (labels (B, N) int32, centers (B, k, D) f32). Requires
    k <= _K_PAD. Seeds/scores/tie-breaks match models.kmeans.kmeans.
    coarse_iters > 0 (with hw): multigrid schedule, see kmeans_fused_t_xt.
    """
    if x.ndim == 2:
        labels, centers = kmeans_fused_t(
            x[None], k, n_iter, dtype, init_stride, hw, coarse_iters,
            refine_iters, coarse_levels, mid_iters,
        )
        return labels[0], centers[0]
    b, n, d = x.shape
    # transposed layout with a ones-row at index d (count accumulator), built
    # once per solve; every Lloyd pass then streams it a single time
    xt = build_xt(x, dtype)
    return kmeans_fused_t_xt(
        xt, k, d, n, n_iter, init_stride, hw, coarse_iters, refine_iters,
        coarse_levels=coarse_levels, mid_iters=mid_iters,
    )


def _pool_xt(xt: jnp.ndarray, d: int, h: int, w: int):
    """Pooled twin of the transposed buffer: (B, dp, n_pad) -> (B, dp, m_pad)
    with columns = exact 2x2 pixel-block means (ordered f32 sum, matching
    models.kmeans.pool2x2 / golden pool2x2_np). The ones-row pools to ones,
    zero padding rows stay zero, so the pooled buffer is itself a valid
    xt-layout buffer for the fused passes."""
    b, dp, _ = xt.shape
    h2, w2 = h // 2, w // 2
    g = xt[:, :, : h * w].reshape(b, dp, h, w)
    g = g[:, :, : 2 * h2, : 2 * w2].astype(jnp.float32)
    s = (g[:, :, 0::2, 0::2] + g[:, :, 0::2, 1::2]) + (
        g[:, :, 1::2, 0::2] + g[:, :, 1::2, 1::2]
    )
    pooled = (0.25 * s).astype(xt.dtype).reshape(b, dp, h2 * w2)
    m = h2 * w2
    block = _block_for_t(m, dp, jnp.dtype(xt.dtype).itemsize)
    m_pad = -(-m // block) * block
    xp = jnp.zeros((b, dp, m_pad), xt.dtype).at[:, :, :m].set(pooled)
    return xp, m, block


def _solve_t(buf, blk, n_valid, c0, max_iter, k, d, interpret):
    """Lloyd passes over one xt-layout buffer until fixed point or max_iter.

    c0: (B, k, dp) f32 initial centers. Returns (labels (B, n_pad) int32,
    centers_pad (B, _K_PAD, dp) f32) — the shared loop of kmeans_fused_t_xt
    and kmeans_coarse_centers_xp."""
    b, dp, _ = buf.shape
    cpad = jnp.zeros((b, _K_PAD, dp), jnp.float32).at[:, :k].set(c0)
    cpad = cpad.at[:, :, d].set(0.0)  # ones-row entry never enters scores

    def update(centers_pad):
        labels, sums = _lloyd_t_pass(buf, centers_pad, k, blk, n_valid,
                                     interpret)
        counts = sums[:, :, d]
        new = sums / jnp.maximum(counts, 1.0)[:, :, None]
        new = new.at[:, :, d].set(0.0)
        new = jnp.where(counts[:, :, None] > 0, new, centers_pad)
        return labels, new

    def cond(carry):
        _, _, _, go = carry
        return go

    def body(carry):
        t, centers_pad, _, _ = carry
        labels, upd = update(centers_pad)
        new = jnp.where(t < max_iter, upd, centers_pad)
        return t + 1, new, labels, jnp.any(new != centers_pad)

    labels0 = jnp.zeros((b, buf.shape[2]), jnp.int32)
    _, centers_pad, labels, _ = lax.while_loop(
        cond, body, (jnp.int32(0), cpad, labels0, True)
    )
    return labels, centers_pad


def _coarse_all_kernel(
    xt_ref,  # (1, dp, m_pad) mm dtype — the WHOLE pooled buffer, resident
    cout_ref,  # (1, _K_PAD, dp) f32 final padded centers
    *,
    k: int,
    d: int,
    m: int,
    iters: int,
):
    """Maximin seeding + ALL coarse Lloyd iterations in ONE kernel launch.

    The multigrid warmup buffer is tiny (config1's 4x4 grid: 6.3 MB/image
    bf16), but the launch-per-pass form costs 5 maximin + up to 15 Lloyd
    pallas launches with XLA glue between them — measured ~3.0 ms of the
    29.4 ms config1 budget against a ~0.4 ms data floor (exp_e2e_split.py).
    Here the buffer sits in VMEM once and the passes chain in-register.
    Same probe sequence, scores, tie-breaks and empty-cluster rule as
    _maximin_init_t_fused + _solve_t (which remain the f32 parity-mode
    path); a fixed ``iters`` loop replaces the fixed-point early exit —
    identical final centers, because the update is idempotent at the fixed
    point. Reduction geometry differs from the blocked passes (one
    m_pad-wide dot vs per-block partials summed in XLA), so centers can
    move by ulps — why this path is gated to bf16 production mode.
    """
    xt = xt_ref[0]  # (dp, m_pad)
    prec = precision_for(xt.dtype)
    f32 = jnp.float32
    dp, m_pad = xt.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    valid = col < m

    def lane_dot(a):  # (r, m_pad) @ xt^T -> (r, dp) f32, lane contraction
        return jax.lax.dot_general(
            a, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )

    def sub_dot(c):  # (r, dp) f32 centers @ xt -> (r, m_pad) f32 scores
        return jax.lax.dot_general(
            c.astype(xt.dtype), xt, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )

    # ---- maximin seeding: probe the extended mean, then farthest point --
    ones = jnp.ones((1, m_pad), xt.dtype)
    c = lane_dot(ones) / m  # (1, dp) extended mean (zero padding adds 0)
    xsq = jnp.sum(jnp.square(xt.astype(f32)), axis=0, keepdims=True)
    dmin = jnp.zeros((1, m_pad), f32)
    rows = []
    for step in range(k):
        csq = jnp.sum(c * c)
        d2 = xsq - 2.0 * sub_dot(c) + csq  # (1, m_pad)
        d2 = jnp.where(valid, d2, -jnp.inf)
        dmin = d2 if step < 2 else jnp.minimum(dmin, d2)
        j = jnp.argmax(dmin, axis=1, keepdims=True)  # first index on ties
        onehot = (col == j).astype(xt.dtype)  # single 1 at the argmax
        c = lane_dot(onehot)  # (1, dp) = column j of xt
        rows.append(c)
    cpad = jnp.concatenate(
        rows + [jnp.zeros((_K_PAD - k, dp), f32)], axis=0
    )  # (8, dp)
    laned = jax.lax.broadcasted_iota(jnp.int32, (_K_PAD, dp), 1)
    cpad = jnp.where(laned == d, 0.0, cpad)  # ones-row entry never scores

    # ---- Lloyd iterations, centers chained in-register ------------------
    sub = jax.lax.broadcasted_iota(jnp.int32, (_K_PAD, m_pad), 0)

    def body(_, cp):
        csqv = jnp.sum(cp * cp, axis=1, keepdims=True)  # (8, 1)
        scores = csqv - 2.0 * sub_dot(cp)  # (8, m_pad)
        scores = jnp.where(sub < k, scores, jnp.float32(3.4e38))
        labels = jnp.argmin(scores, axis=0, keepdims=True).astype(jnp.int32)
        onehot = ((sub == labels) & valid & (sub < k)).astype(xt.dtype)
        sums = lane_dot(onehot)  # (8, dp); ones-row column = counts
        counts = sums[:, d : d + 1]
        new = sums / jnp.maximum(counts, 1.0)
        new = jnp.where(laned == d, 0.0, new)
        return jnp.where(counts > 0, new, cp)

    cout_ref[0] = lax.fori_loop(0, iters, body, cpad)


def _coarse_centers_fused_all(xp, k: int, d: int, m: int, iters: int,
                              interpret: bool) -> jnp.ndarray:
    b, dp, m_pad = xp.shape
    kernel = functools.partial(_coarse_all_kernel, k=k, d=d, m=m, iters=iters)
    cpad = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, dp, m_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _K_PAD, dp), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _K_PAD, dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * (k + iters) * b * m_pad * dp),
            bytes_accessed=int(xp.dtype.itemsize * b * m_pad * dp),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp)
    return cpad[:, :k, :d]


# one image's pooled buffer must fit VMEM alongside the kernel's (8, m_pad)
# working set for the launch-fused coarse solver
_COARSE_FUSE_BYTES = 12 * 2**20


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def kmeans_coarse_centers_xp(
    xp: jnp.ndarray, k: int, d: int, m: int, coarse_iters: int
) -> jnp.ndarray:
    """Maximin seeding + coarse Lloyd on a pooled xt-layout buffer.

    xp: (B, dp, m_pad) normalized pooled features (xt_geometry(m, d)
    layout). Returns (B, k, d) f32 centers in normalized feature space —
    the multigrid warm start consumed by the CHW refine
    (models/kmeans_chw.py::kmeans_fused_chw(init_centers=...)). Identical
    seeding/tie-break/empty-cluster semantics to kmeans_fused_t_xt's
    multigrid warmup; at config1 scale a pooled xt pass costs ~0.36 ms vs
    ~1.7 ms for the block-diagonal CHW pooled pass, which is why the warmup
    runs here even when refinement stays in the CHW layout."""
    if k > _K_PAD:
        raise ValueError(f"fused Lloyd supports k <= {_K_PAD}, got {k}")
    b, dp, m_pad = xp.shape
    interpret = jax.default_backend() != "tpu"
    if (
        xp.dtype == jnp.bfloat16
        and dp * m_pad * xp.dtype.itemsize <= _COARSE_FUSE_BYTES
    ):
        # bf16 production mode: one launch for the whole warmup (see
        # _coarse_all_kernel). f32 parity mode keeps the blocked pass loop
        # below — its reduction geometry is the one the golden-agreement
        # numbers were pinned against.
        return _coarse_centers_fused_all(
            xp, k, d, m, coarse_iters, interpret
        )
    block = _block_for_t(m, dp, jnp.dtype(xp.dtype).itemsize)
    if m_pad % block:
        raise ValueError(f"xp lane dim {m_pad} not a multiple of block {block}")
    c0 = _maximin_init_t_fused(xp, k, m, block, interpret)
    _, cpad = _solve_t(xp, block, m, c0, coarse_iters, k, d, interpret)
    return cpad[:, :k, :d]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 10, 11))
def kmeans_fused_t_xt(
    xt: jnp.ndarray, k: int, d: int, n: int, n_iter: int = 25,
    init_stride: int = 1, hw: Tuple[int, int] = None, coarse_iters: int = 0,
    refine_iters: int = 10, xp: jnp.ndarray = None, coarse_levels: int = 1,
    mid_iters: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve on a pre-built transposed buffer (xt_geometry layout).

    xt: (B, dp, n_pad) with real features in rows [:d], a ones-row at index
    d, zero padding elsewhere (see kmeans_fused_t, which builds it from
    (B, N, D); the transposed-assembly fast path in ops/features.py writes
    it directly from the feature kernel's channel-major output). Returns
    (labels (B, n) int32, centers (B, k, d) f32).

    Multigrid schedule (coarse_iters > 0, hw = (h, w) with n = h*w): seed +
    run ``coarse_iters`` Lloyd passes on the 2x2-pooled buffer (1/4 HBM per
    pass), then up to ``refine_iters`` full-resolution passes with the
    fixed-point early exit. Deterministic; golden mirrors it; measured PRI
    equal-or-better than 25 full passes (experiments/exp_multigrid.py).
    ``n_iter`` is the full-resolution budget when multigrid is OFF.

    ``xp``: optional pre-built pooled buffer in xt_geometry((h//2)*(w//2),
    d) layout — the transposed pipeline builds it with MXU pooling matmuls
    during assembly (ops/features.py::assemble_features_t_pooled), because
    pooling the transposed buffer itself strides the lane axis (measured
    ~26 ms at config1 scale vs ~3.6 for the assembly-side matmuls)."""
    if k > _K_PAD:
        raise ValueError(f"fused Lloyd supports k <= {_K_PAD}, got {k}")
    b, dp, n_pad = xt.shape
    block = _block_for_t(n, dp, jnp.dtype(xt.dtype).itemsize)
    if n_pad % block:
        raise ValueError(f"xt lane dim {n_pad} not a multiple of block {block}")
    interpret = jax.default_backend() != "tpu"
    multigrid = coarse_iters > 0 and hw is not None
    if multigrid and init_stride != 1:
        raise ValueError("multigrid schedule requires init_stride == 1")

    def solve(buf, blk, n_valid, c0, max_iter):
        return _solve_t(buf, blk, n_valid, c0, max_iter, k, d, interpret)

    if multigrid:
        h, w = hw
        if xp is None:
            # pool ``coarse_levels`` times (level 2 = exact 4x4 block means:
            # 2x2 means of 2x2 means, same f32 order as golden's mirror)
            buf = xt
            levels = []
            for _ in range(coarse_levels):
                xp, m, block_p = _pool_xt(buf, d, h, w)
                h, w = h // 2, w // 2
                buf = xp
                levels.append((xp, m, block_p))
        else:
            if mid_iters > 0 and coarse_levels > 1:
                raise ValueError(
                    "mid_iters needs the intermediate pooled buffers; "
                    "pass xp=None so they are built in-function"
                )
            for _ in range(coarse_levels):
                h, w = h // 2, w // 2
            m = h * w
            block_p = _block_for_t(m, dp, jnp.dtype(xt.dtype).itemsize)
            if xp.shape[2] % block_p:
                raise ValueError(
                    f"xp lane dim {xp.shape[2]} not a multiple of {block_p}"
                )
            levels = [(xp, m, block_p)]
        c0 = _maximin_init_t_fused(xp, k, m, block_p, interpret)
        _, cpad_w = solve(xp, block_p, m, c0, coarse_iters)
        if mid_iters > 0:
            # intermediate-level passes, ascending (golden mirrors:
            # kmeans_golden_multigrid mid_iters)
            for xp_l, m_l, blk_l in reversed(levels[:-1]):
                _, cpad_w = solve(xp_l, blk_l, m_l, cpad_w[:, :k], mid_iters)
        labels, centers_pad = solve(xt, block, n, cpad_w[:, :k], refine_iters)
    else:
        if init_stride == 1:
            # fused Pallas seeding: one HBM pass per seed, per-block argmax
            # columns instead of full-array gathers (the XLA form measured
            # ~2x slower inside the composed solver program)
            centers0 = _maximin_init_t_fused(xt, k, n, block, interpret)
        else:
            centers0 = _maximin_init_t(xt, k, n, init_stride)  # (B, k, dp)
        labels, centers_pad = solve(xt, block, n, centers0, n_iter)
    return labels[:, :n], centers_pad[:, :k, :d]


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
