"""Superpixel feature moments as a Pallas reduction kernel (TPU).

STATUS: measured NEGATIVE result — kept as engineering record, NOT wired
into production (models/graph.py uses the XLA one-hot matmul). At config3
scale (batch 8, N=154k, S=384, D=39) this kernel runs 5.3 ms/batch vs
3.2 ms for the XLA path: the XLA route is HBM-bound on its ~120 MB/image
one-hot, but this kernel is MXU-bound on tile padding — the (s_pad, chunk)
@ (chunk, D+1) dot wastes 128/(D+1) ≈ 3.2x of the N dimension, and the
one-hot tile build adds s_pad x N VPU compares. The padding waste is
inherent to the contraction shape (N = feature channels ~40 < 128);
banding the superpixel-id window (as the SLIC kernel does) could shrink M
instead, but M is already the efficient axis. Verified bit-correct in
tests/test_graph.py::test_fused_moments_match_xla.

Original motivation below; the traffic analysis was right, the compute
analysis missed the N-padding:

``superpixel_means`` (models/graph.py) computes scatter-means as a one-hot
matmul: building the (N, S) one-hot in HBM costs ~120 MB/image at config3
scale (bf16, N=154k, S=384) — ~3.4 ms/batch-8 of pure bandwidth. This
kernel builds the one-hot TILES in VMEM per pixel-chunk (iota == idx, the
ops/lookup.py pattern) and accumulates the (S, D+1) sums+counts across
chunks in a VMEM-resident output block, so HBM traffic is one read of the
features and labels (~13 MB/image) plus a same-size padded staging copy.

    out[b, s, :D] = sum_n [idx[b, n] == s] * feats[b, n, :]   (sums)
    out[b, s, D]  = sum_n [idx[b, n] == s]                    (counts;
                     ones column appended host-side)

Pixels beyond N are padded with idx = -1, which matches no superpixel row
of the iota — no in-kernel tail masking needed.

bf16 path only (one-hot weights and bf16 features are exact under DEFAULT
precision; fp32 parity mode keeps the XLA HIGHEST-precision route — see
ops/precision.py). f32 accumulation of bf16 products matches the XLA
one-hot matmul's contraction to reduction-order rounding; tests pin the
resulting means to 1e-5 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 2048  # pixels per grid step (contraction depth of the one-hot dot)


def _moments_kernel(idx_ref, f_ref, out_ref):
    c = pl.program_id(1)
    idx = idx_ref[0, 0].reshape(1, -1)  # (1, chunk) int32, -1 on padding
    feats = f_ref[0]  # (chunk, d+1) bf16, ones in the last column
    s_pad = out_ref.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (s_pad, idx.shape[1]), 0) == idx
    ).astype(jnp.bfloat16)  # exact 0/1
    part = jax.lax.dot_general(
        onehot, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (s_pad, d+1) f32

    @pl.when(c == 0)
    def _init():
        out_ref[0] = part

    @pl.when(c != 0)
    def _acc():
        out_ref[0] += part


@functools.partial(jax.jit, static_argnums=(2,))
def superpixel_moments_fused(
    idx: jnp.ndarray, feats: jnp.ndarray, n_sp: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) int32 labels + (B, N, D) features -> ((B, S, D) f32 sums,
    (B, S) f32 counts). S = n_sp; labels outside [0, n_sp) contribute to
    no bucket (none exist after connectivity enforcement)."""
    b, n = idx.shape
    d = feats.shape[-1]
    s_pad = max(128, -(-n_sp // 128) * 128)
    n_pad = -(-n // _CHUNK) * _CHUNK
    nc = n_pad // _CHUNK

    # (b, nc, 8, chunk/8): Pallas TPU wants the trailing block dims to be
    # (8k, 128k)-shaped — same staging as ops/lookup.py
    idx_p = (
        jnp.full((b, n_pad), -1, jnp.int32)
        .at[:, :n]
        .set(idx)
        .reshape(b, nc, 8, _CHUNK // 8)
    )
    # features + ones column, padded to the chunk multiple (pad rows are
    # all-zero AND idx -1 there matches nothing — doubly inert)
    f_p = jnp.zeros((b, n_pad, d + 1), jnp.bfloat16)
    f_p = f_p.at[:, :n, :d].set(feats.astype(jnp.bfloat16))
    f_p = f_p.at[:, :n, d].set(jnp.bfloat16(1.0))

    out = pl.pallas_call(
        _moments_kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 8, _CHUNK // 8), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, _CHUNK, d + 1), lambda i, c: (i, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_pad, d + 1), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d + 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(idx_p, f_p)
    return out[:, :n_sp, :d], out[:, :n_sp, d]


# ---------------------------------------------------------------------------
# Transposed-output variant — measured EQUAL to XLA in context (round 5)
# ---------------------------------------------------------------------------
#
# STATUS: NOT production. Built when the round-5 remedy geometry (S=925)
# made the standalone moments probe read 17.7 ms/batch-8; the production
# e2e A/B then measured this kernel, the NHWC variant below and the XLA
# one-hot matmul within 0.1 MP/s of each other (57.1, bench config3) —
# the probe's cost was actually the affinity median's TPU sort (fixed by
# the strided subsample in models/graph.py). Kept with parity tests as
# the measured record; the analysis below explains why the kernel's own
# cost IS competitive at this S:
#
# At S=925 the XLA one-hot matmul's HBM traffic is ~286 MB/image, while
# the kernel's cost is MXU issue.
# The old kernel's 3.2x waste was the OUTPUT lane dim (d+1 = 40 -> 128
# pad); this variant contracts the pixel chunk on the LANE axis of both
# operands (the EM kernel's dot_t pattern) so the output is
# (d+1 sublanes, s_pad lanes) — sublane pad 40/40 exact, lane pad
# 928 -> 1024 (1.1x). Features arrive PRE-TRANSPOSED (B, d+1, N) with the
# ones row at index d (the xt-style layout; one ~96 MB relayout at
# config3 scale). The one-hot tile build stays (s_pad, chunk) — cheap
# lane-iota against the (1, chunk) label row.


def _moments_t_kernel(idx_ref, f_ref, out_ref):
    c = pl.program_id(1)
    idx = idx_ref[0, 0].reshape(1, -1)  # (1, chunk) int32, -1 on padding
    feats = f_ref[0]  # (d+1, chunk) bf16, ones row at index d
    s_pad = out_ref.shape[2]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (s_pad, idx.shape[1]), 0) == idx
    ).astype(jnp.bfloat16)  # (s_pad, chunk) exact 0/1
    part = jax.lax.dot_general(
        feats, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d+1, s_pad) f32

    @pl.when(c == 0)
    def _init():
        out_ref[0] = part

    @pl.when(c != 0)
    def _acc():
        out_ref[0] += part


@functools.partial(jax.jit, static_argnums=(2,))
def superpixel_moments_fused_t(
    idx: jnp.ndarray, feats: jnp.ndarray, n_sp: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) int32 labels + (B, N, D) features -> ((B, S, D) f32 sums,
    (B, S) f32 counts) via the transposed-output kernel above. Labels
    outside [0, n_sp) contribute to no bucket."""
    b, n = idx.shape
    d = feats.shape[-1]
    dp = -(-(d + 1) // 8) * 8
    s_pad = max(128, -(-n_sp // 128) * 128)
    n_pad = -(-n // _CHUNK) * _CHUNK
    nc = n_pad // _CHUNK

    idx_p = (
        jnp.full((b, n_pad), -1, jnp.int32)
        .at[:, :n]
        .set(idx)
        .reshape(b, nc, 8, _CHUNK // 8)
    )
    f_t = jnp.zeros((b, dp, n_pad), jnp.bfloat16)
    f_t = f_t.at[:, :d, :n].set(
        jnp.swapaxes(feats.astype(jnp.bfloat16), 1, 2)
    )
    f_t = f_t.at[:, d, :n].set(jnp.bfloat16(1.0))

    out = pl.pallas_call(
        _moments_t_kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 8, _CHUNK // 8), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, dp, _CHUNK), lambda i, c: (i, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, dp, s_pad), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, dp, s_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(idx_p, f_t)
    return (
        jnp.swapaxes(out[:, :d, :n_sp], 1, 2),  # (B, S, D) sums
        out[:, d, :n_sp],  # (B, S) counts
    )


# NHWC-input variant: identical math to superpixel_moments_fused_t but the
# features arrive in their native (B, N, D) layout — staging is a lane PAD
# (39 -> 48 + ones column), not a transpose. The _t variant's
# (B, N, D) -> (B, dp, N) swapaxes staging measured ~15-20 ms/batch-8 at
# config3 full-res (the classic full-res relayout cost the kmeans paths
# were redesigned around), cancelling everything the kernel saved; the
# dot here contracts the lhs SUBLANE axis with the rhs LANE axis
# (dims ((0,), (1,))) — the MXU takes a transposed lhs natively.


def _moments_nhwc_kernel(idx_ref, f_ref, out_ref):
    c = pl.program_id(1)
    idx = idx_ref[0, 0].reshape(1, -1)  # (1, chunk) int32, -1 on padding
    feats = f_ref[0]  # (chunk, dp) bf16, ones column at index d
    s_pad = out_ref.shape[2]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (s_pad, idx.shape[1]), 0) == idx
    ).astype(jnp.bfloat16)  # (s_pad, chunk) exact 0/1
    part = jax.lax.dot_general(
        feats, onehot, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dp, s_pad) f32

    @pl.when(c == 0)
    def _init():
        out_ref[0] = part

    @pl.when(c != 0)
    def _acc():
        out_ref[0] += part


@functools.partial(jax.jit, static_argnums=(2,))
def superpixel_moments_fused_nhwc(
    idx: jnp.ndarray, feats: jnp.ndarray, n_sp: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) int32 labels + (B, N, D) features -> ((B, S, D) f32 sums,
    (B, S) f32 counts); pad-only staging (see the note above)."""
    b, n = idx.shape
    d = feats.shape[-1]
    dp = -(-(d + 1) // 8) * 8
    s_pad = max(128, -(-n_sp // 128) * 128)
    n_pad = -(-n // _CHUNK) * _CHUNK
    nc = n_pad // _CHUNK

    idx_p = (
        jnp.full((b, n_pad), -1, jnp.int32)
        .at[:, :n]
        .set(idx)
        .reshape(b, nc, 8, _CHUNK // 8)
    )
    f_p = jnp.zeros((b, n_pad, dp), jnp.bfloat16)
    f_p = f_p.at[:, :n, :d].set(feats.astype(jnp.bfloat16))
    f_p = f_p.at[:, :n, d].set(jnp.bfloat16(1.0))

    out = pl.pallas_call(
        _moments_nhwc_kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 8, _CHUNK // 8), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, _CHUNK, dp), lambda i, c: (i, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, dp, s_pad), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, dp, s_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(idx_p, f_p)
    return (
        jnp.swapaxes(out[:, :d, :n_sp], 1, 2),  # (B, S, D) sums — tiny
        out[:, d, :n_sp],  # (B, S) counts
    )
