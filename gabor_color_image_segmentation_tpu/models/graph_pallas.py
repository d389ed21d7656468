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
