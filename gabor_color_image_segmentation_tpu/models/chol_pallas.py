"""Batched Cholesky + triangular inverse as ONE Pallas VMEM kernel.

Why: config2's measured e2e floor (BASELINE.md, 2026-08-20) is the
per-EM-iteration "glue" — `jnp.linalg.cholesky` on (B, k, 39, 39)
followed by `solve_triangular(chol, I)` costs 0.20-0.32 ms per tol-loop
iteration x ~28 iterations. That cost is LATENCY, not FLOPs (~12 MFLOP):
XLA lowers both factorizations to ~D sequential steps of tiny
dynamic-slice kernels. This kernel runs the same math as ONE launch of
dense (M, R, 128) VPU steps, vectorized over all M = B*k matrices at
once, with zero dynamic-slice traffic.

Semantics (mirrors sklearn _compute_precision_cholesky,
sklearn/mixture/_gaussian_mixture.py:323, which the golden path wraps):

    L    = cholesky(cov)                (lower)
    P^T  = solve_triangular(L, I)       (lower = L^{-1})
    diag = diagonal(L)                  (for logdet_P = -sum log diag)

Algorithm, all in f32 VPU math (no dots -> nothing for TPU DEFAULT
precision to bf16-round; accumulation order differs from XLA's blocked
factorization by normal f32 reassociation only):

  * right-looking Cholesky: 39 steps; step j extracts row j of the
    (symmetric-by-invariant) trailing matrix with a lane one-hot
    reduction, and column j with a sublane one-hot reduction, then
    applies the rank-1 update `S -= c c^T` masked to the trailing block.
    Maintaining L AND L^T incrementally from the (sublane, lane) pair
    avoids any in-kernel transpose.
  * forward substitution: 39 steps; step i pulls row i of L in sublane
    form from L^T (lane one-hot reduction), reduces it against the rows
    of the partial X, and writes row i via a sublane one-hot select.

Layouts: every tensor is (M, R, 128) or (M, R)/(M, 128) with M = B*k
matrices on the leading (untiled) dim, matrix rows on sublanes (padded
to a multiple of 8), matrix columns on lanes (padded to 128) — nothing
variable-height, nothing reshaped across the sublane tiling (CLAUDE.md
Mosaic rule). VMEM: 5 live (M, R, 128) f32 buffers at config2 scale
(M=40, R=40) is ~3.2 MB.

Production status: ON (`_PALLAS_CHOL` in models/gmm_pallas.py), TPU
backend only. Measured 2026-08-20 (exp_chol_pallas.py): 0.256 vs 0.437
ms/op standalone (~2.8x fence-subtracted); config2 e2e 61.5 -> 86.6 MP/s
with production-schedule golden agreement 0.9994 (0.9995 with the XLA
glue — one image's f32-reorder pixels). Parity-tested against the XLA
factorization in tests/test_chol_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _factorize(S, d: int):
    """(M, R, C) f32 SPD (rows/lanes >= d zero) -> (X = L^{-1} lower,
    dlan = diag(L) on lanes). The shared body of both kernels below."""
    m, r, c = S.shape
    row3 = lax.broadcasted_iota(jnp.int32, (m, r, c), 1)
    col3 = lax.broadcasted_iota(jnp.int32, (m, r, c), 2)
    riota = lax.broadcasted_iota(jnp.int32, (m, r), 1)  # sublane ids
    liota = lax.broadcasted_iota(jnp.int32, (m, c), 1)  # lane ids

    # ---- Cholesky (right-looking), maintaining L and L^T ----
    def chol_step(j, carry):
        S, L, Lt, dl = carry
        # row j of S == column j of S (S stays symmetric under c c^T)
        rowv = jnp.sum(jnp.where(row3 == j, S, 0.0), axis=1)  # (M, C)
        colv = jnp.sum(jnp.where(col3 == j, S, 0.0), axis=2)  # (M, R)
        dsq = jnp.sum(jnp.where(liota == j, rowv, 0.0), axis=1)  # (M,)
        dj = jnp.sqrt(dsq)
        inv = 1.0 / dj
        # column j of L: d at row j, col[i]/d below, 0 above (col[j]=dsq
        # so col[j]/d = d — the >= mask covers the diagonal too)
        csub = jnp.where(riota >= j, colv * inv[:, None], 0.0)  # (M, R)
        clan = jnp.where(liota >= j, rowv * inv[:, None], 0.0)  # (M, C)
        L = L + csub[:, :, None] * (col3 == j)
        Lt = Lt + (row3 == j) * clan[:, None, :]
        dl = dl + jnp.where(liota == j, dj[:, None], 0.0)
        # trailing update; the masks in csub/clan already restrict it to
        # rows/cols >= j, and the (j, j) entry is re-derived next steps
        # only from rows/cols > j, so subtracting on row/col j is dead.
        S = S - csub[:, :, None] * clan[:, None, :]
        return S, L, Lt, dl

    zero3 = jnp.zeros_like(S)
    dlan0 = jnp.zeros((m, c), jnp.float32)
    _, L, Lt, dlan = lax.fori_loop(
        0, d, chol_step, (S, zero3, zero3, dlan0), unroll=True
    )

    # ---- forward substitution X = L^{-1} (lower) ----
    def sub_step(i, X):
        w = jnp.sum(jnp.where(col3 == i, Lt, 0.0), axis=2)  # (M, R) row i of L
        dinv = 1.0 / jnp.sum(jnp.where(riota == i, w, 0.0), axis=1)  # (M,)
        wlow = jnp.where(riota < i, w, 0.0)
        acc = jnp.sum(wlow[:, :, None] * X, axis=1)  # (M, C)
        ei = (liota == i).astype(jnp.float32)
        newrow = (ei - acc) * dinv[:, None]
        return X + (row3 == i) * newrow[:, None, :]

    X = lax.fori_loop(0, d, sub_step, zero3, unroll=True)
    return X, dlan


def _kernel(s_ref, x_ref, diag_ref, *, d: int):
    X, dlan = _factorize(s_ref[...], d)
    x_ref[...] = X
    diag_ref[...] = dlan


def _params_kernel(
    c_ref,  # (M, R, C) f32 moment-scatter matrices: C[r, l] =
    #         sum_px x_r resp x_l with the ones-row at index d (row d =
    #         resp-weighted sums, C[d, d] = count) — exactly _em_pass's
    #         per-(image, component) covs output
    x_ref,  # (M, R, C) f32 out: P^T lower (precision Cholesky transpose)
    diag_ref,  # (M, C) f32 out: diag(chol(cov)) on lanes
    bias_ref,  # (M, R) f32 out: P^T_j @ mu_j rows
    const_ref,  # (M, C) f32 out: per-matrix log w + logdet - d/2 log2pi,
    #             broadcast over lanes (consumers read lane 0)
    *,
    d: int,
    m_rows: int,
    reg_covar: float,
):
    """Moments -> sklearn GMM params -> factorization, one launch.

    Fuses _moments_to_params + _params_to_kernel_inputs (models/
    gmm_pallas.py) into the factorization kernel: per EM iteration the
    XLA program shrinks from [moments->params fusion][chol launch]
    [bias/const fusion][EM launch] to [this launch][EM launch]. All
    params math is elementwise f32 on the (M, R, C) layout — identical
    values to the XLA expressions (same divisions, same products); only
    the bias reduction ORDER differs from the XLA einsum (both exact-f32
    accumulation)."""
    C = c_ref[...]
    m, r, c = C.shape
    row3 = lax.broadcasted_iota(jnp.int32, (m, r, c), 1)
    col3 = lax.broadcasted_iota(jnp.int32, (m, r, c), 2)
    riota = lax.broadcasted_iota(jnp.int32, (m, r), 1)
    liota = lax.broadcasted_iota(jnp.int32, (m, c), 1)

    # Shape discipline (Mosaic layout inference): only the broadcast
    # patterns the factorization body already exercises — single-axis
    # reductions, rank-1 [:, None] against rank-2, rank-2 [:, None, :] /
    # [:, :, None] against rank-3. A rank-1 [:, None, None] broadcast to
    # rank-3 CRASHED the Mosaic compiler ("Check failed: arr.size() >=
    # layout_rank" in VectorLayout::join, 2026-08-20) — another case of
    # the CLAUDE.md rule that interpret-mode CI cannot catch Mosaic
    # legality.
    # sklearn _estimate_gaussian_parameters: nk = counts + 10 eps
    rowd = jnp.sum(jnp.where(row3 == d, C, 0.0), axis=1)  # (M, C) sums
    nk = jnp.sum(
        jnp.where(liota == d, rowd, 0.0), axis=1
    ) + 10.0 * jnp.finfo(jnp.float32).eps  # (M,) counts
    mu = jnp.where(liota < d, rowd / nk[:, None], 0.0)  # (M, C) means
    cold = jnp.sum(jnp.where(col3 == d, C, 0.0), axis=2)  # (M, R)
    mu_sub = jnp.where(riota < d, cold / nk[:, None], 0.0)  # (M, R)
    nk_row = nk[:, None] + jnp.zeros((m, c), jnp.float32)  # (M, C)
    exx = C / nk_row[:, None, :]
    cov = exx - mu_sub[:, :, None] * mu[:, None, :]
    cov = cov + jnp.float32(reg_covar) * (row3 == col3).astype(jnp.float32)
    S = jnp.where((row3 < d) & (col3 < d), cov, 0.0)

    X, dlan = _factorize(S, d)

    x_ref[...] = X
    diag_ref[...] = dlan
    bias_ref[...] = jnp.sum(X * mu[:, None, :], axis=2)  # (M, R)
    safe = jnp.where(liota < d, dlan, 1.0)
    logdet = -jnp.sum(jnp.where(liota < d, jnp.log(safe), 0.0), axis=1)
    constv = (
        jnp.log(nk / jnp.float32(m_rows)) + logdet
        - 0.5 * d * 1.8378770664093453
    )  # (M,)
    const_ref[...] = constv[:, None] + jnp.zeros((m, c), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("d", "m_rows", "reg_covar")
)
def precision_chol_params_pallas(moments, d: int, m_rows: int,
                                 reg_covar: float):
    """(B, k, dp, dp) f32 moment-scatter (ones-row at index d) ->
    (P^T (M, dp, 128), chol diag (M, 128), bias rows (M, dp),
    const (M, 128) lane-broadcast), M = B*k — the fused
    moments->params->factorization launch (see _params_kernel)."""
    b, k, dp, dp2 = moments.shape
    if dp != dp2:
        raise ValueError(f"square moment matrices required, got {dp}x{dp2}")
    if dp > _LANES:
        raise ValueError(
            f"precision_chol_params_pallas supports dp <= {_LANES} "
            f"(got {dp})"
        )
    if d >= dp or dp % 8:
        raise ValueError(f"need ones-row index d < dp, dp % 8 == 0 "
                         f"(d={d}, dp={dp})")
    m = b * k
    s = jnp.zeros((m, dp, _LANES), jnp.float32)
    s = s.at[:, :, :dp].set(moments.reshape(m, dp, dp).astype(jnp.float32))
    x, diag, bias, const = pl.pallas_call(
        functools.partial(
            _params_kernel, d=d, m_rows=m_rows, reg_covar=reg_covar
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, dp, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, dp), jnp.float32),
            jax.ShapeDtypeStruct((m, _LANES), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            # same scoped-vmem allowance story as precision_chol_pallas
            # (30.6 MB measured stack at M=40, R=40; R=48 here plus the
            # params-prep temporaries) — an allowance, not an allocation
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(s)
    return x, diag, bias, const


@functools.partial(jax.jit, static_argnames=("d",))
def precision_chol_pallas(covs, d: int):
    """(..., d, d) SPD f32 -> (P^T lower (..., d, d) f32, chol diag (..., d)).

    P^T = solve_triangular(cholesky(cov), I, lower=True); logdet of the
    precision Cholesky is -sum(log(diag), -1). One kernel launch for the
    whole batch.
    """
    if d > _LANES:
        # the kernel packs each d x d matrix into one (R, 128)-lane tile;
        # d past the lane width needs a blocked variant (advisor r4 low)
        raise ValueError(
            f"precision_chol_pallas supports d <= {_LANES} (got d={d}); "
            "use the XLA cholesky/solve_triangular pair for larger d"
        )
    lead = covs.shape[:-2]
    m = 1
    for s in lead:
        m *= s
    r = -(-max(d, 8) // 8) * 8
    s = jnp.zeros((m, r, _LANES), jnp.float32)
    s = s.at[:, :d, :d].set(covs.reshape(m, d, d).astype(jnp.float32))
    x, diag = pl.pallas_call(
        functools.partial(_kernel, d=d),
        out_shape=(
            jax.ShapeDtypeStruct((m, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, _LANES), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            # the unrolled 2x39-step factorization keeps ~a dozen
            # (M, R, 128) f32 temporaries live across steps — measured
            # 30.6 MB scoped-vmem stack at config2 scale, past the 16 MB
            # default; an allowance, not an allocation (same treatment as
            # connectivity_pallas.py).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(s)
    pt = x[:, :d, :d].reshape(*lead, d, d)
    return pt, diag[:, :d].reshape(*lead, d)
