"""Fused Pallas EM step for the full-covariance GMM (SURVEY.md C9).

Why: at BSDS scale (N=154k, D=39) one EM iteration of the XLA solver
(models/gmm.py) measured ~6 ms — ~5x its HBM floor and ~30x its FLOP floor.
The per-component chain (diff materialization, triangular solve over
(D, N), separate M-step dots) re-reads x ~10 times per iteration and the
(D, N) triangular solve schedules poorly.

This kernel computes the ENTIRE EM step in ONE pass over the transposed
feature buffer (the same ``xt_geometry`` layout the fused k-means uses —
the init solve and EM share one buffer):

    scores      y = A @ x - b            (A = stacked P_j^T precision-chol,
                                          one (k*Dp, Dp) @ (Dp, block) dot)
    mahalanobis maha_j = sum over j's Dp-row group of y^2   (exact f32 VPU)
    resp        log-sum-exp over the 8-sublane component axis
    M-step      msums = resp @ x^T (counts via the ones-row),
                covs_j = (x .* resp_j) @ x^T    (Q@K^T lane contractions)
    labels      argmax_j log-prob (first-hit, matching jnp.argmax)

Per-block partial moments keep grid steps independent (full DMA
pipelining); XLA reduces the tiny partials and does the O(k D^3)
per-iteration linear algebra (Cholesky, triangular inverse) once per step.

Precision: every MXU dot is f32-accurate via operand splitting
(_split_dot) — the f32 side (precisions, responsibilities) always splits
into exact bf16 hi+lo halves; bf16-mode features contribute one bf16-exact
operand (2 passes), f32-mode features add the hi@lo cross term (bf16x3).
bf16 mode therefore only changes feature STORAGE (the pipeline-wide bf16
contract), never the EM algebra — Mosaic's silently-bf16-rounding DEFAULT
f32 dot and its 6-pass HIGHEST are both avoided.

Semantics: sklearn GaussianMixture (models/gmm.py is the in-repo semantic
reference; golden/cluster.py gmm_golden the f64 oracle). The Mahalanobis
is computed via the precision-Cholesky MATMUL (sklearn's own form,
_estimate_log_gaussian_prob) instead of models/gmm.py's triangular solve —
identical in exact arithmetic; parity tests pin label agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _K_PAD as _KP,  # component axis padded to one sublane tile; k <= 8
    _block_for_t,
    build_xt,
    kmeans_fused_t_xt,
    xt_geometry,
)
_LOG2PI = 1.8378770664093453


def _split_dot(a, bt, contract_b_axis):
    """f32-accurate dot_general(a, bt) contracting a's axis 1 with bt's
    ``contract_b_axis``, via operand splitting (never Mosaic's 6-pass
    HIGHEST, never a silently bf16-rounded DEFAULT f32 dot).

    ``a`` is always an f32 quantity (stacked precisions / responsibilities):
    split into hi+lo bf16 halves (2 exact-product passes). ``bt`` is the
    feature buffer: bf16-mode features are ALREADY bf16-exact (one operand
    as-is — bf16 storage is the pipeline-wide contract, the EM algebra
    stays f32-accurate); f32-mode features add the a_hi @ b_lo cross term
    (bf16x3)."""
    dims = (((1,), (contract_b_axis,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )

    a = a.astype(jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if bt.dtype == jnp.bfloat16:
        return dot(a_hi, bt) + dot(a_lo, bt)
    bt = bt.astype(jnp.float32)
    b_hi = bt.astype(jnp.bfloat16)
    b_lo = (bt - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _em_kernel(
    xt_ref,  # (1, Dp, block) mm dtype; row d is ones
    a_ref,  # (1, k*Dp, Dp) f32 stacked P_j^T (zero-padded rows/cols)
    bias_ref,  # (1, k*Dp, 1) f32 stacked A_j @ mu_j
    const_ref,  # (1, _KP, 1) f32 per-component log w + logdet - D/2 log2pi
    labels_ref,  # (1, 1, 1, block) int32
    ll_ref,  # (1, 1, 1, 1) f32 partial sum of log-likelihood (moments only)
    covst_ref,  # (1, 1, Dp, k*Dp) f32 partial TRANSPOSED scatter: row i,
    #             col j*Dp+i' = sum_l x_i resp_j x_i' — the ones-row (i=d)
    #             doubles as the resp-weighted sums + counts, so no separate
    #             msums dot is issued (moments only)
    *,
    k: int,
    dp: int,
    block: int,
    n_rows: int,
    moments: bool = True,
):
    i = pl.program_id(1)
    xt = xt_ref[0]  # (Dp, block)
    a = a_ref[0]  # (k*Dp, Dp) f32
    y = _split_dot(a, xt, 0) - bias_ref[0]  # (k*Dp, block) f32
    ysq = y * y
    maha = jnp.concatenate(
        [jnp.sum(ysq[j * dp:(j + 1) * dp], axis=0, keepdims=True)
         for j in range(k)]
        + [jnp.zeros((_KP - k, block), jnp.float32)],
        axis=0,
    )  # (_KP, block) exact f32 group sums
    lp = const_ref[0] - 0.5 * maha  # (_KP, block)
    sub = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 0)
    lp = jnp.where(sub < k, lp, -jnp.inf)

    labels = jnp.argmax(lp, axis=0, keepdims=True).astype(jnp.int32)
    labels_ref[0, 0] = labels
    if not moments:
        # label-only E-step: the final fit_predict pass consumes nothing
        # but the argmax, so the resp softmax and the (Dp, block) @
        # (block, k*Dp) M-step scatter — HALF the pass's MXU work — are
        # never issued. Scores/labels identical to the full pass.
        return

    m = jnp.max(lp, axis=0, keepdims=True)  # (1, block)
    ex = jnp.where(sub < k, jnp.exp(lp - m), 0.0)
    se = jnp.sum(ex, axis=0, keepdims=True)
    lse = m + jnp.log(se)
    resp = ex / se  # (_KP, block)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    valid = (col + i * block) < n_rows
    resp = jnp.where(valid, resp, 0.0)
    ll_ref[0, 0] = jnp.sum(
        jnp.where(valid, lse, 0.0), axis=1, keepdims=True
    )

    xf = xt.astype(jnp.float32)
    # ONE stacked TRANSPOSED contraction for every M-step moment:
    #   out = x @ RX^T, out[i, j*Dp + i'] = sum_l x[i, l] resp_j[l] x[i', l]
    # (RX = component-stacked resp-weighted features). Three wins vs k
    # separate (Dp, block) @ (block, Dp) scatter dots:
    #   * the MXU output is (Dp, k*Dp) = 48 x 240 — the lane axis is k*Dp
    #     wide instead of Dp, so the 128-wide tile padding is amortized
    #     across components (~2x utilization on the pass's biggest dots)
    #   * the ones-row (i = d) of the SAME output IS the resp-weighted sum
    #     matrix (and its j*Dp+d entries the counts), so the separate
    #     msums dot and its resp split disappear
    #   * one dot per split term instead of k+1
    # Products are identical to the per-component form; each covs entry is
    # one f32-accumulated lane contraction either way (covs_j was never
    # exactly symmetric — rx rounds x_i*resp — and the Cholesky consumer
    # symmetrizes; parity floors are re-pinned in tests/test_gmm.py).
    rx = jnp.concatenate(
        [xf * resp[j : j + 1] for j in range(k)], axis=0
    )  # (k*Dp, block) f32 — exact VPU products
    dims_t = (((1,), (1,)), ((), ()))

    def dot_t(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims_t,
            preferred_element_type=jnp.float32,
        )

    rx_hi = rx.astype(jnp.bfloat16)
    rx_lo = (rx - rx_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if xt.dtype == jnp.bfloat16:
        ct = dot_t(xt, rx_hi) + dot_t(xt, rx_lo)
    else:
        x_hi = xf.astype(jnp.bfloat16)
        x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ct = dot_t(x_hi, rx_hi) + dot_t(x_hi, rx_lo) + dot_t(x_lo, rx_hi)
    covst_ref[0, 0] = ct


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _em_pass(xt, a, bias, const, k: int, block: int, n: int, interpret: bool,
             d: int = None, moments: bool = True):
    """One fused E+M pass. Returns (labels (B, n_pad), ll (B,),
    msums (B, _KP, Dp), covs (B, k, Dp, Dp)) — moments already nb-reduced.

    ``d``: the feature count = the ones-row index inside the dp rows; the
    resp-weighted sums are read off that row of the transposed scatter
    output. None (compat default for moment-less callers) reads the last
    row, which only differs when dp > d + 1 — pass it whenever the msums
    output is consumed.

    ``moments=False``: label-only E-step — skips the resp softmax, the
    log-likelihood and the M-step scatter dot inside the kernel (about
    half its MXU issue) and returns (labels, None, None, None). Labels are
    bit-identical to the full pass (same scores, same argmax)."""
    b, dp, n_pad = xt.shape
    nb = n_pad // block
    n_passes = 3 if xt.dtype == jnp.float32 else 2  # _split_dot pass count
    kernel = functools.partial(
        _em_kernel, k=k, dp=dp, block=block, n_rows=n, moments=moments
    )
    if not moments:
        labels = pl.pallas_call(
            # single output ref; the kernel returns before ll/covst writes
            lambda xr, ar, br, cr, lr: kernel(xr, ar, br, cr, lr, None, None),
            grid=(b, nb),
            in_specs=[
                pl.BlockSpec((1, dp, block), lambda bi, i: (bi, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k * dp, dp), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k * dp, 1), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _KP, 1), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, block),
                                   lambda bi, i: (bi, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nb, 1, block), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * b * n_pad * dp * dp * k * n_passes) // 2,
                bytes_accessed=int(xt.dtype.itemsize * b * n_pad * dp),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xt, a, bias, const)
        return labels.reshape(b, n_pad), None, None, None
    labels, ll, covst = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, dp, block), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * dp, dp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * dp, 1), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _KP, 1), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, block), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp, k * dp), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nb, 1, block), jnp.int32),
            jax.ShapeDtypeStruct((b, nb, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, dp, k * dp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n_pad * dp * dp * k * n_passes),
            bytes_accessed=int(xt.dtype.itemsize * b * n_pad * dp),
            transcendentals=int(b * n_pad * _KP),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, a, bias, const)
    # transposed-scatter readout: ct[i, j*dp + i'] = covs_j[i', i]; the
    # ones-row (i = d) carries the resp-weighted sums, its j*dp+d entries
    # the counts — the (B, _KP, Dp) msums layout of the old separate dot
    ct = jnp.sum(covst, axis=1)  # (B, dp, k*dp)
    covs = jnp.transpose(
        ct.reshape(b, dp, k, dp), (0, 2, 3, 1)
    )  # (B, k, dp, dp)
    d_ones = dp - 1 if d is None else d
    msums = jnp.zeros((b, _KP, dp), jnp.float32).at[:, :k].set(
        ct[:, d_ones].reshape(b, k, dp)
    )
    return (
        labels.reshape(b, n_pad),
        jnp.sum(ll, axis=(1, 2, 3)),
        msums,
        covs,
    )


# One-launch Pallas Cholesky+inverse for the per-iteration glue below —
# the measured config2 floor (BASELINE.md 2026-08-20): XLA's factorization
# pair costs 0.20-0.32 ms/EM-iteration of serial-chain latency x ~28 tol
# iterations. ON (TPU only): measured 2026-08-20, config2 e2e 61.5 -> 86.6
# MP/s, production-schedule golden agreement 0.9994 vs 0.9995 with XLA
# (exp_chol_pallas.py, exp_gmm_fused_parity.py A/B same session).
_PALLAS_CHOL = True


def _params_to_kernel_inputs(weights, means, covs, d: int, dp: int, k: int):
    """(B, k), (B, k, d), (B, k, d, d) -> (A, bias, const) kernel operands.

    A_j = P_j^T where P_j = solve_triangular(chol(cov_j), I).T is sklearn's
    precision Cholesky; logdet P_j = -sum log diag chol_j."""
    b = weights.shape[0]
    if _PALLAS_CHOL and jax.default_backend() == "tpu":
        # TPU only: on CPU the kernel would run per-EM-iteration in Pallas
        # interpret mode (hundreds of eagerly-executed ops per call —
        # suite-hostile); the XLA pair below is the same math in f32, and
        # tests/test_chol_pallas.py pins the kernel's own parity in
        # interpret mode.
        from gabor_color_image_segmentation_tpu.models.chol_pallas import (
            precision_chol_pallas,
        )

        pt, chol_diag = precision_chol_pallas(covs, d=d)
        pt = pt.astype(covs.dtype)
    else:
        chol = jnp.linalg.cholesky(covs)  # (B, k, d, d) lower
        chol_diag = jnp.diagonal(chol, axis1=2, axis2=3)
        eye = jnp.eye(d, dtype=covs.dtype)
        pt = jax.scipy.linalg.solve_triangular(  # = P^T (lower)
            chol, jnp.broadcast_to(eye, (b, k, d, d)), lower=True
        )
    a = jnp.zeros((b, k, dp, dp), jnp.float32)
    a = a.at[:, :, :d, :d].set(pt.astype(jnp.float32))
    a = a.reshape(b, k * dp, dp)
    bias = jnp.einsum("bkij,bkj->bki", pt.astype(jnp.float32),
                      means.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)  # (B, k, d)
    # HIGHEST: a DEFAULT f32 einsum bf16-rounds operands on TPU and the
    # bias feeds the Mahalanobis directly (repo precision policy)
    bias_full = jnp.zeros((b, k, dp), jnp.float32).at[:, :, :d].set(bias)
    bias_full = bias_full.reshape(b, k * dp, 1)
    logdet = -jnp.sum(jnp.log(chol_diag), axis=2)  # (B, k)
    const = jnp.log(weights) + logdet - 0.5 * d * _LOG2PI
    const_full = jnp.zeros((b, _KP, 1), jnp.float32).at[:, :k, 0].set(const)
    return a, bias_full, const_full


def _moments_to_params(msums, covs, d: int, n: int, k: int, reg_covar: float):
    """Partial moments -> (weights, means, covs) with sklearn's formulas."""
    nk = msums[:, :k, d] + 10.0 * jnp.finfo(jnp.float32).eps  # (B, k) counts
    means = msums[:, :k, :d] / nk[:, :, None]
    exx = covs[:, :, :d, :d] / nk[:, :, None, None]
    cov = exx - jnp.einsum("bki,bkj->bkij", means, means)
    cov = cov + reg_covar * jnp.eye(d, dtype=cov.dtype)
    return nk / n, means, cov


# Fused per-iteration prep (round 5, VERDICT r4 task 3): run
# _moments_to_params + the factorization + the bias/const assembly as ONE
# Pallas launch (chol_pallas._params_kernel), so each tol-loop iteration
# is [params launch][EM launch] instead of four program segments.
#
# STATUS: OFF — measured SLOWER end-to-end (2026-08-20, two independent
# sessions of the production-shape solver slope A/B, min-of-10, both
# orders): fused 0.266-0.274 vs standard 0.208-0.214 ms/EM-iteration,
# even though the fused launch standalone (0.096) matches the XLA
# prep+glue chain it replaces (0.102) and sub-0.1 ms micro-slopes through
# this tunnel are noise-dominated. The three-segment chain evidently
# already overlaps with the EM launch better than one long kernel does.
# Kept (with tests/test_chol_pallas.py::test_params_kernel_matches_xla +
# tests/test_gmm.py::test_fused_prep_matches_standard_loop pinning
# parity) as the documented record of VERDICT r4 task 3's lever — the
# same kept-dead-end pattern as kmeans_pallas v1/v2. The remaining
# boundary/overlap residual is ~0.03-0.05 ms/iter (~1.3 ms of the 14.3
# ms e2e budget, exp_gmm_iterbudget.py) — the most ANY further fusion
# could recover; the rest is measured body work (EM pass 0.058 at the
# MXU ceiling, factorization chain 0.066 at its serial VPU latency,
# params prep 0.059 at XLA's small-op floor).
_FUSED_PREP = False


def _use_fused_prep() -> bool:
    # TPU-only by default (per-iteration interpret-mode kernels are
    # suite-hostile on CPU); tests monkeypatch this to force the fused
    # path in interpret mode (then clear gmm_fused_t_xt's jit cache —
    # the gate is read at trace time).
    return _FUSED_PREP and _PALLAS_CHOL and jax.default_backend() == "tpu"


def _params_from_moments_fused(covsM, d: int, dp: int, k: int, m_rows: int,
                               reg_covar: float):
    """(B, k, dp, dp) moment-scatter (ones-row at d) -> (a, bias, const)
    _em_pass operands via the single fused launch."""
    from gabor_color_image_segmentation_tpu.models.chol_pallas import (
        precision_chol_params_pallas,
    )

    b = covsM.shape[0]
    x, _, bias, const = precision_chol_params_pallas(
        covsM, d, m_rows, reg_covar
    )
    a = x.reshape(b, k * dp, x.shape[-1])[:, :, :dp]
    bias_full = bias.reshape(b, k * dp, 1)
    const_full = jnp.zeros((b, _KP, 1), jnp.float32).at[:, :k, 0].set(
        const[:, 0].reshape(b, k)
    )
    return a, bias_full, const_full


def _init_moments(xt, labels, k: int, d: int):
    """Hard-assignment moments of the k-means init (resp = one-hot).

    One-time XLA pass (not per-iteration): onehot8 (B, 8, Np) against the
    transposed buffer; counts ride the ones-row like everywhere else."""
    b, dp, n_pad = xt.shape
    sub = jnp.arange(_KP, dtype=jnp.int32)[None, :, None]
    onehot = (labels[:, None, :] == sub).astype(xt.dtype)  # (B, _KP, Np)
    msums = jax.lax.dot_general(
        onehot.astype(jnp.float32), xt.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, _KP, Dp)
    xf = xt.astype(jnp.float32)

    def cov_j(j):
        rx = xf * onehot[:, j:j + 1, :].astype(jnp.float32)
        return jax.lax.dot_general(
            rx, xf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    covs = jnp.stack([cov_j(j) for j in range(k)], axis=1)  # (B, k, Dp, Dp)
    return msums, covs


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 11))
def gmm_fused_t_xt(
    xt: jnp.ndarray,
    k: int,
    d: int,
    n: int,
    n_iter: int = 30,
    reg_covar: float = 1e-4,
    kmeans_iters: int = 10,
    tol: float = 0.0,
    hw: tuple = None,
    fit_pool: int = 0,
    fit_xp: jnp.ndarray = None,
    refine_iters: int = 0,
) -> jnp.ndarray:
    """Fused-EM GMM labels on a pre-built transposed buffer (xt_geometry).

    Mirrors models/gmm.py::gmm_fit semantics: deterministic k-means init
    (hard one-hot M-step), then EM with sklearn's tol rule on the mean
    log-likelihood (tol=0: exactly n_iter iterations), final E-step labels.
    Returns (B, n) int32 labels.

    ``fit_pool`` > 0 (requires ``hw`` = (h, w), n = h*w): the mixture is
    FITTED on the 2x2^fit_pool-mean-pooled pixel grid (exact block means,
    the same pooling the multigrid Lloyd uses; levels follow
    models/gmm.py::gmm_fit_levels) and only the final E-step assigns
    labels at full resolution. Every fit pass then streams 1/4^p of the
    data. Mirrored by golden/cluster.py::gmm_golden and
    models/gmm.py::gmm_fit with the identical pooling; measured
    equal-or-better mean PRI on the synthetic eval
    (experiments/exp_gmm_pooled_fit.py) — block means denoise the
    covariance estimates of smooth image features.

    ``fit_xp``: optional pre-built pooled fit buffer in the
    xt_geometry(h' * w', d) layout (normalized with the SAME full-res
    affine as ``xt``). The transposed pipeline builds it with MXU pooling
    matmuls on the channel-major energies (ops/features.py), because
    pooling the transposed buffer itself strides the lane axis — measured
    ~43 ms/batch-8 at config2 scale for the two _pool_xt levels vs ~2 ms
    for the assembly-side matmul pooling.

    ``refine_iters``: full-resolution EM passes run AFTER the (pooled) fit
    loop, before the final labeling pass. The pooled fit converges to the
    right basin cheaply but its covariances are fitted to block MEANS —
    averaging shrinks within-cluster variance, which moves the full-res
    log-prob decision boundaries (measured as a boundary-F drop on the
    synthetic eval). A couple of full-res passes restore the covariance
    scale at the cost of one xt stream each. Mirrored by golden and the
    XLA path.
    """
    if k > _KP:
        raise ValueError(f"fused EM supports k <= {_KP}, got {k}")
    if fit_pool > 0 and hw is None:
        raise ValueError("fit_pool requires hw=(h, w)")
    b, dp, n_pad = xt.shape
    block = _block_for_t(n, dp, jnp.dtype(xt.dtype).itemsize)
    if n_pad % block:
        raise ValueError(f"xt lane dim {n_pad} not a multiple of block {block}")
    interpret = jax.default_backend() != "tpu"

    # the fit buffer: full-res xt, a caller-provided pooled buffer, or the
    # _pool_xt fallback chain; levels follow models/gmm.py::gmm_fit_levels
    from gabor_color_image_segmentation_tpu.models.gmm import gmm_fit_levels

    fit_buf, m, block_f = xt, n, block
    lv = 0
    if fit_pool > 0:
        h, w = hw
        hp, wp, lv = gmm_fit_levels(h, w, fit_pool)
    if lv > 0 and fit_xp is not None:
        m = hp * wp
        block_f = _block_for_t(m, dp, jnp.dtype(fit_xp.dtype).itemsize)
        if fit_xp.shape[2] % block_f:
            raise ValueError(
                f"fit_xp lane dim {fit_xp.shape[2]} not a multiple of "
                f"{block_f}"
            )
        fit_buf = fit_xp
    elif lv > 0:
        from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
            _pool_xt,
        )

        for _ in range(lv):
            fit_buf, m, block_f = _pool_xt(fit_buf, d, h, w)
            h, w = h // 2, w // 2

    init_labels, _ = kmeans_fused_t_xt(fit_buf, k, d, m, kmeans_iters)
    lab_pad = jnp.zeros((b, fit_buf.shape[2]), jnp.int32).at[:, :m].set(
        init_labels
    )
    lab_pad = lab_pad.at[:, m:].set(-1)  # padded pixels vote for nobody
    msums0, covs0 = _init_moments(fit_buf, lab_pad, k, d)
    fused_prep = _use_fused_prep()
    if fused_prep:
        # loop state = the moment-scatter matrices themselves (they carry
        # counts/sums/scatter — the fused launch derives params in-kernel)
        params0 = covs0

        def em(covsM):
            a, bias, const = _params_from_moments_fused(
                covsM, d, dp, k, m, reg_covar
            )
            labels, ll, msums, covs = _em_pass(
                fit_buf, a, bias, const, k, block_f, m, interpret, d
            )
            return covs, ll / m, labels
    else:
        params0 = _moments_to_params(msums0, covs0, d, m, k, reg_covar)

        def em(params):
            a, bias, const = _params_to_kernel_inputs(*params, d, dp, k)
            labels, ll, msums, covs = _em_pass(
                fit_buf, a, bias, const, k, block_f, m, interpret, d
            )
            new = _moments_to_params(msums, covs, d, m, k, reg_covar)
            return new, ll / m, labels  # (B,) per-image mean log-likelihood

    ll0 = jnp.full((b,), -jnp.inf, jnp.float32)
    if tol == 0.0:
        def body(_, carry):
            params, _ = carry
            new, ll, _ = em(params)
            return new, ll
        params, _ = lax.fori_loop(0, n_iter, body, (params0, ll0))
    else:
        # per-image tol with per-image FREEZING, exactly like vmapping the
        # XLA solver's while_loop over the batch: a converged image's params
        # stop updating (vmapped while_loop freezes done lanes via select).
        # Loop FORM (round 4): a fixed-count fori_loop over n_iter, NOT a
        # data-dependent while_loop that exits when every image converges.
        # Bitwise identical — once go_b[i] is False, image i's params never
        # change, so iterations past global convergence are no-ops — and
        # the config2 stage split showed the while form's cost was almost
        # entirely per-iteration LOOP overhead, not body work (measured
        # stages summed to ~7 of 19.3 ms/op; the pooled EM body is ~0.1 ms
        # while the mean trip count is 28 of the 30 cap, so the early exit
        # saved ~2 body-iterations and paid condition/sync overhead on all
        # 28). exp_gmm_loopform.py pins the A/B.
        def freeze(go_b, new, old):
            mask = go_b.reshape((b,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        def body(i, carry):
            params, prev_ll, go_b = carry
            new, ll, _ = em(params)
            if isinstance(new, tuple):
                params = tuple(
                    freeze(go_b, n_, o_) for n_, o_ in zip(new, params)
                )
            else:  # fused-prep state: the moment-scatter array itself
                params = freeze(go_b, new, params)
            ll = jnp.where(go_b, ll, prev_ll)
            go_b = go_b & (jnp.abs(ll - prev_ll) >= tol)
            return params, ll, go_b

        go0 = jnp.full((b,), n_iter > 0)
        params, _, _ = lax.fori_loop(0, n_iter, body, (params0, ll0, go0))

    if fused_prep:
        # the loop carried moments; the refine/label tail below speaks
        # sklearn params — derive them once (the ones-row of each scatter
        # matrix is the msums row, its (d, d) entry the count)
        covsM = params
        msums = jnp.zeros((b, _KP, dp), jnp.float32).at[:, :k].set(
            covsM[:, :, d, :]
        )
        params = _moments_to_params(msums, covsM, d, m, k, reg_covar)

    # full-resolution refinement passes (see docstring); unrolled — small
    for _ in range(refine_iters):
        a, bias, const = _params_to_kernel_inputs(*params, d, dp, k)
        _, _, msums, covs = _em_pass(
            xt, a, bias, const, k, block, n, interpret, d
        )
        params = _moments_to_params(msums, covs, d, n, k, reg_covar)

    a, bias, const = _params_to_kernel_inputs(*params, d, dp, k)
    labels, _, _, _ = _em_pass(xt, a, bias, const, k, block, n, interpret,
                               moments=False)
    return labels[:, :n]


def gmm_fused_t(
    x: jnp.ndarray,
    k: int,
    n_iter: int = 30,
    reg_covar: float = 1e-4,
    kmeans_iters: int = 10,
    tol: float = 0.0,
    hw: tuple = None,
    fit_pool: int = 0,
    refine_iters: int = 0,
) -> jnp.ndarray:
    """(B, N, D) (or (N, D)) -> (B, N) int32 labels via the fused EM kernel.

    Builds the shared transposed buffer then solves; see gmm_fused_t_xt
    (incl. the pooled-fit schedule behind ``hw``/``fit_pool`` and the
    full-res ``refine_iters`` passes).
    bf16 inputs stay bf16 in STORAGE only (the pipeline-wide feature
    contract); the EM algebra is f32-accurate either way — _split_dot never
    bf16-rounds the f32 side of a product."""
    if x.ndim == 2:
        return gmm_fused_t(x[None], k, n_iter, reg_covar, kmeans_iters, tol,
                           hw, fit_pool, refine_iters)[0]
    b, n, d = x.shape
    dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xt = build_xt(x, dtype)
    fit_xp = None
    if fit_pool > 0:
        # pooled fit buffer from the FLAT features (sublane-stride pooling,
        # models.kmeans.pool2x2) + a small transposed build — NOT _pool_xt
        # on the big transposed buffer, whose lane strides measured ~43
        # ms/batch-8 at config2 scale
        from gabor_color_image_segmentation_tpu.models.gmm import (
            gmm_fit_levels,
        )
        from gabor_color_image_segmentation_tpu.models.kmeans import pool2x2

        h, w = hw
        _, _, lv = gmm_fit_levels(h, w, fit_pool)
        if lv > 0:
            fit_x = x
            for _ in range(lv):
                fit_x = pool2x2(fit_x, h, w)
                h, w = h // 2, w // 2
            fit_xp = build_xt(fit_x, dtype)
    return gmm_fused_t_xt(xt, k, d, n, n_iter, reg_covar, kmeans_iters, tol,
                          hw, fit_pool, fit_xp, refine_iters)
