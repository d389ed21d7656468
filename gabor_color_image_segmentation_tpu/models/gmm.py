"""JAX full-covariance GMM with per-image EM (SURVEY.md C9).

sklearn semantics (_gaussian_mixture.py: _estimate_gaussian_parameters /
_compute_precision_cholesky / _estimate_log_gaussian_prob; _base.py e-step),
TPU-shaped:

  * init: hard responsibilities from deterministic k-means (models/kmeans.py)
  * M-step: means via one-hot-style matmul; covariances via the
    E[xx^T] - mu mu^T form (k small static -> k MXU matmuls of (D,N)@(N,D)),
    never materializing the (N,k,D) diff tensor
  * E-step: batched Cholesky + triangular solve for Mahalanobis, log-sum-exp
    responsibilities
  * fixed iteration count (lax.fori_loop) so the solver vmaps over a batch

Everything fp32 (features are standardized, reg_covar stabilizes Cholesky);
the golden path (golden/cluster.py gmm_golden) is float64 — parity tests use
responsibility tolerances + label agreement.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gabor_color_image_segmentation_tpu.models.kmeans import kmeans
from gabor_color_image_segmentation_tpu.ops.precision import precision_for

_LOG2PI = 1.8378770664093453


class GMMParams(NamedTuple):
    weights: jnp.ndarray  # (k,)
    means: jnp.ndarray  # (k, D)
    covs: jnp.ndarray  # (k, D, D)


def _m_step(x: jnp.ndarray, resp: jnp.ndarray, reg_covar: float) -> GMMParams:
    n, d = x.shape
    k = resp.shape[1]
    nk = jnp.sum(resp, axis=0) + 10.0 * jnp.finfo(resp.dtype).eps  # (k,)
    # HIGHEST: TPU DEFAULT f32 dots bf16-round operands — measured driving
    # one full-size image's EM into a different basin (0.38 golden agreement
    # vs the fused kernel's 0.997; experiments/exp_gmm_fused_parity.py)
    means = jnp.dot(resp.T, x, preferred_element_type=jnp.float32,
                    precision=precision_for(jnp.float32)) / nk[:, None]

    def cov_j(j):
        rx = resp[:, j : j + 1] * x  # (N, D)
        exx = jnp.dot(x.T, rx, preferred_element_type=jnp.float32,
                      precision=precision_for(jnp.float32)) / nk[j]
        c = exx - jnp.outer(means[j], means[j])
        return c + reg_covar * jnp.eye(d, dtype=x.dtype)

    covs = jnp.stack([cov_j(j) for j in range(k)])
    return GMMParams(nk / n, means, covs)


def _log_prob(x: jnp.ndarray, params: GMMParams) -> jnp.ndarray:
    """(N, D) -> (N, k) weighted log prob log w_j + log N(x | mu_j, S_j).

    Stays on the triangular solve deliberately: replacing it with a
    precision-Cholesky MXU matmul was measured/modeled as a wash — the step
    is HBM-bound on the (D, N) diff (~2.4 ms/iter floor vs 3.0 measured),
    DEFAULT-precision f32 dots would bf16-round the Mahalanobis (~0.3
    absolute on maha ~ 39 -> boundary responsibility shifts), and HIGHEST
    costs 6 MXU passes (~9 ms/iter > the solve)."""
    n, d = x.shape

    def per_component(mean, cov):
        chol = jnp.linalg.cholesky(cov)  # lower
        diff = (x - mean).T  # (D, N)
        y = jax.scipy.linalg.solve_triangular(chol, diff, lower=True)
        maha = jnp.sum(y * y, axis=0)  # (N,)
        log_det = jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (d * _LOG2PI + maha) - log_det

    lp = jax.vmap(per_component)(params.means, params.covs)  # (k, N)
    return lp.T + jnp.log(params.weights)


def _e_step(x: jnp.ndarray, params: GMMParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    weighted = _log_prob(x, params)
    norm = jax.scipy.special.logsumexp(weighted, axis=1, keepdims=True)
    return weighted - norm, jnp.mean(norm)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def gmm_fit(
    x: jnp.ndarray,
    k: int,
    n_iter: int = 30,
    reg_covar: float = 1e-4,
    kmeans_iters: int = 10,
    tol: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, GMMParams]:
    """(N, D) -> (labels (N,) int32, resp (N, k), params). vmap for batches.

    tol > 0 enables sklearn's convergence rule (GaussianMixture tol,
    _base.py fit_predict): stop when the mean log-likelihood improves by
    less than tol between EM iterations. tol=0 runs exactly n_iter
    iterations (the fixed-count contract shared with golden/cluster.py)."""
    x = x.astype(jnp.float32)
    init_labels, _ = kmeans(x, k, kmeans_iters)
    resp0 = jax.nn.one_hot(init_labels, k, dtype=jnp.float32)
    params0 = _m_step(x, resp0, reg_covar)

    def em(params):
        log_resp, ll = _e_step(x, params)
        return _m_step(x, jnp.exp(log_resp), reg_covar), ll

    if tol == 0.0:
        params = lax.fori_loop(0, n_iter, lambda _, p: em(p)[0], params0)
    else:

        def cond(carry):
            return carry[3]

        def body(carry):
            i, params, prev_ll, _ = carry
            new, ll = em(params)
            go = (i + 1 < n_iter) & (jnp.abs(ll - prev_ll) >= tol)
            return i + 1, new, ll, go

        _, params, _, _ = lax.while_loop(
            cond, body, (jnp.int32(0), params0, jnp.float32(-jnp.inf), n_iter > 0)
        )
    log_resp, _ = _e_step(x, params)
    labels = jnp.argmax(log_resp, axis=1).astype(jnp.int32)
    return labels, jnp.exp(log_resp), params


def gmm_predict(
    x: jnp.ndarray,
    k: int,
    n_iter: int = 30,
    reg_covar: float = 1e-4,
    subsample: int = 1,
    tol: float = 0.0,
) -> jnp.ndarray:
    """Labels-only entry used by the pipeline.

    subsample > 1 fits EM on every n-th pixel and runs one final E-step over
    all pixels (documented speed knob, exact when 1 — same contract as
    kmeans_fit_assign)."""
    if subsample == 1:
        return gmm_fit(x, k, n_iter, reg_covar, 10, tol)[0]
    x = x.astype(jnp.float32)
    _, _, params = gmm_fit(x[::subsample], k, n_iter, reg_covar, 10, tol)
    log_resp, _ = _e_step(x, params)
    return jnp.argmax(log_resp, axis=1).astype(jnp.int32)
