"""Parity of the one-launch Pallas batched Cholesky + triangular inverse
(models/chol_pallas.py) against the XLA factorization it replaces in
config2's per-EM-iteration glue (models/gmm_pallas.py
_params_to_kernel_inputs)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gabor_color_image_segmentation_tpu.models.chol_pallas import (  # noqa: E402
    precision_chol_pallas,
)


def _spd_batch(rng, lead, d, reg=1e-3):
    a = rng.standard_normal(lead + (d, d + 8)).astype(np.float64)
    cov = a @ a.transpose(*range(len(lead)), -1, -2) / (d + 8)
    cov = cov + reg * np.eye(d)
    return cov.astype(np.float32)


@pytest.mark.parametrize("d", [3, 8, 39, 40])
def test_matches_xla_factorization(d):
    rng = np.random.default_rng(0)
    cov = _spd_batch(rng, (8, 5), d)
    pt, diag = jax.jit(precision_chol_pallas, static_argnames="d")(
        jnp.asarray(cov), d=d
    )
    chol = np.linalg.cholesky(cov.astype(np.float64))
    pt_ref = np.linalg.inv(chol)  # solve_triangular(chol, I, lower) exact
    np.testing.assert_allclose(
        np.asarray(pt), pt_ref, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(diag),
        np.diagonal(chol, axis1=-2, axis2=-1),
        rtol=1e-5,
    )
    # strict lower-triangularity of P^T (upper strictly zero)
    upper = np.triu(np.asarray(pt), 1)
    assert np.abs(upper).max() == 0.0


def test_matches_gmm_glue_exactly_enough():
    """Against the exact expressions _params_to_kernel_inputs uses, at
    config2's true shape (B=8, k=5, d=39), f32 tolerance."""
    rng = np.random.default_rng(7)
    d = 39
    cov = _spd_batch(rng, (8, 5), d, reg=1e-2)
    covj = jnp.asarray(cov)
    pt, diag = precision_chol_pallas(covj, d=d)
    chol = jnp.linalg.cholesky(covj)
    pt_ref = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(jnp.eye(d), (8, 5, d, d)), lower=True
    )
    rel = np.abs(np.asarray(pt - pt_ref)) / (np.abs(np.asarray(pt_ref)) + 1e-3)
    assert rel.max() < 5e-4, rel.max()
    logdet = -jnp.sum(jnp.log(diag), axis=-1)
    logdet_ref = -jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(logdet), np.asarray(logdet_ref), rtol=1e-5, atol=1e-4
    )


def test_d_past_lane_width_raises():
    """d > 128 would scatter past the (R, 128) lane tile — must fail
    loudly with an actionable message, not an opaque shape error
    (advisor r4 low #1)."""
    import pytest

    covs = jnp.eye(130)[None]
    with pytest.raises(ValueError, match="d <= 128"):
        precision_chol_pallas(covs, d=130)


def test_params_kernel_matches_xla():
    """The fused moments->params->factorization launch must reproduce the
    XLA chain (_moments_to_params -> cholesky/solve_triangular ->
    bias/const) at config2's true shape; f32 tolerance (the bias
    reduction order differs)."""
    from gabor_color_image_segmentation_tpu.models.chol_pallas import (
        precision_chol_params_pallas,
    )
    from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
        _LOG2PI,
        _moments_to_params,
    )

    rng = np.random.default_rng(3)
    b, k, d, dp, m_rows = 2, 5, 39, 48, 9801
    # synthetic moment-scatter matrices with the ones-row contract:
    # C = sum_px resp * xext xext^T with xext = [x, 1] in dp rows
    x = rng.normal(size=(b, m_rows, d))
    xe = np.zeros((b, m_rows, dp))
    xe[:, :, :d] = x
    xe[:, :, d] = 1.0
    resp = rng.random((b, k, m_rows)) + 0.05
    covsM = np.einsum("bkn,bni,bnj->bkij", resp, xe, xe).astype(np.float32)

    xk, diag, bias, const = precision_chol_params_pallas(
        jnp.asarray(covsM), d, m_rows, 1e-4
    )

    msums = np.zeros((b, 8, dp), np.float32)
    msums[:, :k] = covsM[:, :, d, :]
    w_, mu, cov = _moments_to_params(
        jnp.asarray(msums), jnp.asarray(covsM), d, m_rows, k, 1e-4
    )
    chol = np.linalg.cholesky(np.asarray(cov)[:, :, :d, :d])
    pt_ref = np.stack([
        np.stack([
            np.linalg.solve(chol[i, j], np.eye(d)) for j in range(k)
        ]) for i in range(b)
    ])
    got = np.asarray(xk).reshape(b, k, dp, 128)[:, :, :d, :d]
    rel = np.abs(got - pt_ref) / (np.abs(pt_ref) + 1e-3)
    assert rel.max() < 5e-4, rel.max()
    # bias = P^T mu; const = log w + logdet - d/2 log2pi
    bias_ref = np.einsum("bkij,bkj->bki", pt_ref, np.asarray(mu))
    got_b = np.asarray(bias).reshape(b, k, dp)[:, :, :d]
    np.testing.assert_allclose(got_b, bias_ref, rtol=2e-4, atol=2e-4)
    logdet = -np.log(
        np.diagonal(chol, axis1=-2, axis2=-1)
    ).sum(-1)
    const_ref = np.log(np.asarray(w_)) + logdet - 0.5 * d * _LOG2PI
    np.testing.assert_allclose(
        np.asarray(const)[:, 0].reshape(b, k), const_ref,
        rtol=1e-5, atol=1e-4,
    )
