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
