"""Parity tests for the relayout-free CHW Lloyd solver (models/kmeans_chw.py).

Reference: models.kmeans.kmeans / kmeans_multigrid on the NHWC-normalized
features — the same semantic reference the xt solver pins against. The chw
solver folds the standardization affine into the center transform, so its
real arithmetic is identical; float rounding differs only at borderline
pixels (raw-sum vs normalized-sum center updates), hence agreement floors
rather than bitwise equality.

Runs in Pallas interpret mode on the CPU backend (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabor_color_image_segmentation_tpu.config import ClusterConfig
from gabor_color_image_segmentation_tpu.models.kmeans import (
    kmeans,
    kmeans_multigrid,
)
from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
    _affine_params,
    build_color4,
    kmeans_fused_chw,
)
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def _mk_inputs(b, e, h, w, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    # piecewise-constant blocks + noise: realistic cluster structure
    base = rng.normal(size=(b, e, 2, 2)).repeat(h // 2 + 1, 2).repeat(
        w // 2 + 1, 3
    )[:, :, :h, :w]
    energies = np.abs(base + 0.15 * rng.normal(size=(b, e, h, w))) * 3.0
    color = rng.uniform(0, 100, size=(b, h, w, 3))
    return (
        jnp.asarray(energies, dtype),
        jnp.asarray(color, jnp.float32),
    )


def _reference_features(energies_cm, color, cfg):
    """NHWC-normalized features via the chw affine (real-arith identical to
    assemble_features)."""
    xc4 = build_color4(color, jnp.float32)
    a, b_aff = _affine_params(
        energies_cm.astype(jnp.float32), xc4, cfg, 1e-6
    )
    b, e, h, w = energies_cm.shape
    raw = jnp.concatenate(
        [energies_cm.astype(jnp.float32).reshape(b, e, h * w),
         jnp.transpose(color, (0, 3, 1, 2)).reshape(b, 3, h * w)],
        axis=1,
    )  # (B, D, N)
    x = jnp.swapaxes(raw, 1, 2) * a[:, None, :] + b_aff[:, None, :]
    return x, (a, b_aff), xc4


def _agreement(la, lb):
    la = np.asarray(la).reshape(-1)
    lb = np.asarray(lb).reshape(-1)
    return (align_labels(la, lb) == lb).mean()


@pytest.mark.parametrize("h,w,k", [(24, 20, 4), (21, 19, 5)])
def test_chw_matches_reference_flat(h, w, k):
    """Single-grid chw Lloyd vs models.kmeans.kmeans on normalized feats;
    h=21 exercises the masked (non-multiple-of-HB) row blocks."""
    cfg = ClusterConfig(method="kmeans", k=k)
    energies_cm, color = _mk_inputs(2, 6, h, w, seed=3)
    x, affine, xc4 = _reference_features(energies_cm, color, cfg)
    ref_labels, ref_centers = jax.vmap(
        lambda xi: kmeans(xi, k, 12)
    )(x)
    labels, centers = kmeans_fused_chw(
        energies_cm, xc4, affine, k, n_iter=12
    )
    assert labels.shape == (2, h, w)
    ag = _agreement(labels, ref_labels.reshape(2, h, w))
    assert ag >= 0.995, ag
    # centers in normalized space, same seeding -> same cluster identities
    np.testing.assert_allclose(
        np.sort(np.asarray(centers), axis=1),
        np.sort(np.asarray(ref_centers), axis=1),
        rtol=2e-3, atol=2e-3,
    )


def test_chw_matches_reference_multigrid():
    cfg = ClusterConfig(method="kmeans", k=4, coarse_iters=4, refine_iters=4)
    h, w = 26, 22
    energies_cm, color = _mk_inputs(2, 5, h, w, seed=7)
    x, affine, xc4 = _reference_features(energies_cm, color, cfg)
    ref_labels, _ = jax.vmap(
        lambda xi: kmeans_multigrid(xi, 4, (h, w), 4, 4)
    )(x)
    labels, _ = kmeans_fused_chw(
        energies_cm, xc4, affine, 4, coarse_iters=4, refine_iters=4
    )
    ag = _agreement(labels, ref_labels.reshape(2, h, w))
    assert ag >= 0.995, ag


def test_chw_unnormalized_and_bf16_storage():
    """normalize=False path + bf16 raw storage still tracks the reference."""
    cfg = ClusterConfig(method="kmeans", k=3, normalize=False)
    h, w = 20, 18
    energies_cm, color = _mk_inputs(1, 4, h, w, seed=11, dtype=jnp.bfloat16)
    x, affine, xc4 = _reference_features(energies_cm, color, cfg)
    xc4 = xc4.astype(jnp.bfloat16)
    # bf16 reference: the chw path stores raw rows in bf16, so the honest
    # comparison quantizes the reference's Lloyd dots the same way; the
    # remaining flips are storage-rounding borderline pixels (uniform-random
    # color has no cluster structure, so they are comparatively many)
    ref_labels, _ = jax.vmap(lambda xi: kmeans(xi, 3, 10, jnp.bfloat16))(x)
    labels, _ = kmeans_fused_chw(energies_cm, xc4, affine, 3, n_iter=10)
    ag = _agreement(labels, ref_labels.reshape(1, h, w))
    assert ag >= 0.97, ag
