"""Boundary-F metric: protocol properties + host/device agreement."""

import numpy as np

from gabor_color_image_segmentation_tpu.metrics.boundary import (
    boundaries_np,
    default_tolerance,
    fboundary_jax,
    fboundary_np,
)


def _halves(h=40, w=60, split=30):
    x = np.zeros((h, w), np.int32)
    x[:, split:] = 1
    return x


def test_perfect_match():
    gt = _halves()
    p, r, f = fboundary_np(gt, [gt])
    assert p == r == f == 1.0


def test_shifted_within_tolerance():
    gt = _halves(split=30)
    pred = _halves(split=32)  # 2px shift < tol (~0.54 for 40x60... check)
    tol = default_tolerance(40, 60)
    if tol >= 2.0:
        p, r, f = fboundary_np(pred, [gt], tol_frac=0.05)
        assert f == 1.0
    # with a generous tolerance the shifted boundary fully matches
    p, r, f = fboundary_np(pred, [gt], tol_frac=0.05)
    assert f == 1.0
    # with a tiny tolerance it fully misses
    p, r, f = fboundary_np(pred, [gt], tol_frac=1e-6)
    assert f == 0.0


def test_extra_boundaries_reduce_precision_not_recall():
    gt = _halves()
    pred = gt.copy()
    pred[10:20, 10] = 2  # spurious region boundary far from the true one
    pred[10:20, :10] = 2
    p, r, f = fboundary_np(pred, [gt], tol_frac=0.02)
    assert r == 1.0
    assert p < 1.0


def test_multiple_gts_union_precision():
    gt1 = _halves(split=20)
    gt2 = _halves(split=40)
    pred = _halves(split=20)
    p, _, _ = fboundary_np(pred, [gt1, gt2], tol_frac=0.02)
    assert p == 1.0  # matches gt1 fully, union rule


def test_device_matches_host_on_clean_case():
    gt = _halves()
    pred = _halves(split=32)
    tol = 4.0
    prf = np.asarray(fboundary_jax(pred, gt, tol))
    p, r, f = fboundary_np(pred, [gt], tol_frac=tol / np.hypot(40, 60))
    # one-to-one vs dilated agree when boundaries are same-cardinality curves
    np.testing.assert_allclose(prf, [p, r, f], atol=1e-6)


def test_boundary_extraction():
    x = _halves(split=3)
    b = boundaries_np(x)
    assert b[:, 2].all() and not b[:, 0].any() and not b[:, 4].any()


def test_tolerance_monotonicity():
    """F never decreases as the matching tolerance grows (SURVEY.md §4.2)."""
    rng = np.random.default_rng(1)
    pred = (rng.random((40, 60)) < 0.5).astype(np.int32)
    gt = (rng.random((40, 60)) < 0.5).astype(np.int32)
    fs = [fboundary_np(pred, [gt], tol_frac=t)[2] for t in (0.001, 0.01, 0.05, 0.1)]
    assert all(a <= b + 1e-12 for a, b in zip(fs, fs[1:])), fs


def test_device_dt_exactness():
    """The truncated distance transform is exact within its radius."""
    from scipy.ndimage import distance_transform_edt

    from gabor_color_image_segmentation_tpu.metrics.boundary import _truncated_sq_dt

    rng = np.random.default_rng(2)
    mask = rng.random((32, 48)) < 0.03
    if not mask.any():
        mask[10, 10] = True
    r = 6
    ours = np.asarray(_truncated_sq_dt(mask, r))
    exact = distance_transform_edt(~mask) ** 2
    inside = exact <= r * r
    np.testing.assert_allclose(ours[inside], exact[inside], atol=1e-4)
    assert (ours[~inside] >= r * r).all()
