"""Boundary-F metric: protocol properties + host/device agreement."""

import numpy as np
import pytest

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
