"""PRI metric properties + sklearn parity (SURVEY.md C15, §4.2)."""

import numpy as np

from gabor_color_image_segmentation_tpu.metrics.pri import (
    pri_np,
    rand_index_jax,
    rand_index_np,
)


def test_identity_is_one(rng):
    x = rng.integers(0, 5, (30, 40))
    assert rand_index_np(x, x) == 1.0
    assert pri_np(x, [x, x]) == 1.0


def test_matches_sklearn(rng):
    from sklearn.metrics import rand_score

    a = rng.integers(0, 5, 500)
    b = rng.integers(0, 4, 500)
    assert abs(rand_index_np(a, b) - rand_score(a, b)) < 1e-12


def test_jax_matches_np(rng):
    a = rng.integers(0, 6, (20, 30)).astype(np.int32)
    b = rng.integers(0, 4, (20, 30)).astype(np.int32)
    ours = float(rand_index_jax(a, b, 6, 4))
    gold = rand_index_np(a, b)
    assert abs(ours - gold) < 1e-5


def test_permutation_invariance(rng):
    a = rng.integers(0, 5, 300)
    b = rng.integers(0, 5, 300)
    perm = np.array([3, 0, 4, 1, 2])
    assert abs(rand_index_np(perm[a], b) - rand_index_np(a, b)) < 1e-12
