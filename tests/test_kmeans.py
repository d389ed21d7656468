"""k-means golden parity + sklearn cross-validation (SURVEY.md C8)."""

import numpy as np

from gabor_color_image_segmentation_tpu.models.kmeans import kmeans, maximin_init
from gabor_color_image_segmentation_tpu.utils.labels import align_labels
from golden.cluster import kmeans_golden, maximin_init_np


def _blobs(rng, n=2000, k=4, d=8, spread=0.08):
    centers = rng.normal(size=(k, d)) * 3.0
    labels = rng.integers(0, k, n)
    x = centers[labels] + rng.normal(size=(n, d)) * spread
    return x.astype(np.float32), labels


def test_maximin_init_matches_golden(rng):
    x, _ = _blobs(rng)
    ours = np.asarray(maximin_init(x, 4))
    gold = maximin_init_np(x, 4)
    np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_labels_match_golden(rng):
    x, _ = _blobs(rng, n=3000, k=5, d=6)
    ours, c_ours = kmeans(x, 5, 20)
    gold, c_gold = kmeans_golden(x, 5, 20)
    agree = (np.asarray(ours) == gold).mean()
    assert agree > 0.999, f"label agreement {agree}"
    np.testing.assert_allclose(np.asarray(c_ours), c_gold, atol=1e-3)


def test_recovers_true_clusters(rng):
    x, true = _blobs(rng, n=4000, k=4, d=10, spread=0.05)
    labels, _ = kmeans(x, 4, 25)
    aligned = align_labels(np.asarray(labels), true)
    assert (aligned == true).mean() > 0.999


def test_matches_sklearn_quality(rng):
    """Same-or-better inertia than sklearn KMeans on well-separated blobs."""
    from sklearn.cluster import KMeans

    x, _ = _blobs(rng, n=2500, k=4, d=8)
    labels, centers = kmeans(x, 4, 25)
    sk = KMeans(n_clusters=4, n_init=1, random_state=0, max_iter=25).fit(x)
    ours_inertia = float(
        ((x - np.asarray(centers)[np.asarray(labels)]) ** 2).sum()
    )
    assert ours_inertia <= sk.inertia_ * 1.01


def test_empty_cluster_keeps_center():
    x = np.array([[0.0, 0], [0, 0.1], [10, 10], [10, 10.1]], np.float32)
    labels, centers = kmeans(x, 3, 5)
    assert np.asarray(labels).max() <= 2
    assert np.isfinite(np.asarray(centers)).all()


def test_subsampled_close_to_exact(rng):
    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_fit_assign

    x, _ = _blobs(rng, n=4000, k=4, d=10, spread=0.05)
    exact, _ = kmeans_fit_assign(x, 4, 25)
    import jax.numpy as jnp

    fast, _ = kmeans_fit_assign(x, 4, 25, jnp.float32, 4)
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    aligned = align_labels(np.asarray(fast), np.asarray(exact))
    assert (aligned == np.asarray(exact)).mean() > 0.99


def test_fused_pallas_matches_plain(rng):
    """Interpret-mode fused Lloyd step == plain XLA kmeans (same math)."""
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import kmeans_fused

    x, _ = _blobs(rng, n=3000, k=4, d=16)
    l_plain, c_plain = kmeans(x, 4, 15)
    l_fused, c_fused = kmeans_fused(x, 4, 15)
    assert (np.asarray(l_plain) == np.asarray(l_fused)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(c_plain), np.asarray(c_fused), atol=1e-3)


def test_fused_pallas_batched(rng):
    """Batched fused Lloyd == per-image XLA kmeans, image by image."""
    import jax

    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import kmeans_fused

    xs = np.stack([_blobs(rng, n=1500, k=3, d=7)[0] for _ in range(3)])
    l_fused, c_fused = kmeans_fused(jax.numpy.asarray(xs), 3, 12)
    for i in range(3):
        l_plain, c_plain = kmeans(xs[i], 3, 12)
        assert (np.asarray(l_fused[i]) == np.asarray(l_plain)).mean() > 0.999
        np.testing.assert_allclose(
            np.asarray(c_fused[i]), np.asarray(c_plain), atol=1e-3
        )


def test_fused_t_matches_plain(rng):
    """Interpret-mode v3 (transposed-layout) fused Lloyd == plain XLA kmeans."""
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t,
    )

    x, _ = _blobs(rng, n=3000, k=5, d=16)
    l_plain, c_plain = kmeans(x, 5, 15)
    l_fused, c_fused = kmeans_fused_t(x, 5, 15)
    assert (np.asarray(l_plain) == np.asarray(l_fused)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(c_plain), np.asarray(c_fused), atol=1e-3)


def test_fused_t_batched(rng):
    """Batched v3 fused Lloyd == per-image XLA kmeans, image by image."""
    import jax

    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t,
    )

    xs = np.stack([_blobs(rng, n=1500, k=3, d=7)[0] for _ in range(3)])
    l_fused, c_fused = kmeans_fused_t(jax.numpy.asarray(xs), 3, 12)
    for i in range(3):
        l_plain, c_plain = kmeans(xs[i], 3, 12)
        assert (np.asarray(l_fused[i]) == np.asarray(l_plain)).mean() > 0.999
        np.testing.assert_allclose(
            np.asarray(c_fused[i]), np.asarray(c_plain), atol=1e-3
        )


def test_multigrid_matches_golden(rng):
    """XLA multigrid schedule (pooled warmup + full-res refine) == the
    golden mirror, label for label."""
    from gabor_color_image_segmentation_tpu.models.kmeans import (
        kmeans_multigrid,
        pool2x2,
    )
    from golden.cluster import kmeans_golden_multigrid, pool2x2_np

    h, w, d = 40, 50, 6
    x, _ = _blobs(rng, n=h * w, k=4, d=d)
    # pooling mirrors exactly
    np.testing.assert_array_equal(
        np.asarray(pool2x2(x, h, w)), pool2x2_np(x, h, w)
    )
    ours, c_ours = kmeans_multigrid(x, 4, (h, w), 8, 6)
    gold, c_gold = kmeans_golden_multigrid(x, 4, (h, w), 8, 6)
    agree = (np.asarray(ours) == gold).mean()
    assert agree > 0.999, f"multigrid label agreement {agree}"
    np.testing.assert_allclose(np.asarray(c_ours), c_gold, atol=1e-3)


def test_multigrid_fused_matches_xla(rng):
    """Fused (interpret-mode) multigrid == XLA multigrid on a batch."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_multigrid
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t,
    )

    h, w, d = 72, 64, 6  # n = 4608 >= the fused-path minimum problem size
    xs = np.stack([_blobs(rng, n=h * w, k=4, d=d)[0] for _ in range(2)])
    fused_l, fused_c = kmeans_fused_t(
        jnp.asarray(xs), 4, 25, jnp.float32, 1, (h, w), 8, 6
    )
    for i in range(2):
        xla_l, xla_c = kmeans_multigrid(xs[i], 4, (h, w), 8, 6)
        agree = (np.asarray(fused_l[i]) == np.asarray(xla_l)).mean()
        assert agree == 1.0, f"image {i}: fused-vs-XLA multigrid {agree}"
        np.testing.assert_allclose(
            np.asarray(fused_c[i]), np.asarray(xla_c), rtol=2e-5, atol=2e-5
        )


def test_multigrid_quality_close_to_full(rng):
    """Multigrid clusters as well as the full 25-iteration run on SPATIALLY
    COHERENT features (inertia within 2%). The schedule's premise is that
    2x2 neighbors are similar — true for image features, and exactly why it
    is an image-pipeline option keyed on (h, w), not a generic k-means mode
    (on spatially-shuffled blobs the pooled warmup averages unrelated
    points and measured 3x worse inertia at a tight refine cap)."""
    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_multigrid

    h, w, d, k = 60, 70, 8, 5
    # piecewise-constant feature map (spatial patches) + noise
    region = (np.arange(h)[:, None] // 12 * 7 + np.arange(w)[None, :] // 14) % k
    centers = rng.normal(size=(k, d)) * 3.0
    x = (
        centers[region.reshape(-1)]
        + rng.normal(size=(h * w, d)) * 0.3
    ).astype(np.float32)
    full_l, full_c = kmeans(x, k, 25)
    mg_l, mg_c = kmeans_multigrid(x, k, (h, w), 10, 5)

    def inertia(l, c):
        return float(((x - np.asarray(c)[np.asarray(l)]) ** 2).sum())

    assert inertia(mg_l, mg_c) <= inertia(full_l, full_c) * 1.02


def test_multigrid_levels2_matches_golden(rng):
    """coarse_levels=2 (4x4 coarse grid): XLA == golden, label for label,
    and the 4x4 grid is exactly pool2x2 applied twice in both."""
    from gabor_color_image_segmentation_tpu.models.kmeans import (
        kmeans_multigrid,
        pool2x2,
    )
    from golden.cluster import kmeans_golden_multigrid, pool2x2_np

    h, w, d = 48, 56, 6
    x, _ = _blobs(rng, n=h * w, k=4, d=d)
    p2 = pool2x2(x, h, w)
    np.testing.assert_array_equal(
        np.asarray(pool2x2(p2, h // 2, w // 2)),
        pool2x2_np(pool2x2_np(x, h, w), h // 2, w // 2),
    )
    ours, c_ours = kmeans_multigrid(x, 4, (h, w), 8, 6, coarse_levels=2)
    gold, c_gold = kmeans_golden_multigrid(x, 4, (h, w), 8, 6, coarse_levels=2)
    agree = (np.asarray(ours) == gold).mean()
    assert agree > 0.999, f"levels-2 multigrid label agreement {agree}"
    np.testing.assert_allclose(np.asarray(c_ours), c_gold, atol=1e-3)


def test_multigrid_levels2_fused_matches_xla(rng):
    """Fused (interpret-mode) 4x4-coarse multigrid == XLA on a batch —
    covers the internal repeated _pool_xt chain."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_multigrid
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t,
    )

    h, w, d = 72, 64, 6
    xs = np.stack([_blobs(rng, n=h * w, k=4, d=d)[0] for _ in range(2)])
    fused_l, fused_c = kmeans_fused_t(
        jnp.asarray(xs), 4, 25, jnp.float32, 1, (h, w), 8, 6, coarse_levels=2
    )
    for i in range(2):
        xla_l, xla_c = kmeans_multigrid(xs[i], 4, (h, w), 8, 6,
                                        coarse_levels=2)
        agree = (np.asarray(fused_l[i]) == np.asarray(xla_l)).mean()
        assert agree == 1.0, f"image {i}: fused-vs-XLA levels-2 {agree}"
        np.testing.assert_allclose(
            np.asarray(fused_c[i]), np.asarray(xla_c), rtol=2e-5, atol=2e-5
        )


def test_multigrid_mid_levels_matches_golden(rng):
    """mid_iters > 0 (intermediate 2x2-level passes between the 4x4 warmup
    and full-res refinement): XLA == golden, label for label."""
    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_multigrid
    from golden.cluster import kmeans_golden_multigrid

    h, w, d = 48, 56, 6
    x, _ = _blobs(rng, n=h * w, k=4, d=d)
    ours, c_ours = kmeans_multigrid(
        x, 4, (h, w), 8, 2, coarse_levels=2, mid_iters=3
    )
    gold, c_gold = kmeans_golden_multigrid(
        x, 4, (h, w), 8, 2, coarse_levels=2, mid_iters=3
    )
    agree = (np.asarray(ours) == gold).mean()
    assert agree > 0.999, f"mid-level multigrid label agreement {agree}"
    np.testing.assert_allclose(np.asarray(c_ours), c_gold, atol=1e-3)
    # the mid passes must actually move the centers: under-converge the
    # warmup (1 coarse pass) so the intermediate level has work to do
    _, c_skip = kmeans_multigrid(x, 4, (h, w), 1, 0, coarse_levels=2)
    _, c_mid = kmeans_multigrid(x, 4, (h, w), 1, 0, coarse_levels=2,
                                mid_iters=3)
    assert (np.asarray(c_skip) != np.asarray(c_mid)).any()


def test_multigrid_mid_levels_fused_matches_xla(rng):
    """Fused xt solver with mid_iters == XLA with mid_iters on a batch —
    covers the intermediate-level pooled-buffer reuse in kmeans_fused_t_xt."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_multigrid
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t,
    )

    h, w, d = 72, 64, 6
    xs = np.stack([_blobs(rng, n=h * w, k=4, d=d)[0] for _ in range(2)])
    fused_l, fused_c = kmeans_fused_t(
        jnp.asarray(xs), 4, 25, jnp.float32, 1, (h, w), 8, 2,
        coarse_levels=2, mid_iters=3,
    )
    for i in range(2):
        xla_l, xla_c = kmeans_multigrid(
            xs[i], 4, (h, w), 8, 2, coarse_levels=2, mid_iters=3
        )
        agree = (np.asarray(fused_l[i]) == np.asarray(xla_l)).mean()
        assert agree == 1.0, f"image {i}: fused-vs-XLA mid-level {agree}"
        np.testing.assert_allclose(
            np.asarray(fused_c[i]), np.asarray(xla_c), rtol=2e-5, atol=2e-5
        )


def test_coarse_fused_all_matches_blocked(rng):
    """The bf16-gated whole-warmup kernel (_coarse_all_kernel: maximin
    seeding + ALL coarse Lloyd passes in ONE launch — the config1
    82.1->90.7 win) vs the blocked launch-per-pass path it replaces,
    forced via _COARSE_FUSE_BYTES=0 + a jit-cache clear (the gate is read
    at trace time). Advisor-r2 coverage gap: every other CPU kmeans test
    runs f32, which never takes the fused-all path. Reduction geometry
    differs (one m_pad-wide dot vs per-block partials summed in XLA), so
    centers match to f32-accumulation tolerance, not bitwise."""
    import jax.numpy as jnp

    import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp

    k, d, m, b = 5, 11, 2048, 2
    dp, m_pad, _ = kp.xt_geometry(m, d, jnp.bfloat16)
    xp = np.zeros((b, dp, m_pad), np.float32)
    for i in range(b):
        xb, _ = _blobs(rng, n=m, k=k, d=d)
        xp[i, :d, :m] = xb.T
        xp[i, d, :m] = 1.0  # ones-row: update sums double as counts
    xp = jnp.asarray(xp, jnp.bfloat16)

    fused = np.asarray(kp.kmeans_coarse_centers_xp(xp, k, d, m, 7))
    old = kp._COARSE_FUSE_BYTES
    try:
        kp._COARSE_FUSE_BYTES = 0  # force the blocked launch-per-pass form
        kp.kmeans_coarse_centers_xp.clear_cache()
        blocked = np.asarray(kp.kmeans_coarse_centers_xp(xp, k, d, m, 7))
    finally:
        kp._COARSE_FUSE_BYTES = old
        kp.kmeans_coarse_centers_xp.clear_cache()
    assert fused.shape == blocked.shape == (b, k, d)
    np.testing.assert_allclose(fused, blocked, rtol=1e-3, atol=1e-3)
