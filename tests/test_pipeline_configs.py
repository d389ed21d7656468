"""End-to-end runs of the remaining acceptance presets on the CPU backend:
config2 (GMM), config3 (ncut graph), mincut variant (SURVEY.md §4.3)."""

import dataclasses

import numpy as np
import pytest

from gabor_color_image_segmentation_tpu.config import GraphConfig, preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import (
    segment_batch,
    segment_images,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank


@pytest.fixture(scope="module")
def batch2():
    imgs, gts = [], []
    for i in range(2):
        rgb, gt = synthetic_mosaic(h=96, w=128, n_regions=4, seed=20 + i)
        imgs.append(rgb)
        gts.append(gt)
    return np.stack(imgs), gts


def test_config2_gmm(batch2):
    imgs, gts = batch2
    cfg = preset("config2").replace(batch_size=2)
    cfg = cfg.replace(cluster=dataclasses.replace(cfg.cluster, n_iter=15))
    labels, _ = segment_batch(imgs, cfg, make_bank(cfg.bank))
    labels = np.asarray(labels)
    assert labels.shape == imgs.shape[:3]
    pris = [pri_np(labels[i], [gts[i]]) for i in range(2)]
    assert min(pris) > 0.72, pris  # k=5 GMM legitimately over-segments the 4-region mosaic


def test_config3_ncut(batch2):
    imgs, gts = batch2
    cfg = preset("config3").replace(batch_size=2)
    # pin the graph params this toy-geometry sanity gate was written for:
    # the round-5 production preset (900 cells, compactness 5, sigma scale
    # 0.1) is tuned for 321x481 and miscalibrated at 64 cells on a small
    # mosaic; the production operating point is pinned by the eval tables
    # (exp_config3_candidate_eval.py), not by this mechanism test
    cfg = cfg.replace(graph=dataclasses.replace(
        cfg.graph, n_superpixels=64, n_regions=4, slic_compactness=10.0,
        affinity_sigma_scale=1.0))
    labels, _ = segment_batch(imgs, cfg, make_bank(cfg.bank))
    labels = np.asarray(labels)
    assert labels.shape == imgs.shape[:3]
    assert labels.max() < cfg.graph.n_regions
    pris = [pri_np(labels[i], [gts[i]]) for i in range(2)]
    assert min(pris) > 0.8, pris


def test_mincut_variant(batch2):
    imgs, gts = batch2
    cfg = preset("config3").replace(batch_size=2)
    # mincut_k recalibrated after connectivity enforcement landed in the
    # superpixel stage: connected superpixels have cleaner means (no speckle
    # fragments), so inter-superpixel distances shrank and the merge
    # threshold follows (k=50 was tuned for fragmented maps; k=15 measures
    # PRI [0.943, 0.814] with sane region counts on this fixture, while
    # k=20 already over-merges image 2 into one region)
    cfg = cfg.replace(
        graph=GraphConfig(
            enabled=True, n_superpixels=64, cut="mincut", mincut_k=15.0, mincut_min_size=2
        )
    )
    labels = np.asarray(segment_images(imgs, cfg))
    assert labels.shape == imgs.shape[:3]
    pris = [pri_np(labels[i], [gts[i]]) for i in range(2)]
    assert min(pris) > 0.75, pris


def test_transposed_fast_path_matches_regular(batch2):
    """Labels-only transposed pipeline (channel-major energies -> xt ->
    fused solver) == regular NHWC path, modulo float-tolerance tie flips."""
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    imgs, _ = batch2
    cfg = preset("config0").replace(batch_size=2, feature_impl="pallas")
    bank = make_bank(cfg.bank)
    ref, _ = segment_batch(imgs, cfg, bank)
    fast = _segment_batch_transposed(np.asarray(imgs), cfg, bank)
    ref, fast = np.asarray(ref), np.asarray(fast)
    assert fast.shape == ref.shape
    for i in range(ref.shape[0]):
        aligned = align_labels(fast[i], ref[i])
        agree = (aligned == ref[i]).mean()
        assert agree > 0.999, agree


def test_segment_batch_without_features(batch2):
    """with_features=False returns (labels, None); labels match the default
    path on the CPU backend (fast path is TPU-gated)."""
    imgs, _ = batch2
    cfg = preset("config0").replace(batch_size=2)
    bank = make_bank(cfg.bank)
    ref, feats = segment_batch(imgs, cfg, bank)
    lab, none = segment_batch(imgs, cfg, bank, False)
    assert none is None and feats is not None
    assert (np.asarray(lab) == np.asarray(ref)).all()


def test_transposed_fast_path_gmm(batch2):
    """Transposed pipeline with GMM clustering == regular path labels."""
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    imgs, _ = batch2
    cfg = preset("config2").replace(batch_size=2, feature_impl="pallas")
    cfg = cfg.replace(cluster=dataclasses.replace(cfg.cluster, n_iter=8))
    bank = make_bank(cfg.bank)
    ref, _ = segment_batch(imgs, cfg, bank)
    fast = _segment_batch_transposed(np.asarray(imgs), cfg, bank)
    ref, fast = np.asarray(ref), np.asarray(fast)
    for i in range(ref.shape[0]):
        aligned = align_labels(fast[i], ref[i])
        agree = (aligned == ref[i]).mean()
        assert agree > 0.99, agree


def test_transposed_fast_path_multigrid_levels2(batch2):
    """config1-shaped multigrid schedule at coarse_levels=2 (4x4 coarse
    grid): the CHW production path == the regular NHWC path running the
    identical schedule. Exercises the pooled-twin -> _pool2x2_cm ->
    assemble_xp -> coarse_centers_xp -> chw-refine chain."""
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    imgs, _ = batch2
    cfg = preset("config0").replace(batch_size=2, feature_impl="pallas")
    cfg = cfg.replace(
        cluster=dataclasses.replace(
            cfg.cluster, coarse_iters=6, refine_iters=4, coarse_levels=2
        )
    )
    bank = make_bank(cfg.bank)
    ref, _ = segment_batch(imgs, cfg, bank)
    fast = _segment_batch_transposed(np.asarray(imgs), cfg, bank)
    ref, fast = np.asarray(ref), np.asarray(fast)
    assert fast.shape == ref.shape
    for i in range(ref.shape[0]):
        aligned = align_labels(fast[i], ref[i])
        agree = (aligned == ref[i]).mean()
        assert agree > 0.99, agree


def test_transposed_fast_path_mid_iters(batch2):
    """config1-shaped schedule with intermediate-level passes (mid_iters>0):
    the CHW production path (2x2-twin mid passes between the 4x4 xp warmup
    and the full-res refinement) == the regular NHWC path running the
    identical schedule through kmeans_batch."""
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    imgs, _ = batch2
    cfg = preset("config0").replace(batch_size=2, feature_impl="pallas")
    cfg = cfg.replace(
        cluster=dataclasses.replace(
            cfg.cluster, coarse_iters=6, refine_iters=1, coarse_levels=2,
            mid_iters=3,
        )
    )
    bank = make_bank(cfg.bank)
    ref, _ = segment_batch(imgs, cfg, bank)
    fast = _segment_batch_transposed(np.asarray(imgs), cfg, bank)
    ref, fast = np.asarray(ref), np.asarray(fast)
    assert fast.shape == ref.shape
    for i in range(ref.shape[0]):
        aligned = align_labels(fast[i], ref[i])
        agree = (aligned == ref[i]).mean()
        assert agree > 0.99, agree


def test_transposed_gmm_pooled_fit_matches_regular():
    """gmm_fit_pool through the transposed pipeline (assembly-side matmul
    pooling + fit_xp) == the regular NHWC path (internal _pool_xt chain) —
    the two build the pooled fit buffer by different routes that are equal
    in real arithmetic. Image large enough to clear the 4096-pixel level
    guard."""
    import dataclasses as _dc

    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    imgs = np.stack(
        [synthetic_mosaic(h=160, w=224, n_regions=4, seed=40 + i)[0]
         for i in range(2)]
    )
    cfg = preset("config2").replace(batch_size=2, feature_impl="pallas")
    cfg = cfg.replace(
        cluster=_dc.replace(cfg.cluster, n_iter=8, gmm_fit_pool=1,
                            gmm_refine_iters=1)
    )
    bank = make_bank(cfg.bank)
    ref, _ = segment_batch(imgs, cfg, bank)
    fast = _segment_batch_transposed(np.asarray(imgs), cfg, bank)
    ref, fast = np.asarray(ref), np.asarray(fast)
    for i in range(2):
        agree = (align_labels(fast[i], ref[i]) == ref[i]).mean()
        assert agree > 0.99, agree


@pytest.mark.parametrize(
    "preset_name,hw",
    [("config0", (97, 131)), ("config3", (60, 200))],
)
def test_off_nominal_image_sizes(preset_name, hw):
    """Odd and wide-rectangular shapes run end-to-end through both pipeline
    families (Pallas kernels pad / fall back via their eligibility gates;
    nothing in the contract requires 481x321)."""
    from gabor_color_image_segmentation_tpu.models.pipeline import segment_image

    h, w = hw
    rgb, _ = synthetic_mosaic(h=h, w=w, n_regions=4, seed=3)
    labels, _ = segment_image(rgb, preset(preset_name))
    lab = np.asarray(labels)
    assert lab.shape == (h, w) and lab.dtype == np.int32
    k = preset(preset_name).graph.n_regions if preset(
        preset_name
    ).graph.enabled else preset(preset_name).cluster.k
    assert 0 <= lab.min() and lab.max() < k
