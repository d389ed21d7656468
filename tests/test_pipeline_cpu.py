"""Integration test — BASELINE config 0 on the CPU backend (SURVEY.md §4.3):
full pipeline on a synthetic mosaic, golden parity + PRI quality floor."""

import numpy as np
import pytest

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import segment_image
from gabor_color_image_segmentation_tpu.utils.labels import align_labels
from golden.cluster import kmeans_golden
from golden.features import features_golden


@pytest.fixture(scope="module")
def cfg():
    # config0 shrunk spatially for CPU-test speed; same bank/cluster params
    return preset("config0")


def test_config0_end_to_end(small_mosaic, cfg):
    rgb, gt = small_mosaic
    labels, feats = segment_image(rgb, cfg)
    labels = np.asarray(labels)
    assert labels.shape == rgb.shape[:2]
    assert labels.dtype == np.int32
    assert 0 <= labels.min() and labels.max() < cfg.cluster.k
    # the mosaic has 4 well-separated regions; k=5 clustering must score high
    pri = pri_np(labels, [gt])
    assert pri > 0.85, f"PRI {pri}"


def test_config0_color_weighted_quality(small_mosaic, cfg):
    """On a color-dominant mosaic, upweighting color must segment ~perfectly."""
    import dataclasses

    rgb, gt = small_mosaic
    c = cfg.replace(cluster=dataclasses.replace(cfg.cluster, color_weight=2.0))
    labels, _ = segment_image(rgb, c)
    pri = pri_np(np.asarray(labels), [gt])
    assert pri > 0.95, f"PRI {pri}"


def test_config0_matches_golden(small_mosaic, cfg):
    rgb, _ = small_mosaic
    labels, _ = segment_image(rgb, cfg)
    labels = np.asarray(labels)

    gold_feats = features_golden(rgb, cfg.bank, cfg.cluster)
    h, w, d = gold_feats.shape
    gold_labels, _ = kmeans_golden(
        gold_feats.reshape(-1, d),
        cfg.cluster.k,
        cfg.cluster.n_iter,
        cfg.cluster.init_stride,
    )
    gold_labels = gold_labels.reshape(h, w)

    aligned = align_labels(labels, gold_labels)
    agree = (aligned == gold_labels).mean()
    assert agree > 0.99, f"golden label agreement {agree}"
