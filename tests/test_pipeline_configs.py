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
    cfg = cfg.replace(graph=dataclasses.replace(cfg.graph, n_superpixels=64, n_regions=4))
    labels, _ = segment_batch(imgs, cfg, make_bank(cfg.bank))
    labels = np.asarray(labels)
    assert labels.shape == imgs.shape[:3]
    assert labels.max() < cfg.graph.n_regions
    pris = [pri_np(labels[i], [gts[i]]) for i in range(2)]
    assert min(pris) > 0.8, pris


def test_mincut_variant(batch2):
    imgs, gts = batch2
    cfg = preset("config3").replace(batch_size=2)
    cfg = cfg.replace(
        graph=GraphConfig(
            enabled=True, n_superpixels=64, cut="mincut", mincut_k=50.0, mincut_min_size=2
        )
    )
    labels = np.asarray(segment_images(imgs, cfg))
    assert labels.shape == imgs.shape[:3]
    pris = [pri_np(labels[i], [gts[i]]) for i in range(2)]
    assert min(pris) > 0.75, pris
