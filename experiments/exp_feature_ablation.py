"""Do the Gabor features earn their cost? (VERDICT r2 missing #4)

Measures mean PRI / boundary-F over {feature_set: color-only, full} x
{eval split: color+texture mosaics, texture-ONLY mosaics} with the
config0 pipeline (k-means k=5) on 12 seeded images per split. The
texture-only split gives every region the SAME base color — regions are
separable ONLY by texture orientation/frequency, so color-only features
must fail there while the full Gabor+color features succeed. On the
standard split the comparison shows how much of the default PRI the color
cue alone explains.

Also reports the "texture"-only feature set on both splits for
completeness. Results go into BASELINE.md's ablation table.

Run (CPU or TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_feature_ablation.py
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics.boundary import fboundary_np
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import segment_images
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

N_IMAGES = 12
H, W = 161, 241  # half BSDS: keeps the CPU fallback runnable too


def eval_config(cfg, images, gts):
    labels = np.asarray(segment_images(np.stack(images), cfg, make_bank(cfg.bank)))
    pris = [pri_np(labels[i], [gts[i]]) for i in range(len(images))]
    fs = [fboundary_np(labels[i], [gts[i]]) for i in range(len(images))]
    return float(np.mean(pris)), float(np.mean(fs))


def main():
    import jax

    print("backend:", jax.default_backend())
    splits = {}
    for name, tex_only in (("color+texture", False), ("texture-only", True)):
        imgs, gts = [], []
        for i in range(N_IMAGES):
            rgb, gt = synthetic_mosaic(
                h=H, w=W, n_regions=5, seed=3000 + i, texture_only=tex_only
            )
            imgs.append(rgb)
            gts.append(gt)
        splits[name] = (imgs, gts)

    base = preset("config0").replace(image_hw=(H, W))
    rows = []
    variants = [
        ("full", "static"), ("color", "static"), ("texture", "static"),
        ("full", "coherence"), ("color", "coherence"),
    ]
    for fset, cue in variants:
        cfg = base.replace(
            cluster=dataclasses.replace(
                base.cluster, feature_set=fset, cue_weight=cue
            )
        )
        for split, (imgs, gts) in splits.items():
            pri, f = eval_config(cfg, imgs, gts)
            rows.append((fset, cue, split, pri, f))
            print(
                f"feature_set={fset:8s} cue={cue:9s} split={split:14s} "
                f"PRI={pri:.4f} F={f:.4f}", flush=True,
            )
    print("\n| feature_set | cue_weight | split | mean PRI | mean F |")
    print("|---|---|---|---|---|")
    for fset, cue, split, pri, f in rows:
        print(f"| {fset} | {cue} | {split} | {pri:.4f} | {f:.4f} |")


if __name__ == "__main__":
    main()
