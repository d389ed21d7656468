"""color_weight sensitivity across splits (follow-up to exp_feature_ablation).

The ablation found the equal-total-variance color balance (color_weight=1)
drowns the Gabor energy signal on texture-only images: the color channels
carry the RAW texture oscillation (high variance, locally uninformative),
while the energies are its demodulated envelope. This sweeps color_weight
on both splits to find whether a default exists that keeps the standard
split's quality while letting the texture signal through.

Run: PYTHONPATH=/root/repo python experiments/exp_color_weight_sweep.py
"""

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
H, W = 161, 241


def eval_config(cfg, images, gts):
    labels = np.asarray(
        segment_images(np.stack(images), cfg, make_bank(cfg.bank))
    )
    pris = [pri_np(labels[i], [gts[i]]) for i in range(len(images))]
    fs = [fboundary_np(labels[i], [gts[i]]) for i in range(len(images))]
    return float(np.mean(pris)), float(np.mean(fs))


def main():
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
    print("| color_weight | split | mean PRI | mean F |")
    print("|---|---|---|---|")
    for cwt in (1.0, 0.6, 0.4, 0.25, 0.15):
        cfg = base.replace(
            cluster=dataclasses.replace(base.cluster, color_weight=cwt)
        )
        for split, (imgs, gts) in splits.items():
            pri, f = eval_config(cfg, imgs, gts)
            print(f"| {cwt} | {split} | {pri:.4f} | {f:.4f} |", flush=True)


if __name__ == "__main__":
    main()
