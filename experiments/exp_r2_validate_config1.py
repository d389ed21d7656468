"""config1 validation after the 4x4-warmup + grouped-path rework (round 2).

Checks, on the real TPU:
  1. production fast path (CHW grouped, coarse_levels=2) vs the regular
     NHWC path running the identical schedule — expect ~1.0 agreement
  2. fast path vs the GOLDEN multigrid mirror (pool2x2 twice) on golden
     features — expect >= 0.999 after permutation alignment (bf16 AND f32)
  3. PRI vs ground truth for both paths (quality guard vs the recorded
     0.690 synthetic-eval mean)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_r2_validate_config1.py
"""

import numpy as np

import gabor_color_image_segmentation_tpu as gcis
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _segment_batch_transposed,
    segment_batch,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def agreement(a, b):
    a = align_labels(np.asarray(a).reshape(-1), np.asarray(b).reshape(-1))
    return (a == np.asarray(b).reshape(-1)).mean()


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    seeds = [11, 12, 13]
    imgs, gts = [], []
    for s in seeds:
        rgb, gt = synthetic_mosaic(h=321, w=481, n_regions=5, seed=s)
        imgs.append(rgb)
        gts.append(gt)
    batch = np.stack(imgs)
    h, w = batch.shape[1:3]

    for dt in ("bfloat16", "float32"):
        cfg = gcis.preset("config1").replace(batch_size=len(seeds), dtype=dt)
        bank = make_bank(cfg.bank)
        fast = np.asarray(_segment_batch_transposed(batch, cfg, bank))
        reg, _ = segment_batch(batch, cfg, bank, False)
        reg = np.asarray(reg)
        for i, s in enumerate(seeds):
            ag = agreement(fast[i], reg[i])
            print(
                f"{dt} seed {s}: fast-vs-regular {ag:.4f} "
                f"PRI fast {pri_np(fast[i], [gts[i]]):.4f} "
                f"reg {pri_np(reg[i], [gts[i]]):.4f}",
                flush=True,
            )

    # golden mirror (fp32 features, identical schedule incl. levels=2)
    from golden.cluster import kmeans_golden_multigrid
    from golden.features import features_golden

    cfg = gcis.preset("config1").replace(batch_size=len(seeds))
    cc = cfg.cluster
    bank = make_bank(cfg.bank)
    fast_b = np.asarray(
        _segment_batch_transposed(batch, cfg.replace(dtype="bfloat16"), bank)
    )
    fast_f = np.asarray(
        _segment_batch_transposed(batch, cfg.replace(dtype="float32"), bank)
    )
    for i, s in enumerate(seeds):
        feats = features_golden(imgs[i], cfg.bank, cc)
        gold, _ = kmeans_golden_multigrid(
            feats.reshape(-1, feats.shape[-1]), cc.k, (h, w),
            cc.coarse_iters, cc.refine_iters, cc.coarse_levels,
            cc.mid_iters,
        )
        print(
            f"golden seed {s}: bf16 {agreement(fast_b[i], gold):.4f} "
            f"f32 {agreement(fast_f[i], gold):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
