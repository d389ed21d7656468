"""config2 (GMM) TPU-vs-golden label agreement on a full-size mosaic —
the one parity number not yet measured on-chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config2_parity.py
"""

import numpy as np

import gabor_color_image_segmentation_tpu as gcis
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import segment_image
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    rgb, gt = synthetic_mosaic(h=321, w=481, n_regions=5, seed=11)
    cfg = gcis.preset("config2")

    for dt in ("float32", "bfloat16"):
        labels, _ = segment_image(rgb, cfg.replace(dtype=dt))
        l_np = np.asarray(labels)
        print(f"config2 {dt}: ids {np.unique(l_np)} PRI {pri_np(l_np, [gt]):.4f}",
              flush=True)

    from golden.cluster import gmm_golden
    from golden.features import features_golden

    print("running golden GMM (f64 host, ~minutes)...", flush=True)
    feats_g = features_golden(rgb, cfg.bank, cfg.cluster)
    h, w, d = feats_g.shape
    gold, _, _ = gmm_golden(
        feats_g.reshape(-1, d), cfg.cluster.k, cfg.cluster.n_iter,
        cfg.cluster.gmm_reg_covar, cfg.cluster.gmm_tol,
    )
    gold = gold.reshape(h, w)
    for dt in ("float32", "bfloat16"):
        labels, _ = segment_image(rgb, cfg.replace(dtype=dt))
        a = align_labels(np.asarray(labels).reshape(-1), gold.reshape(-1))
        print(
            f"config2 {dt} vs golden agreement: {(a == gold.reshape(-1)).mean():.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
