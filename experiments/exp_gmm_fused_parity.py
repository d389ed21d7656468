"""Which GMM path diverges on TPU: XLA, fused kernel, or both? (vs f64 golden)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_fused_parity.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import gabor_color_image_segmentation_tpu as gcis
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.models.gmm import gmm_predict
from gabor_color_image_segmentation_tpu.models.gmm_pallas import gmm_fused_t
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.utils.labels import align_labels
from golden.cluster import gmm_golden


def agree(a, b):
    al = align_labels(np.asarray(a).ravel(), np.asarray(b).ravel())
    return float((al == np.asarray(b).ravel()).mean())


def main():
    cfg = gcis.preset("config2")
    bank = make_bank(cfg.bank)
    rgb, _ = synthetic_mosaic(h=120, w=160, n_regions=5, seed=70)
    feats = np.asarray(compute_features(rgb[None].astype(np.float32) if rgb.dtype != np.uint8 else rgb[None], cfg, bank))[0]
    h, w, d = feats.shape
    x = feats.reshape(-1, d).astype(np.float32)
    print("feats", x.shape, "backend", jax.default_backend(), flush=True)

    for tol, n_iter in [(1e-3, 30), (0.0, 30)]:
        gold, _, _ = gmm_golden(x, 5, n_iter, reg_covar=cfg.cluster.gmm_reg_covar,
                             tol=tol)
        l_xla = np.asarray(gmm_predict(jnp.asarray(x), 5, n_iter,
                                       cfg.cluster.gmm_reg_covar, 1, tol))
        l_fused = np.asarray(gmm_fused_t(jnp.asarray(x), 5, n_iter,
                                         cfg.cluster.gmm_reg_covar, 10, tol))
        print(f"tol={tol}: xla-vs-gold {agree(l_xla, gold):.4f}  "
              f"fused-vs-gold {agree(l_fused, gold):.4f}  "
              f"xla-vs-fused {agree(l_xla, l_fused):.4f}", flush=True)

    # production config2 schedule (pooled fit + refine): golden mirrors the
    # schedule, so agreement must hold at the same >=0.999 bar on the
    # EM-sensitive image
    fp, ri = cfg.cluster.gmm_fit_pool, cfg.cluster.gmm_refine_iters
    gold, _, _ = gmm_golden(x, 5, 30, reg_covar=cfg.cluster.gmm_reg_covar,
                            tol=1e-3, hw=(h, w), fit_pool=fp,
                            refine_iters=ri)
    l_fused = np.asarray(gmm_fused_t(jnp.asarray(x), 5, 30,
                                     cfg.cluster.gmm_reg_covar, 10, 1e-3,
                                     (h, w), fp, ri))
    print(f"fit_pool={fp} refine={ri}: fused-vs-gold "
          f"{agree(l_fused, gold):.4f}", flush=True)


if __name__ == "__main__":
    main()
