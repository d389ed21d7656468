"""Accuracy of the subspace-iteration eigensolver vs dense eigh on the
config3 n-cut, using STRUCTURED inputs (synthetic mosaics — the workload
shape), not random noise. Random images have near-degenerate eigengaps where
any solver's embedding is ill-conditioned; the decision to default the
matmul-only solver on TPU rides on structured-input agreement.

CPU-runnable. Prints per-image eigh-vs-subspace ARI and PRI-vs-goldenlabels.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import adjusted_rand_score

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.graph import (
    affinity_matrix,
    spectral_labels,
    superpixel_means,
)
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.models.slic import grid_shape, slic
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.color import rgb_to_lab


def main():
    cfg = preset("config3")
    g = cfg.graph
    bank = make_bank(cfg.bank)
    h, w = 161, 241  # small for CPU speed; same structure
    n_img = 6

    for i in range(n_img):
        rgb, _ = synthetic_mosaic(h=h, w=w, n_regions=5, seed=100 + i)
        rgbj = jnp.asarray(rgb)[None]
        feats = compute_features(rgbj, cfg, bank)[0]
        lab = rgb_to_lab(rgbj.astype(jnp.float32) / 255.0)[0]
        sp = slic(lab, g.n_superpixels, g.slic_compactness, g.slic_iters)
        gh, gw, _ = grid_shape(h, w, g.n_superpixels)
        n_sp = gh * gw
        d = feats.shape[-1]
        fm, cnts = superpixel_means(feats.reshape(-1, d), sp.reshape(-1), n_sp)
        aff = affinity_matrix(fm, g.affinity_sigma, cnts)
        le = np.asarray(spectral_labels(aff, g.n_regions, eig_method="eigh"))
        ls = np.asarray(spectral_labels(aff, g.n_regions, eig_method="subspace"))
        ari = adjusted_rand_score(le, ls)
        # pixel-level agreement too
        sp_np = np.asarray(sp).reshape(-1)
        pix_ari = adjusted_rand_score(le[sp_np], ls[sp_np])
        print(f"img {i}: sp-ARI {ari:.4f}  pixel-ARI {pix_ari:.4f}", flush=True)


if __name__ == "__main__":
    main()
