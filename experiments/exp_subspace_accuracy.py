"""Accuracy of the matmul-only subspace eigensolver vs dense eigh.

Validates two claims in models/graph.py:
  * spectral_labels(eig_method="subspace") agrees with "eigh" on
    production-shaped affinity matrices (structured synthetic eval);
  * chaining power_per_qr = 8 matmuls between QR re-orthogonalizations
    (the TPU-friendly schedule: QR is sequential Householder work, the
    (S, S) @ (S, m) products are pure MXU) does not change the labels
    vs power_per_qr = 1.

Affinities are built exactly as the config3 graph path does: synthetic
mosaics -> Lab -> features -> fused SLIC -> connectivity -> superpixel
means -> affinity_matrix. Run on CPU (deterministic, S = 384 is small):

    PYTHONPATH=/root/repo python experiments/exp_subspace_accuracy.py
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from sklearn.metrics import adjusted_rand_score

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.graph import (
    affinity_matrix,
    smallest_eigvecs_subspace,
    spectral_labels,
    superpixel_means,
)
from gabor_color_image_segmentation_tpu.models.kmeans import kmeans
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.models.slic import (
    enforce_connectivity_device,
    grid_shape,
)
from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import gabor_features


def subspace_labels(aff, n_regions, p):
    """spectral_labels body with an explicit power_per_qr."""
    s = aff.shape[0]
    deg = jnp.sum(aff, axis=1)
    d_isqrt = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
    l_sym = jnp.eye(s) - d_isqrt[:, None] * aff * d_isqrt[None, :]
    emb = smallest_eigvecs_subspace(l_sym, n_regions, power_per_qr=p)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(emb * emb, axis=1, keepdims=True), 1e-12))
    labels, _ = kmeans(emb / norm, n_regions, 30)
    return np.asarray(labels)


def main():
    cfg = preset("config3")
    g = cfg.graph
    h, w = 321, 481
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    n_sp = gh * gw

    aris = {1: [], 8: []}
    identical = 0
    n_img = 8
    for i in range(n_img):
        rgb, _ = synthetic_mosaic(h, w, n_regions=5, seed=50 + i)
        rgb = jnp.asarray(rgb)[None]
        lab = _color_transform(rgb, cfg.color_space)
        sp = slic_fused(lab, g.n_superpixels, g.slic_compactness, g.slic_iters)
        sp = enforce_connectivity_device(sp, n_sp)
        feats = gabor_features(lab, make_bank(cfg.bank), cfg.cluster)
        d = feats.shape[-1]
        means, cnts = superpixel_means(
            feats[0].reshape(-1, d), sp[0].reshape(-1), n_sp
        )
        aff = affinity_matrix(means, g.affinity_sigma, cnts)

        ref = np.asarray(spectral_labels(aff, g.n_regions, eig_method="eigh"))
        outs = {p: subspace_labels(aff, g.n_regions, p) for p in (1, 8)}
        for p in (1, 8):
            aris[p].append(adjusted_rand_score(ref, outs[p]))
        identical += int(np.array_equal(outs[1], outs[8]))

    for p in (1, 8):
        a = np.array(aris[p])
        print(f"p={p}  vs eigh: ARI mean {a.mean():.4f} min {a.min():.4f}")
    print(f"p=8  vs p=1 : labels identical on {identical}/{n_img} images")


if __name__ == "__main__":
    main()
