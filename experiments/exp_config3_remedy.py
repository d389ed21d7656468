"""config3 boundary-F remedy sweep (VERDICT r4 missing #1, phase 2).

exp_config3_boundary.py located the deficit in two stacked causes:

  1. The merge loses ~0.13 F to the affinity bandwidth: the median
     heuristic's sigma^2 = median(d2) is ~4x too soft — scaling it by
     0.25 moves F 0.238 -> 0.337 (production n_regions=5). The dead-node
     skew of the median is NOT the mechanism (alive-only median ~= full
     at every scale).
  2. The superpixel stage caps the chain: the ORACLE merge of the
     enforced 400-cell superpixels only reaches F 0.370 < config0's
     0.407 — no merge, however good, can beat config0 with these
     superpixels.

This sweep finds a production remedy:
  A. superpixel geometry: n_superpixels x compactness -> oracle ceiling,
     SLIC recall, alive counts (does a finer/looser grid raise the cap?).
  B. merge at the improved geometry: sigma_scale x n_regions -> P/R/F +
     PRI (config3 currently has the BEST PRI, 0.7228 — the remedy must
     not spend it).
  C. region-level connectivity cleanup probe (host numpy): n-cut regions
     are spatially fragmented (boundary density 0.031 vs GT 0.011 — the
     precision sink); absorbing small connected components into their
     largest neighbor directly tests how much of the precision loss is
     fragment speckle.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_remedy.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_dataset
from gabor_color_image_segmentation_tpu.metrics.boundary import (
    boundaries_np,
    fboundary_np,
)
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models import graph as G
from gabor_color_image_segmentation_tpu.models.pipeline import (
    compute_energies,
)
from gabor_color_image_segmentation_tpu.models.slic import grid_shape
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import assemble_features
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

N_IMAGES = 12
H, W = 321, 481

CFG = preset("config3")
BANK = make_bank(CFG.bank)


@functools.partial(jax.jit, static_argnames=("n_sp_target", "compactness"))
def stages(rgbs, n_sp_target, compactness):
    energies, color = compute_energies(rgbs, CFG, BANK)
    lab = color
    feats = assemble_features(energies, color, CFG.cluster)
    slic_impl, _ = G.resolve_graph_impls(CFG.graph, CFG.dtype)
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch

    gh, gw, _ = grid_shape(H, W, n_sp_target)
    n_sp = gh * gw
    sp = slic_batch(
        lab, n_sp_target, compactness, CFG.graph.slic_iters, slic_impl
    )
    if jax.default_backend() == "tpu":
        from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
            enforce_connectivity_fused,
        )

        sp = enforce_connectivity_fused(sp, n_sp)
    else:
        from gabor_color_image_segmentation_tpu.models.slic import (
            enforce_connectivity_device,
        )

        sp = enforce_connectivity_device(sp, n_sp)

    def mom(f, s):
        return G.superpixel_means(
            f.reshape(-1, f.shape[-1]), s.reshape(-1), n_sp
        )

    means, cnts = jax.vmap(mom)(feats, sp)
    return sp, means, cnts


@functools.partial(jax.jit, static_argnames=("n_regions",))
def cut_pixels(means, cnts, sp, sigma_scale, n_regions):
    f = means.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    sq = jnp.sum(f * f, axis=1)
    d2 = sq[:, None] - 2.0 * jnp.dot(
        f, f.T, preferred_element_type=jnp.float32, precision=hi
    ) + sq
    d2 = jnp.maximum(d2, 0.0)
    alive = cnts > 0
    s2 = jnp.maximum(jnp.median(d2), 1e-12)
    w = jnp.exp(-d2 / (s2 * sigma_scale))
    av = alive.astype(w.dtype)
    w = w * av[:, None] * av[None, :]
    regions = G.spectral_labels(w, n_regions, eig_method="auto")
    return regions[sp.reshape(-1)].reshape(sp.shape).astype(jnp.int32)


def oracle_merge(sp, gt, n_sp):
    k = int(gt.max()) + 1
    votes = np.bincount(
        (sp.astype(np.int64) * k + gt).ravel(), minlength=n_sp * k
    ).reshape(n_sp, k)
    return votes.argmax(1)[sp]


def absorb_small_components(labels, min_frac=0.005):
    """Relabel 4-connected components; absorb those below min_frac of the
    image into their most-frequent neighboring component."""
    from scipy import ndimage

    h, w = labels.shape
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    comp = np.zeros((h, w), np.int64)
    n = 0
    for v in np.unique(labels):
        cc, k = ndimage.label(labels == v, structure=structure)
        comp[labels == v] = cc[labels == v] + n
        n += k
    comp -= 1  # 0-based
    sizes = np.bincount(comp.ravel(), minlength=n)
    small = sizes < (min_frac * h * w)
    out = labels.copy()
    # iterate: absorb smallest-first into the largest touching neighbor
    order = np.argsort(sizes)
    for c in order:
        if not small[c]:
            continue
        m = comp == c
        dil = ndimage.binary_dilation(m, structure=structure) & ~m
        if not dil.any():
            continue
        neigh = comp[dil]
        # largest neighboring component wins
        best = neigh[np.argmax(sizes[neigh])]
        out[m] = out[comp == best][0] if (comp == best).any() else out[m]
        comp[m] = best
        sizes[best] += sizes[c]
    return out


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    ds = list(synthetic_dataset(N_IMAGES, h=H, w=W, seed=2000))
    rgbs = np.stack([d[1] for d in ds])
    gts = [d[2] for d in ds]

    # ---- A: superpixel geometry vs oracle ceiling ---------------------
    print("\n=== A: superpixel geometry -> oracle ceiling ===")
    cache = {}
    for n_t in (400, 600, 900):
        for comp in (5.0, 10.0, 20.0):
            gh, gw, _ = grid_shape(H, W, n_t)
            n_sp = gh * gw
            sp, means, cnts = stages(rgbs, n_t, comp)
            sp = np.asarray(sp)
            cache[(n_t, comp)] = (sp, np.asarray(means), np.asarray(cnts),
                                  n_sp)
            of, orc, slr, alive = [], [], [], []
            for i in range(N_IMAGES):
                om = oracle_merge(sp[i], gts[i][0], n_sp)
                p, r, f = fboundary_np(om, gts[i])
                of.append(f); orc.append(r)
                slr.append(fboundary_np(sp[i], gts[i])[1])
                alive.append(int((cnts[i] > 0).sum()))
            print(f"n_sp={n_t:4d} comp={comp:4.0f}: oracle F={np.mean(of):.4f} "
                  f"R={np.mean(orc):.4f} slicR={np.mean(slr):.4f} "
                  f"alive~{np.mean(alive):.0f}/{n_sp}", flush=True)

    # ---- B: merge sweep at selected geometries ------------------------
    print("\n=== B: sigma_scale x n_regions (F / PRI / density) ===")
    for key in ((400, 10.0), (900, 5.0), (900, 10.0)):
        sp, means, cnts, n_sp = cache[key]
        for scale in (0.05, 0.1, 0.25, 0.5):
            for nr in (3, 5, 8):
                fs, pris, dens = [], [], []
                for i in range(N_IMAGES):
                    lab = np.asarray(cut_pixels(
                        jnp.asarray(means[i]), jnp.asarray(cnts[i]),
                        jnp.asarray(sp[i]), scale, nr))
                    fs.append(fboundary_np(lab, gts[i])[2])
                    pris.append(pri_np(lab, gts[i]))
                    dens.append(boundaries_np(lab).mean())
                print(f"  {key} s={scale:<5} nr={nr}: F={np.mean(fs):.4f} "
                      f"PRI={np.mean(pris):.4f} dens={np.mean(dens):.4f}",
                      flush=True)

    # ---- C: region-level cleanup probe --------------------------------
    print("\n=== C: small-component absorption on the cut output ===")
    for key, scale, nr in (((400, 10.0), 1.0, 5), ((400, 10.0), 0.25, 5),
                           ((900, 10.0), 0.25, 5)):
        sp, means, cnts, n_sp = cache[key]
        f0, f1, pri1 = [], [], []
        for i in range(N_IMAGES):
            lab = np.asarray(cut_pixels(
                jnp.asarray(means[i]), jnp.asarray(cnts[i]),
                jnp.asarray(sp[i]), scale, nr))
            clean = absorb_small_components(lab)
            f0.append(fboundary_np(lab, gts[i])[2])
            f1.append(fboundary_np(clean, gts[i])[2])
            pri1.append(pri_np(clean, gts[i]))
        print(f"  {key} s={scale} nr={nr}: F {np.mean(f0):.4f} -> "
              f"{np.mean(f1):.4f} (PRI after {np.mean(pri1):.4f})",
              flush=True)


if __name__ == "__main__":
    main()
