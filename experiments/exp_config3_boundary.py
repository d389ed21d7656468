"""Diagnose config3's boundary-F deficit vs config0 (VERDICT r4 missing #1).

On the round-4 multi-GT eval, config3 (SLIC + n-cut — the pipeline's
designed remedy for boundary quality) scores mean F 0.2475 vs config0's
0.4137. This experiment decomposes the chain on the same test split to
locate the loss:

  A. Production config0 / config3: P, R, F + boundary density — which side
     of the F is collapsing, precision (too many wrong boundaries) or
     recall (too few)?
  B. Stage ceilings, per image:
       - SLIC-as-prediction: the enforced superpixel map itself. Any
         merged prediction's boundary set is a SUBSET of the SLIC boundary
         set, so merged recall <= SLIC recall — the recall ceiling of the
         whole downstream stage.
       - ORACLE merge: each superpixel relabeled with its majority GT id
         (per GT variant, scored against that variant; plus the exact-GT
         oracle under the full multi-GT protocol). The best ANY
         affinity/cut could do with these superpixels. Oracle >> ncut
         blames the merge (affinity/spectral); oracle ~ ncut blames the
         superpixels themselves.
  C. n_regions sweep at the production affinity (median heuristic).
  D. Affinity sigma probe. Connectivity enforcement kills most of the 384
     grid cells on these mosaics (alive counts recorded); the production
     median heuristic takes median(d2) over the FULL matrix INCLUDING dead
     rows — dead-dead pairs contribute exact zeros and dead-alive pairs
     contribute raw ||f||^2 masses, so sigma^2 is not an alive-pair
     statistic at all. A/B: full-median vs alive-only median, x {1/4, 1/2,
     1, 2, 4} scale, at n_regions=5; plus the two medians' raw values.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_boundary.py
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
from gabor_color_image_segmentation_tpu.models import graph as G
from gabor_color_image_segmentation_tpu.models.pipeline import (
    compute_energies,
    segment_images,
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
GH, GW, _ = grid_shape(H, W, CFG.graph.n_superpixels)
N_SP = GH * GW


@jax.jit
def stages(rgbs):
    """(B,H,W,3) -> (sp enforced, (B,S,D) means, (B,S) counts)."""
    energies, color = compute_energies(rgbs, CFG, BANK)
    lab = color  # config3 color_space == "lab"
    feats = assemble_features(energies, color, CFG.cluster)
    slic_impl, _ = G.resolve_graph_impls(CFG.graph, CFG.dtype)
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch

    sp = slic_batch(
        lab, CFG.graph.n_superpixels, CFG.graph.slic_compactness,
        CFG.graph.slic_iters, slic_impl,
    )
    if jax.default_backend() == "tpu":
        from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
            enforce_connectivity_fused,
        )

        sp = enforce_connectivity_fused(sp, N_SP)
    else:
        from gabor_color_image_segmentation_tpu.models.slic import (
            enforce_connectivity_device,
        )

        sp = enforce_connectivity_device(sp, N_SP)

    def mom(f, s):
        return G.superpixel_means(
            f.reshape(-1, f.shape[-1]), s.reshape(-1), N_SP
        )

    means, cnts = jax.vmap(mom)(feats, sp)
    return sp, means, cnts


@functools.partial(jax.jit, static_argnames=("n_regions", "sigma_mode"))
def cut_pixels(means, cnts, sp, sigma_scale, n_regions, sigma_mode):
    """One image: (S,D) means -> (H,W) region labels under a sigma variant.

    sigma_mode "full" = production median over the whole d2 matrix;
    "alive"  = median over alive-alive pairs only. Spectral stage is the
    production one (subspace on TPU via eig_method='auto')."""
    f = means.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    sq = jnp.sum(f * f, axis=1)
    d2 = sq[:, None] - 2.0 * jnp.dot(
        f, f.T, preferred_element_type=jnp.float32, precision=hi
    ) + sq
    d2 = jnp.maximum(d2, 0.0)
    alive = cnts > 0
    if sigma_mode == "full":
        s2 = jnp.maximum(jnp.median(d2), 1e-12)
    else:
        pair = alive[:, None] & alive[None, :]
        s2 = jnp.maximum(
            jnp.nanmedian(jnp.where(pair, d2, jnp.nan)), 1e-12
        )
    w = jnp.exp(-d2 / (s2 * sigma_scale))
    av = alive.astype(w.dtype)
    w = w * av[:, None] * av[None, :]
    regions = G.spectral_labels(w, n_regions, eig_method="auto")
    return regions[sp.reshape(-1)].reshape(sp.shape).astype(jnp.int32)


def medians_np(means, cnts):
    f = means.astype(np.float64)
    d2 = np.maximum(
        (f * f).sum(1)[:, None] - 2 * f @ f.T + (f * f).sum(1)[None], 0.0
    )
    alive = cnts > 0
    return float(np.median(d2)), float(np.median(d2[alive][:, alive]))


def oracle_merge(sp, gt, n_sp):
    """Majority-GT relabel of each superpixel."""
    k = int(gt.max()) + 1
    votes = np.bincount(
        (sp.astype(np.int64) * k + gt).ravel(), minlength=n_sp * k
    ).reshape(n_sp, k)
    return votes.argmax(1)[sp]


def prf(pred, gts):
    p, r, f = fboundary_np(pred, gts)
    return p, r, f


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    ds = list(synthetic_dataset(N_IMAGES, h=H, w=W, seed=2000))
    rgbs = np.stack([d[1] for d in ds])
    gts = [d[2] for d in ds]

    cfg0 = preset("config0")
    l0 = np.asarray(segment_images(rgbs, cfg0, make_bank(cfg0.bank)))
    l3 = np.asarray(segment_images(rgbs, CFG, BANK))
    sp, means, cnts = stages(rgbs)
    sp, means, cnts = np.asarray(sp), np.asarray(means), np.asarray(cnts)

    # ---- A + B: per-image decomposition ------------------------------
    rows = []
    for i in range(N_IMAGES):
        a = dict(alive=int((cnts[i] > 0).sum()))
        a["config0"] = prf(l0[i], gts[i])
        a["config3"] = prf(l3[i], gts[i])
        a["slic"] = prf(sp[i], gts[i])
        a["oracle_exact"] = prf(
            oracle_merge(sp[i], gts[i][0], N_SP), gts[i]
        )
        per_gt = [
            prf(oracle_merge(sp[i], g, N_SP), [g])[2] for g in gts[i]
        ]
        a["oracle_per_gt_f"] = float(np.mean(per_gt))
        a["dens"] = {
            "gt0": float(boundaries_np(gts[i][0]).mean()),
            "config0": float(boundaries_np(l0[i]).mean()),
            "config3": float(boundaries_np(l3[i]).mean()),
        }
        a["med_full"], a["med_alive"] = medians_np(means[i], cnts[i])
        rows.append(a)
        print(f"img {i}: alive={a['alive']}  "
              f"c0 F={a['config0'][2]:.3f} c3 F={a['config3'][2]:.3f} "
              f"slic R={a['slic'][1]:.3f} oracleF={a['oracle_exact'][2]:.3f} "
              f"med full/alive={a['med_full']:.1f}/{a['med_alive']:.1f}",
              flush=True)

    def agg(key):
        v = np.array([r[key] for r in rows])
        return v.mean(0)

    print("\n=== A/B decomposition (mean over images) ===")
    for key in ("config0", "config3", "slic", "oracle_exact"):
        p, r, f = agg(key)
        print(f"{key:>14}: P={p:.4f} R={r:.4f} F={f:.4f}")
    print(f"oracle per-GT mean F: "
          f"{np.mean([r['oracle_per_gt_f'] for r in rows]):.4f}")
    print("alive superpixels:",
          [r["alive"] for r in rows], "/", N_SP)
    print("boundary density gt0/c0/c3:",
          np.mean([r['dens']['gt0'] for r in rows]),
          np.mean([r['dens']['config0'] for r in rows]),
          np.mean([r['dens']['config3'] for r in rows]))
    print("median d2 full vs alive-only:",
          np.mean([r["med_full"] for r in rows]),
          np.mean([r["med_alive"] for r in rows]))

    # ---- C: n_regions sweep (production sigma) -----------------------
    print("\n=== C: n_regions sweep, production (full-median) sigma ===")
    for nr in (3, 5, 8, 12, 16, 24):
        fs, ps, rs_ = [], [], []
        for i in range(N_IMAGES):
            lab = np.asarray(cut_pixels(
                jnp.asarray(means[i]), jnp.asarray(cnts[i]),
                jnp.asarray(sp[i]), 1.0, nr, "full"))
            p, r, f = prf(lab, gts[i])
            ps.append(p); rs_.append(r); fs.append(f)
        print(f"n_regions={nr:3d}: P={np.mean(ps):.4f} R={np.mean(rs_):.4f} "
              f"F={np.mean(fs):.4f}", flush=True)

    # ---- D: sigma mode x scale at n_regions=5 -------------------------
    print("\n=== D: sigma probe at n_regions=5 ===")
    for mode in ("full", "alive"):
        for scale in (0.25, 0.5, 1.0, 2.0, 4.0):
            fs = []
            for i in range(N_IMAGES):
                lab = np.asarray(cut_pixels(
                    jnp.asarray(means[i]), jnp.asarray(cnts[i]),
                    jnp.asarray(sp[i]), scale, 5, mode))
                fs.append(prf(lab, gts[i])[2])
            print(f"sigma={mode:5s} x{scale:<4}: F={np.mean(fs):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
