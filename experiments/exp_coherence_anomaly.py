"""Resolve the round-3 coherence anomaly (VERDICT r3 missing #5).

The round-3 ablation found color-only + coherence beating full + coherence
on the STANDARD split by a wide margin (PRI 0.9325/F 0.6250 vs
0.8402/0.2305) — i.e. adding the Gabor energy dims COSTS 0.09 PRI / 0.40 F
under the better weighting. Before coherence can be promoted (or rejected)
as the default cue rule, that needs an explanation and a rule that wins
both splits, or a documented reason none exists.

Hypotheses tested here:

  H1 (dilution): the energy block retains enough post-coherence total
     variance to out-vote the 3 color dims; the k=5 budget then splits on
     texture structure (incl. smoothed-energy halos at color edges) rather
     than color regions. Diagnosis: per-block coherence stats + post-weight
     variance shares.
  H2 (sharpening fixes it): coherence^p for p > 1 suppresses
     moderately-coherent-but-unhelpful dims harder than informative ones.
     On texture-only the color dims' low coherence dies faster (keeps that
     win); on the standard split the energy dims' lower-than-color
     coherence shrinks toward color-only behavior (captures that win).
  H3 (block renorm): preserving the static equal-total-variance cue
     balance AFTER coherence (coherence shapes only the within-block
     weights) — predicted to LOSE the texture-only win (the color block's
     total weight is restored), included as the control.

Variants (full feature set unless noted): static (p=0), coherence (p=1),
coherence^2, coherence^4, block-renormalized coherence; color-only with
static and coherence. Same images/seeds as exp_feature_ablation.py; the
clustering call mirrors the config0 pipeline (kmeans k=5, 25 iterations,
maximin init).

Run (CPU ok): PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_coherence_anomaly.py
"""

from __future__ import annotations

import numpy as np

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.config import ClusterConfig, preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics.boundary import fboundary_np
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models.kmeans import kmeans
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import (
    assemble_features,
    coherence_weights,
)
from gabor_color_image_segmentation_tpu.ops.modulated import gabor_energies_mod

N_IMAGES = 12
H, W = 161, 241
K = 5
N_ITER = 25


def make_split(texture_only: bool):
    imgs, gts = [], []
    for i in range(N_IMAGES):
        rgb, gt = synthetic_mosaic(
            h=H, w=W, n_regions=5, seed=3000 + i, texture_only=texture_only
        )
        imgs.append(rgb)
        gts.append(gt)
    return imgs, gts


@jax.jit
def base_feats(rgb):
    """(1,H,W,3) uint8 -> (1,H,W,E+3) statically-balanced standardized
    features (assemble_features with cue_weight='static') + raw coherence
    weights (1,1,1,D)."""
    cfg = preset("config0")
    bank = make_bank(cfg.bank)
    lab = _color_transform(rgb, cfg.color_space)
    energies = gabor_energies_mod(lab, bank, jnp.float32)
    feats = assemble_features(energies, lab, ClusterConfig())
    return feats, coherence_weights(feats)


def cluster(feats_np):
    labels, _ = kmeans(jnp.asarray(feats_np.reshape(-1, feats_np.shape[-1])),
                       K, N_ITER)
    return np.asarray(labels).reshape(H, W)


def main():
    print("backend:", jax.default_backend(), flush=True)
    e_dims = preset("config0").bank.n_kernels * 3  # energy block size

    for split_name, tex_only in (("color+texture", False),
                                 ("texture-only", True)):
        imgs, gts = make_split(tex_only)
        feats_all, w_all = [], []
        for rgb in imgs:
            f, w = base_feats(jnp.asarray(rgb)[None])
            feats_all.append(np.asarray(f)[0])
            w_all.append(np.asarray(w)[0, 0, 0])
        w_arr = np.stack(w_all)  # (N, D)
        we, wc = w_arr[:, :e_dims], w_arr[:, e_dims:]
        # post-weight total variance share: static feats have var ~1 per
        # energy dim and ~E/3 per color dim, so share_e = sum(c_e^2) /
        # (sum(c_e^2) + (E/3) * sum(c_c^2)) per image
        for p in (1, 2, 4):
            se = (we ** (2 * p)).sum(1)
            sc = (e_dims / 3.0) * (wc ** (2 * p)).sum(1)
            print(
                f"[{split_name}] p={p}: mean coherence e={we.mean():.3f} "
                f"c={wc.mean():.3f}; energy-block variance share "
                f"{np.mean(se / (se + sc)):.3f}",
                flush=True,
            )

        def run(label, weight_fn, color_only=False):
            pris, fs = [], []
            for f, w, gt in zip(feats_all, w_all, gts):
                ww = weight_fn(w)
                x = f * ww[None, None, :]
                if color_only:
                    x = x[..., e_dims:]
                lab = cluster(x)
                pris.append(pri_np(lab, [gt]))
                fs.append(fboundary_np(lab, [gt]))
            print(
                f"[{split_name}] {label:28s} PRI={np.mean(pris):.4f} "
                f"F={np.mean(fs):.4f}",
                flush=True,
            )

        def block_renorm(w):
            """coherence within blocks, static balance between blocks."""
            ww = w.copy()
            for sl in (slice(0, e_dims), slice(e_dims, None)):
                rms = np.sqrt(np.mean(ww[sl] ** 2)) + 1e-12
                ww[sl] = ww[sl] / rms
            return ww

        run("full static (p=0)", lambda w: np.ones_like(w))
        run("full coherence (p=1)", lambda w: w)
        run("full coherence^2", lambda w: w ** 2)
        run("full coherence^4", lambda w: w ** 4)
        run("full block-renorm coherence", block_renorm)
        run("color static", lambda w: np.ones_like(w), color_only=True)
        run("color coherence", lambda w: w, color_only=True)


if __name__ == "__main__":
    main()
