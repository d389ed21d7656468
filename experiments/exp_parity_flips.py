"""Root-cause the residual fp32 label flips vs golden (VERDICT round-1 #4).

north_star asks for "bitwise-comparable label maps"; fp32 config0/1 measure
99.96-99.99% post-alignment agreement. This experiment decomposes every
residual flip into one of three measured sources:

  S1  feature delta    — TPU fp32 features vs golden f32 features differ by
                         reduction order (MXU HIGHEST dot vs numpy sums,
                         fused FMA transcendentals). Measured: max |df|.
  S2  solver cascade   — running the GOLDEN solver on TPU features vs golden
                         features: any label diff here is S1 amplified
                         through Lloyd's discrete dynamics (center drift
                         compounds across iterations near basin boundaries).
  S3  solver kernel    — TPU labels vs golden solver ON THE SAME TPU
                         features: flips attributable to the fused kernel's
                         own reduction order / tie handling alone.

For S3 flips we print the golden-score margin of each flipped pixel:
|d(best) - d(second)| relative to the score scale — a flip is "borderline"
iff its margin is within the propagated feature/score error.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_parity_flips.py
"""

import numpy as np

import gabor_color_image_segmentation_tpu as gcis
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def agreement(a, b):
    aa = align_labels(np.asarray(a).reshape(-1), np.asarray(b).reshape(-1))
    return (aa == np.asarray(b).reshape(-1)).mean()


def margins(x, centers, labels_a, labels_b, flip_mask):
    """Relative golden-score margin between the two disputed centers at each
    flipped pixel."""
    cs = (centers**2).sum(axis=1)
    d = cs[None, :] - 2.0 * (x @ centers.T)  # (N, k) golden score form
    idx = np.nonzero(flip_mask)[0]
    da = d[idx, labels_a[idx]]
    db = d[idx, labels_b[idx]]
    scale = np.abs(d[idx]).max(axis=1) + 1e-30
    return np.abs(da - db) / scale


def run_config(name: str, seeds=(11, 12, 13)):
    import jax

    from gabor_color_image_segmentation_tpu.models.pipeline import (
        segment_image,
    )
    from golden.cluster import kmeans_golden, kmeans_golden_multigrid
    from golden.features import features_golden

    cfg = gcis.preset(name).replace(dtype="float32")
    cc = cfg.cluster
    multigrid = cc.coarse_iters > 0
    print(f"\n=== {name} fp32 (multigrid={multigrid}) ===", flush=True)
    tot = {"n": 0, "s2": 0, "s3": 0, "e2e": 0}
    worst_margin = 0.0
    for seed in seeds:
        rgb, _ = synthetic_mosaic(h=321, w=481, n_regions=5, seed=seed)
        h, w = rgb.shape[:2]

        labels_tpu, feats_tpu = segment_image(rgb, cfg)
        labels_tpu = np.asarray(labels_tpu).reshape(-1)
        x_tpu = np.asarray(feats_tpu).reshape(h * w, -1).astype(np.float32)

        feats_g = features_golden(rgb, cfg.bank, cc)
        x_g = feats_g.reshape(h * w, -1).astype(np.float32)

        def solve(x):
            if multigrid:
                return kmeans_golden_multigrid(
                    x, cc.k, (h, w), cc.coarse_iters, cc.refine_iters,
                    cc.coarse_levels, cc.mid_iters,
                )
            return kmeans_golden(x, cc.k, cc.n_iter)

        gold_on_gold, cen_gg = solve(x_g)
        gold_on_tpu, cen_gt = solve(x_tpu)

        df = np.abs(x_tpu - x_g)
        s1 = df.max()
        dq = np.quantile(df, [0.5, 0.99, 0.9999])
        flips_s2 = (
            align_labels(gold_on_tpu, gold_on_gold) != gold_on_gold
        )
        flips_s3 = (
            align_labels(labels_tpu, gold_on_tpu) != gold_on_tpu
        )
        flips_e2e = (
            align_labels(labels_tpu, gold_on_gold) != gold_on_gold
        )
        n = h * w
        tot["n"] += n
        tot["s2"] += int(flips_s2.sum())
        tot["s3"] += int(flips_s3.sum())
        tot["e2e"] += int(flips_e2e.sum())
        m3 = (
            margins(x_tpu, cen_gt, align_labels(labels_tpu, gold_on_tpu),
                    gold_on_tpu, flips_s3)
            if flips_s3.any() else np.zeros(0)
        )
        if m3.size:
            worst_margin = max(worst_margin, float(m3.max()))
        # borderline-ness of the cascade flips: their relative score margin
        # in the GOLDEN solution vs the whole-image margin distribution
        cs = (cen_gg**2).sum(axis=1)
        dall = cs[None, :] - 2.0 * (x_g @ cen_gg.T)
        part = np.partition(dall, 1, axis=1)
        pop_margin = (part[:, 1] - part[:, 0]) / (
            np.abs(dall).max(axis=1) + 1e-30
        )
        m2 = (
            margins(x_g, cen_gg, align_labels(gold_on_tpu, gold_on_gold),
                    gold_on_gold, flips_s2)
            if flips_s2.any() else np.zeros(0)
        )
        print(
            f"seed {seed}: S1 max|df|={s1:.3e} "
            f"q50/q99/q99.99={dq[0]:.1e}/{dq[1]:.1e}/{dq[2]:.1e}  "
            f"S2 cascade flips={int(flips_s2.sum())} ({flips_s2.mean():.2e})"
            f" flip-margin max={m2.max() if m2.size else 0:.2e}"
            f" vs population median margin={np.median(pop_margin):.2e}  "
            f"S3 kernel flips={int(flips_s3.sum())} ({flips_s3.mean():.2e})"
            f" worst S3 rel margin={m3.max() if m3.size else 0:.3e}  "
            f"e2e flips={int(flips_e2e.sum())} ({flips_e2e.mean():.2e})",
            flush=True,
        )
    print(
        f"{name} totals: e2e flip rate {tot['e2e']/tot['n']:.2e} "
        f"(S2 cascade {tot['s2']/tot['n']:.2e}, S3 kernel {tot['s3']/tot['n']:.2e},"
        f" worst kernel-flip rel margin {worst_margin:.3e})",
        flush=True,
    )
    return tot, worst_margin


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for name in ("config0", "config1"):
        run_config(name)


if __name__ == "__main__":
    main()
