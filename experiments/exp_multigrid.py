"""Multigrid Lloyd for config1: pooled warmup + full-res refinement (TPU).

Idea: iterations 1..T1 run on 2x2-mean-pooled pixels (1/4 the HBM traffic;
pooled features are means of 4 neighbors, so early center motion is nearly
identical), then full-res Lloyd refines to its fixed point (capped). The
schedule is deterministic, so golden can mirror it exactly — parity by
construction. This experiment measures, against the production 25-full-iter
solver labels:

  * label agreement (after identity — same init, no permutation needed)
  * PRI on the synthetic ground truth (quality guard)
  * full-res refinement iterations actually used (capped at T2)
  * estimated cost: pooled pass ~ 0.46 ms, full pass ~ 1.84 ms

Schedules swept: (T1 pooled, T2 full-res cap) in a small grid.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_multigrid.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.metrics import pri_np
from gabor_color_image_segmentation_tpu.ops.bank import make_bank


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


K, DT = 5, jnp.bfloat16


def lloyd(f, c0, n_iter, count_iters=False):
    def step(c):
        labels = jnp.argmin(_assign_scores(f, c, DT), axis=1)
        onehot = jax.nn.one_hot(labels, K, dtype=DT)
        counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
        sums = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, c)

    def cond(s):
        i, c, go = s
        return go

    def body(s):
        i, c, _ = s
        new = step(c)
        return i + 1, new, (i + 1 < n_iter) & jnp.any(new != c)

    t, c, _ = lax.while_loop(cond, body, (jnp.int32(0), c0, n_iter > 0))
    return c, t


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    pairs = [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i) for i in range(16)]
    imgs = np.stack([p[0] for p in pairs])
    gts = [p[1] for p in pairs]
    feats = jax.jit(lambda b: compute_features(b, cfg, bank))(jnp.asarray(imgs))
    bsz, h, w, d = feats.shape
    n = h * w
    fence(feats)

    @jax.jit
    def baseline(feats):
        def per_image(fm):
            f = fm.reshape(n, d).astype(DT)
            c0 = maximin_init(f, K).astype(jnp.float32)
            c, t = lloyd(f, c0, 25)
            return jnp.argmin(_assign_scores(f, c, DT), axis=1).astype(jnp.int32), t

        return jax.vmap(per_image)(feats)

    ref, ref_iters = baseline(feats)
    fence(ref)
    ref = np.asarray(ref)
    pri_ref = np.mean([pri_np(ref[i].reshape(h, w), [gts[i]]) for i in range(bsz)])
    print(f"baseline 25-full-iter: PRI {pri_ref:.4f} iters {np.asarray(ref_iters)}")

    hp, wp = (h // 2) * 2, (w // 2) * 2

    def make_run(t1, t2, pool_init):
        @jax.jit
        def run(feats):
            def per_image(fm):
                f = fm.reshape(n, d).astype(DT)
                pooled = fm[:hp, :wp].reshape(hp // 2, 2, wp // 2, 2, d).mean(
                    axis=(1, 3), dtype=jnp.float32
                ).reshape(-1, d).astype(DT)
                if pool_init:
                    c0 = maximin_init(pooled, K).astype(jnp.float32)
                else:
                    c0 = maximin_init(f, K).astype(jnp.float32)
                c, _ = lloyd(pooled, c0, t1)
                c, t = lloyd(f, c, t2)
                labels = jnp.argmin(_assign_scores(f, c, DT), axis=1)
                return labels.astype(jnp.int32), t

            return jax.vmap(per_image)(feats)

        return run

    for t1, t2, pool_init in ((15, 10, True), (15, 10, False), (25, 8, True),
                              (20, 15, True), (15, 5, True)):
        labels, iters = make_run(t1, t2, pool_init)(feats)
        fence(labels)
        lab = np.asarray(labels)
        agree = (lab == ref).mean()
        per_img = (lab == ref).mean(axis=1)
        pri = np.mean([pri_np(lab[i].reshape(h, w), [gts[i]]) for i in range(bsz)])
        it = np.asarray(iters)
        est = t1 * 0.46 + it.mean() * 1.84 + (5 * (0.46 if pool_init else 1.84))
        print(
            f"T1={t1} T2cap={t2} pool_init={pool_init}: agree {agree:.4f} "
            f"(min {per_img.min():.4f}) PRI {pri:.4f} "
            f"full-iters {sorted(it)} est-cost {est:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
