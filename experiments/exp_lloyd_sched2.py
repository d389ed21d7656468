"""config1 Lloyd schedule diagnostics (TPU).

Three questions that decide the route to 50 MP/s:
  1. Real cost slope of the fused solver: time kmeans_fused_t_xt at
     n_iter in {5, 15, 25} -> per-iteration cost + fixed overhead (init,
     glue). BASELINE row says ~64.6 ms at 25 iters = 8 init + 37.7 passes
     + ~19 glue; is the glue real, and is it per-iteration?
  2. sklearn tol semantics: center-shift Frobenius^2 per iteration vs
     sklearn's threshold tol * mean(feature variances) (= tol here;
     features are standardized). At which iteration would tol=1e-4 / 1e-3
     stop each image?
  3. What do truncated schedules cost in label fidelity: agreement of
     labels at iteration t vs the converged (25-iter) labels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lloyd_sched2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    kmeans_fused_t_xt,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    compute_features,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import assemble_features_t
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0] for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    h, w = 321, 481
    n = h * w
    K = 5

    @jax.jit
    def build(rgb):
        color = _color_transform(rgb, cfg.color_space)
        e_cm = gabor_energies_fused(color, bank, jnp.bfloat16, channel_major=True)
        e = e_cm.shape[1]
        dp, n_pad, _ = xt_geometry(n, e + 3, jnp.bfloat16)
        return assemble_features_t(e_cm, color, cfg.cluster, dp, n_pad), e + 3

    xt, d = build(rgb)
    d = int(d)
    fence(xt)
    print(f"xt {xt.shape} {xt.dtype} d={d}", flush=True)

    # --- 1. timing slope -------------------------------------------------
    for n_iter in (5, 15, 25):
        run = jax.jit(lambda xt: kmeans_fused_t_xt(xt, K, d, n, n_iter)[0])
        fence(run(xt))  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(xt))
            best = min(best, time.perf_counter() - t0)
        print(f"fused solver n_iter={n_iter:2d}: {best*1e3:7.1f} ms "
              f"(incl ~31 fence)", flush=True)

    # --- 2+3. shift trace + truncation fidelity (XLA solver, exact-equal
    # labels to the fused kernel per exp_lloyd_t) ------------------------
    feats = jax.jit(lambda b: compute_features(b, cfg, bank))(rgb)
    flat = feats.reshape(16, n, -1)
    N_ITER, DT = 25, jnp.bfloat16

    @jax.jit
    def trace(x):
        def per_image(f):
            f = f.astype(DT)
            c0 = maximin_init(f, K).astype(jnp.float32)

            def body(c, _):
                labels = jnp.argmin(_assign_scores(f, c, DT), axis=1)
                onehot = jax.nn.one_hot(labels, K, dtype=DT)
                counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
                sums = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
                new = sums / jnp.maximum(counts, 1.0)[:, None]
                new = jnp.where(counts[:, None] > 0, new, c)
                shift = jnp.sum((new - c) ** 2)
                return new, (labels.astype(jnp.int8), shift)

            _, (labels_t, shift_t) = jax.lax.scan(body, c0, None, length=N_ITER)
            return labels_t, shift_t

        return jax.vmap(per_image)(x)

    labels_t, shift_t = trace(flat)
    fence(shift_t)
    labels_t = np.asarray(labels_t)  # (B, T, N) int8
    shift_t = np.asarray(shift_t, np.float64)  # (B, T)

    final = labels_t[:, -1]
    print("\niter  shift^2(med)  shift^2(max)  #img<1e-3  #img<1e-4  "
          "agree-vs-final(min image)")
    for t in range(N_ITER):
        agr = (labels_t[:, t] == final).mean(axis=1)
        print(
            f"{t+1:4d}  {np.median(shift_t[:, t]):12.3e}  "
            f"{shift_t[:, t].max():12.3e}  "
            f"{(shift_t[:, t] < 1e-3).sum():9d}  "
            f"{(shift_t[:, t] < 1e-4).sum():9d}  {agr.min():.5f}",
            flush=True,
        )

    # sklearn stop iteration per image (first t with shift^2 < tol)
    for tol in (1e-3, 1e-4):
        stop = np.argmax(shift_t < tol, axis=1) + 1
        stop[~(shift_t < tol).any(axis=1)] = N_ITER
        print(f"tol={tol:g}: stop iterations per image {sorted(stop)}")


if __name__ == "__main__":
    main()
