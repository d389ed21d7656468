"""sklearn-style tol for Lloyd: iterations saved vs labels changed (TPU).

sklearn KMeans stops when the squared-Frobenius center shift falls below
tol * mean(var(X)) (sklearn _kmeans.py::_tolerance, default tol=1e-4).
Features here are standardized per image, so mean variance ~= 1 and the
absolute threshold is ~tol. Measures on the REAL bench features:
  - iterations used at tol in {0 (exact fixed point), 1e-4, 1e-3}
  - label agreement vs the fixed-25 run
  - kmeans stage time at each tol

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_kmeans_tol.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.ops.bank import make_bank


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0] for i in range(16)]
    )
    feats = jax.jit(lambda b: compute_features(b, cfg, bank))(jnp.asarray(imgs))
    bsz, h, w, d = feats.shape
    flat = feats.reshape(bsz, h * w, d)
    fence(flat)

    K, N_ITER, DT = 5, 25, jnp.bfloat16

    def solver(tol):
        @jax.jit
        def run(x):
            def per_image(f):
                f = f.astype(DT)
                c0 = maximin_init(f, K).astype(jnp.float32)

                def step(c):
                    labels = jnp.argmin(_assign_scores(f, c, DT), axis=1)
                    onehot = jax.nn.one_hot(labels, K, dtype=DT)
                    counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
                    sums = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
                    new = sums / jnp.maximum(counts, 1.0)[:, None]
                    return jnp.where(counts[:, None] > 0, new, c)

                def cond(s):
                    return s[2]

                def body(s):
                    i, c, _ = s
                    new = step(c)
                    shift = jnp.sum((new - c) ** 2)
                    return i + 1, new, (i + 1 < N_ITER) & (shift > tol)

                t, c, _ = lax.while_loop(cond, body, (jnp.int32(0), c0, True))
                labels = jnp.argmin(_assign_scores(f, c, DT), axis=1)
                return labels.astype(jnp.int32), t

            return jax.vmap(per_image)(x)

        return run

    ref_labels, _ = solver(0.0)(flat)
    fence(ref_labels.astype(jnp.float32))

    for tol in (0.0, 1e-4, 1e-3):
        run = solver(tol)
        labels, iters = run(flat)
        fence(labels.astype(jnp.float32))
        agree = float(jnp.mean((labels == ref_labels).astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(flat)[0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        print(
            f"tol={tol:g}: iters={np.asarray(iters)} agree={agree:.5f} "
            f"time={best*1e3:.1f} ms (incl ~31 fence)",
            flush=True,
        )


if __name__ == "__main__":
    main()
