"""config1 stage budget on TPU (the headline bench): find unaccounted glue.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config1_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 6


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} ~{(best*1e3-31.0)/LOOP:7.2f} ms/op real", flush=True)


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape

    from gabor_color_image_segmentation_tpu.models.kmeans import (
        kmeans_batch,
        maximin_init,
    )
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _color_transform,
        compute_features,
        segment_batch,
    )
    from gabor_color_image_segmentation_tpu.ops.features import assemble_features
    from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
        gabor_energies_fused,
    )

    def loop(fn):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + fn(i, *args)
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))
        return run

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    feats = jax.jit(lambda r: compute_features(r, cfg, bank))(rgb)
    fence(lab)
    fence(feats)
    d = feats.shape[-1]
    flat = feats.reshape(b, h * w, d)
    energies = jax.jit(
        lambda l: gabor_energies_fused(l, bank, jnp.bfloat16)
    )(lab)
    fence(energies)

    timeit("energies only (fused kernel)", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(l + i * 1e-6, bank, jnp.bfloat16).astype(
                jnp.float32
            )
        )
    ), lab)

    timeit("assemble (standardize + concat)", loop(
        lambda i, e, l: jnp.sum(
            assemble_features(e + i.astype(e.dtype) * 0, l, cfg.cluster).astype(
                jnp.float32
            )
        )
    ), energies, lab)

    timeit("features e2e", loop(
        lambda i, r: jnp.sum(
            compute_features(r + i.astype(r.dtype), cfg, bank).astype(jnp.float32)
        )
    ), rgb)

    timeit("maximin init (vmapped)", loop(
        lambda i, f: jnp.sum(
            jax.vmap(lambda x: maximin_init(x + i.astype(x.dtype) * 0, 5))(f).astype(
                jnp.float32
            )
        )
    ), flat)

    timeit("kmeans_batch (25 it cap)", loop(
        lambda i, f: jnp.sum(
            kmeans_batch(f + i.astype(f.dtype) * 0, 5, 25, jnp.bfloat16)[0].astype(
                jnp.float32
            )
        )
    ), flat)

    timeit("segment_batch e2e", loop(
        lambda i, r: jnp.sum(
            segment_batch(r + i.astype(r.dtype), cfg, bank)[0].astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
