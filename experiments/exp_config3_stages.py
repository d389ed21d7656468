"""config3 stage budget on TPU: where do the 42 ms/batch-8 go?

Each stage timed with LOOP repetitions inside one jit (amortizes the ~31 ms
fence): features / assemble / slic_fused / means+affinity / subspace n-cut /
full graph stage / full segment_batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - 31.0) / LOOP
    print(f"{name:36s} ~{per:6.2f} ms/op real", flush=True)


def main():
    cfg = preset("config3").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    g = cfg.graph
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=50 + i)[0]
         for i in range(cfg.batch_size)]
    )
    rgb = jnp.asarray(imgs)
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape

    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _color_transform,
        compute_features,
        segment_batch,
    )
    from gabor_color_image_segmentation_tpu.models.graph import (
        affinity_matrix,
        graph_segment_batch,
        spectral_labels,
        superpixel_means,
    )
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused
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
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    n_sp = gh * gw

    timeit("features e2e (fused + assemble)", loop(
        lambda i, r: jnp.sum(
            compute_features(r + i.astype(r.dtype), cfg, bank).astype(jnp.float32)
        )
    ), rgb)

    timeit("energies only (fused kernel)", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(l + i * 1e-6, bank, jnp.bfloat16).astype(
                jnp.float32
            )
        )
    ), lab)

    timeit("slic_fused (10 it)", loop(
        lambda i, l: jnp.sum(
            slic_fused(l + i * 1e-6, g.n_superpixels, g.slic_compactness,
                       g.slic_iters).astype(jnp.float32)
        )
    ), lab)

    sp = jax.jit(
        lambda l: slic_fused(l, g.n_superpixels, g.slic_compactness, g.slic_iters)
    )(lab)
    fence(sp.astype(jnp.float32))

    from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
        enforce_connectivity_fused,
    )

    timeit("connectivity (fused kernel)", loop(
        lambda i, s: jnp.sum(
            enforce_connectivity_fused(
                jnp.where(s >= 0, s, i), n_sp
            ).astype(jnp.float32)
        )
    ), sp)

    sp = jax.jit(lambda s: enforce_connectivity_fused(s, n_sp))(sp)
    fence(sp.astype(jnp.float32))

    def means_aff(i, f, s):
        def per(fi, si):
            fm, cnts = superpixel_means(
                fi.reshape(-1, d) + i * 1e-6, si.reshape(-1), n_sp
            )
            return affinity_matrix(fm, g.affinity_sigma, cnts)
        return jnp.sum(jax.vmap(per)(f, s))

    timeit("superpixel means + affinity", loop(means_aff), feats, sp)

    aff = jax.jit(
        jax.vmap(
            lambda fi, si: affinity_matrix(
                superpixel_means(fi.reshape(-1, d), si.reshape(-1), n_sp)[0],
                g.affinity_sigma,
                superpixel_means(fi.reshape(-1, d), si.reshape(-1), n_sp)[1],
            )
        )
    )(feats, sp)
    fence(aff)

    timeit("spectral (subspace + kmeans)", loop(
        lambda i, a: jnp.sum(
            jax.vmap(
                lambda ai: spectral_labels(ai + i * 1e-9, g.n_regions,
                                           eig_method="subspace")
            )(a).astype(jnp.float32)
        )
    ), aff)

    timeit("graph stage e2e", loop(
        lambda i, f, l: jnp.sum(
            graph_segment_batch(f + i.astype(f.dtype) * 1e-6, l, cfg).astype(
                jnp.float32
            )
        )
    ), feats, lab)

    timeit("segment_batch e2e", loop(
        lambda i, r: jnp.sum(
            segment_batch(r + i.astype(r.dtype), cfg, bank)[0].astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
