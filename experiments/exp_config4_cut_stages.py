"""config4+cut sub-stage budget: where do the ~1.9 s/batch-4 go?

The first exp_config4_cut run measured 17.7 MP/s (batch 4) for the 4K
pipeline WITH the graph stage at pool=2 vs 110.1 without — the cut chain
added ~1.5 s/op. This probe times each sub-stage of the graph path
(segment_batch's cfg.graph.enabled branch) at the same geometry:

    full-res NHWC energies (tiled fused kernel)  (4, 2160, 3840, 36)
    2x pooled assembly                            (4, 540, 960, 39)
    slic_batch @ 540x960, n_sp=400
    connectivity @ 540x960
    superpixel means + affinity
    subspace n-cut
    table_lookup + 4x4 label upsample

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config4_cut_stages.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.benchmark import build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 5


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=2):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - 31.0) / LOOP
    print(f"{name:40s} ~{per:7.2f} ms/op real", flush=True)
    return per


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    print(jax.default_backend(), jax.devices(), flush=True)
    base = preset("config4").replace(dtype="bfloat16")
    cfg = base.replace(
        graph=dataclasses.replace(base.graph, enabled=True, pool=2)
    )
    g = cfg.graph
    bank = make_bank(cfg.bank)
    batch = build_batch(cfg, 4)
    rgb = jnp.asarray(batch)
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape
    hp_, wp_ = h >> g.pool, w >> g.pool

    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _color_transform,
        _pool2x2_nhwc,
        compute_energies,
    )
    from gabor_color_image_segmentation_tpu.ops.features import (
        assemble_features,
    )
    from gabor_color_image_segmentation_tpu.models.graph import (
        affinity_matrix,
        graph_segment_batch,
        spectral_labels,
        superpixel_means,
    )
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch
    from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
        enforce_connectivity_fused,
    )
    from gabor_color_image_segmentation_tpu.ops.lookup import table_lookup

    gh, gw, _ = grid_shape(hp_, wp_, g.n_superpixels)
    n_sp = gh * gw
    print(f"pooled {hp_}x{wp_} grid {gh}x{gw} n_sp={n_sp}", flush=True)

    timeit("energies full-res (tiled fused)", loop(
        lambda i, r: jnp.sum(
            compute_energies(r + i.astype(r.dtype), cfg, bank)[0][:, ::8, ::8]
            .astype(jnp.float32)
        )
    ), rgb)

    @jax.jit
    def pooled_inputs(r):
        energies, color = compute_energies(r, cfg, bank)
        lab = color
        for _ in range(g.pool):
            energies = _pool2x2_nhwc(energies)
            color = _pool2x2_nhwc(color)
            lab = color
        feats = assemble_features(energies, color, cfg.cluster)
        return feats, lab

    feats, lab = pooled_inputs(rgb)
    fence(feats)
    fence(lab)
    d = feats.shape[-1]

    timeit("pool + assemble (given energies)", loop(
        lambda i, r: jnp.sum(
            pooled_inputs(r + i.astype(r.dtype))[0].astype(jnp.float32)
        )
    ), rgb)

    timeit("slic_batch @pooled", loop(
        lambda i, l: jnp.sum(
            slic_batch(l + i * 1e-6, g.n_superpixels, g.slic_compactness,
                       g.slic_iters).astype(jnp.float32)
        )
    ), lab)

    sp = jax.jit(
        lambda l: slic_batch(l, g.n_superpixels, g.slic_compactness,
                             g.slic_iters)
    )(lab)
    fence(sp.astype(jnp.float32))

    timeit("connectivity @pooled", loop(
        lambda i, s: jnp.sum(
            enforce_connectivity_fused(
                jnp.where(s == i - 10_000_000, 0, s), n_sp
            ).astype(jnp.float32)
        )
    ), sp)

    spc = jax.jit(lambda s: enforce_connectivity_fused(s, n_sp))(sp)
    fence(spc.astype(jnp.float32))

    def means_aff(i, f, s):
        def per(fi, si):
            fm, cnts = superpixel_means(
                fi.reshape(-1, d) + i * 1e-6, si.reshape(-1), n_sp
            )
            return affinity_matrix(fm, g.affinity_sigma, cnts)
        return jnp.sum(jax.vmap(per)(f, s))

    timeit("superpixel means + affinity", loop(means_aff), feats, spc)

    aff = jax.jit(
        jax.vmap(
            lambda fi, si: affinity_matrix(
                superpixel_means(fi.reshape(-1, d), si.reshape(-1), n_sp)[0],
                g.affinity_sigma,
                superpixel_means(fi.reshape(-1, d), si.reshape(-1), n_sp)[1],
            )
        )
    )(feats, spc)
    fence(aff)

    timeit("spectral (subspace + kmeans)", loop(
        lambda i, a: jnp.sum(
            jax.vmap(
                lambda ai: spectral_labels(ai + i * 1e-9, g.n_regions,
                                           eig_method="subspace")
            )(a).astype(jnp.float32)
        )
    ), aff)

    regions = jax.jit(
        jax.vmap(lambda ai: spectral_labels(ai, g.n_regions,
                                            eig_method="subspace"))
    )(aff)
    fence(regions.astype(jnp.float32))

    def broadcast_up(i, s, r):
        lbl = table_lookup(s.reshape(b, hp_ * wp_), r + i * 0)
        lbl = lbl.reshape(b, hp_, wp_)
        f = 1 << g.pool
        lbl = jnp.repeat(jnp.repeat(lbl, f, axis=1), f, axis=2)
        return jnp.sum(lbl.astype(jnp.float32))

    timeit("table_lookup + upsample", loop(broadcast_up), spc, regions)

    timeit("graph stage e2e (pooled inputs)", loop(
        lambda i, f, l: jnp.sum(
            graph_segment_batch(f + i.astype(f.dtype) * 1e-6, l, cfg).astype(
                jnp.float32
            )
        )
    ), feats, lab)


if __name__ == "__main__":
    main()
