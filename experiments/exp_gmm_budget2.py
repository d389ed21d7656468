"""config2 stage budget AFTER the pooled-fit schedule (TPU, bf16, batch 8).

Pieces: features -> assemble_t -> _pool_xt x2 -> kmeans init (pooled) ->
EM loop (pooled, tol=0 for determinism) -> final full-res E-step; plus the
composed production path (_segment_batch_transposed) and gmm_fused_t_xt
at fit_pool 0 vs 2.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_budget2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gabor_color_image_segmentation_tpu.models.gmm_pallas as gp
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    _pool_xt,
    kmeans_fused_t_xt,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    _segment_batch_transposed,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import assemble_features_t
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 6
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} ~{(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op real",
          flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config2").replace(dtype="bfloat16", batch_size=8)
    cc = cfg.cluster
    k = cc.k
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(8)]
    )
    rgb = jnp.asarray(imgs)
    h, w = rgb.shape[1:3]
    n = h * w
    mm = jnp.bfloat16
    interpret = jax.default_backend() != "tpu"

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)

    timeit("features (fused energies, cm)", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(l + i * 1e-6, bank, mm, channel_major=True)
            .astype(jnp.float32)
        )
    ), lab)

    ec = jax.jit(
        lambda l: gabor_energies_fused(l, bank, mm, channel_major=True)
    )(lab)
    fence(ec)
    e = ec.shape[1]
    d = e + 3
    dp, n_pad, _ = xt_geometry(n, d, mm)

    timeit("assemble_t", loop(
        lambda i, ec_, l: jnp.sum(
            assemble_features_t(ec_ + i.astype(mm) * 0, l, cc, dp, n_pad)
            .astype(jnp.float32)
        )
    ), ec, lab)

    xt = jax.jit(
        lambda ec_, l: assemble_features_t(ec_, l, cc, dp, n_pad)
    )(ec, lab)
    fence(xt)
    block = _block_for_t(n, dp, 2)

    def pool2(xt_):
        xp, m, bp = _pool_xt(xt_, d, h, w)
        xp2, m2, bp2 = _pool_xt(xp, d, h // 2, w // 2)
        return xp2

    timeit("_pool_xt x2 (xt -> 4x4 grid)", loop(
        lambda i, x_: jnp.sum(pool2(x_ + i.astype(mm) * 0)
                              .astype(jnp.float32))
    ), xt)

    xp2, m2, bp2 = jax.jit(
        lambda x_: _pool_xt(
            *(_pool_xt(x_, d, h, w)[0], d, h // 2, w // 2)
        )
    )(xt) if False else (None, None, None)
    # build eagerly without the lambda contortion
    xp, m, bp = _pool_xt(xt, d, h, w)
    xp2, m2, bp2 = _pool_xt(xp, d, h // 2, w // 2)
    fence(xp2)

    timeit("kmeans init on 4x4 grid (10 it)", loop(
        lambda i, x_: jnp.sum(kmeans_fused_t_xt(
            x_ + i.astype(mm) * 0, k, d, m2, 10)[1])
    ), xp2)

    timeit("gmm_fused_t_xt fit_pool=0 (30 it, tol=0)", loop(
        lambda i, x_: jnp.sum(gp.gmm_fused_t_xt(
            x_ + i.astype(mm) * 0, k, d, n, 30, 1e-4, 10, 0.0))
    ), xt)

    timeit("gmm_fused_t_xt fit_pool=2 (30 it, tol=0)", loop(
        lambda i, x_: jnp.sum(gp.gmm_fused_t_xt(
            x_ + i.astype(mm) * 0, k, d, n, 30, 1e-4, 10, 0.0,
            (h, w), 2))
    ), xt)

    timeit("e2e production (rgb -> labels)", loop(
        lambda i, r: jnp.sum(
            _segment_batch_transposed(r + i.astype(r.dtype), cfg, bank)
            .astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
