"""config1 TRANSPOSED-path stage budget on TPU (the production bench path).

Stages: fused energies (channel-major) -> assemble_features_t_pooled ->
kmeans_fused_t_xt multigrid -> composed _segment_batch_transposed. Every
fenced number includes ~31 ms scalar-readback overhead; the harness
subtracts it (LOOP iterations inside one jit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config1_t_stages.py
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
    print(f"{name:44s} ~{(best*1e3-31.0)/LOOP:7.2f} ms/op real", flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t_xt,
        xt_geometry,
    )
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _color_transform,
        _segment_batch_transposed,
    )
    from gabor_color_image_segmentation_tpu.ops.features import (
        assemble_features_t,
        assemble_features_t_pooled,
    )
    from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
        gabor_energies_fused,
    )

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape
    n = h * w

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    energies_cm = jax.jit(
        lambda l: gabor_energies_fused(l, bank, jnp.bfloat16, channel_major=True)
    )(lab)
    fence(energies_cm)
    e = energies_cm.shape[1]
    d = e + 3
    dp, n_pad, _ = xt_geometry(n, d, jnp.bfloat16)
    m = (h // 2) * (w // 2)
    _, m_pad, _ = xt_geometry(m, d, jnp.bfloat16)

    cc = cfg.cluster

    timeit("energies_cm (fused kernel)", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(
                l + i * 1e-6, bank, jnp.bfloat16, channel_major=True
            ).astype(jnp.float32)
        )
    ), lab)

    timeit("assemble_t (no pool)", loop(
        lambda i, ec, l: jnp.sum(
            assemble_features_t(
                ec + i.astype(ec.dtype) * 0, l, cc, dp, n_pad
            ).astype(jnp.float32)
        )
    ), energies_cm, lab)

    def asm_pooled(i, ec, l):
        xt, xp = assemble_features_t_pooled(
            ec + i.astype(ec.dtype) * 0, l, cc, dp, n_pad, m_pad
        )
        return jnp.sum(xt.astype(jnp.float32)) + jnp.sum(xp.astype(jnp.float32))

    timeit("assemble_t_pooled (xt + xp)", loop(asm_pooled), energies_cm, lab)

    xt, xp = jax.jit(
        lambda ec, l: assemble_features_t_pooled(ec, l, cc, dp, n_pad, m_pad)
    )(energies_cm, lab)
    fence(xt)
    fence(xp)

    timeit("solver multigrid (prebuilt xt+xp)", loop(
        lambda i, x_, p_: jnp.sum(
            kmeans_fused_t_xt(
                x_ + i.astype(x_.dtype) * 0, cc.k, d, n, cc.n_iter, 1,
                (h, w), cc.coarse_iters, cc.refine_iters, xp=p_,
            )[0].astype(jnp.float32)
        )
    ), xt, xp)

    timeit("e2e transposed (rgb -> labels)", loop(
        lambda i, r: jnp.sum(
            _segment_batch_transposed(
                r + i.astype(r.dtype), cfg, bank
            ).astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
