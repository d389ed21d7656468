"""Round-2 stage budget of the PRODUCTION config1 path (CHW fused Lloyd).

Decomposes the current _segment_batch_transposed composition at config1
batch-16 bf16:

  1. fused energies, pooled twin ON vs OFF (twin's marginal cost)
  2. build_color4 + _affine_params
  3. assemble_xp_from_affine (pooled lane relayout)
  4. kmeans_coarse_centers_xp (maximin + 15 coarse xt passes)
  5. kmeans_fused_chw refinement only (init_centers given, <=5 passes)
  6. composed e2e

Every fenced number includes ~31 ms scalar-readback overhead; the harness
runs LOOP iterations inside one jit and subtracts the fence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_r2_budget.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
    _affine_params,
    build_color4,
    kmeans_fused_chw,
)
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    kmeans_coarse_centers_xp,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    _segment_batch_transposed,
)
from gabor_color_image_segmentation_tpu.ops.features import (
    _pool2x2_cm,
    assemble_xp_from_affine,
)
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 6
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:48s} ~{(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op real",
          flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank_cached(cfg)
    cc = cfg.cluster
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    mm = jnp.bfloat16

    timeit("energies_cm, pooled twin OFF", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(
                l + i * 1e-6, bank, mm, channel_major=True
            ).astype(jnp.float32)
        )
    ), lab)

    def feats_pooled(i, l):
        ec, pe = gabor_energies_fused(
            l + i * 1e-6, bank, mm, channel_major=True, pooled=True
        )
        return jnp.sum(ec.astype(jnp.float32)) + jnp.sum(pe.astype(jnp.float32))

    timeit("energies_cm, pooled twin ON", loop(feats_pooled), lab)

    ec, pe = jax.jit(
        lambda l: gabor_energies_fused(l, bank, mm, channel_major=True,
                                       pooled=True)
    )(lab)
    fence(ec), fence(pe)
    e = ec.shape[1]
    d = e + 3
    m = (h // 2) * (w // 2)
    dp, m_pad, _ = xt_geometry(m, d, mm)

    def prep(i, l, ec_):
        xc4 = build_color4(l, mm)
        aff = _affine_params(ec_ + i.astype(mm) * 0, xc4, cc, 1e-6)
        return (jnp.sum(xc4.astype(jnp.float32)) + jnp.sum(aff[0])
                + jnp.sum(aff[1]))

    timeit("color4 + affine moments", loop(prep), lab, ec)

    xc4 = jax.jit(lambda l: build_color4(l, mm))(lab)
    aff = jax.jit(lambda e_, c: _affine_params(e_, c, cc, 1e-6))(ec, xc4)
    pc4 = jax.jit(_pool2x2_cm)(xc4)
    fence(xc4), fence(aff[0]), fence(pc4)

    timeit("pool color4 (pc4 matmuls)", loop(
        lambda i, c: jnp.sum(_pool2x2_cm(c + i.astype(mm) * 0)
                             .astype(jnp.float32))
    ), xc4)

    timeit("assemble_xp_from_affine", loop(
        lambda i, pe_, pc_: jnp.sum(
            assemble_xp_from_affine(
                pe_ + i.astype(mm) * 0, pc_, aff[0], aff[1], dp, m_pad, mm
            ).astype(jnp.float32)
        )
    ), pe, pc4)

    xp = jax.jit(
        lambda pe_, pc_: assemble_xp_from_affine(
            pe_, pc_, aff[0], aff[1], dp, m_pad, mm
        )
    )(pe, pc4)
    fence(xp)

    timeit(f"coarse_centers_xp ({cc.coarse_iters} it)", loop(
        lambda i, x_: jnp.sum(
            kmeans_coarse_centers_xp(
                x_ + i.astype(mm) * 0, cc.k, d, m, cc.coarse_iters
            )
        )
    ), xp)

    c0 = jax.jit(
        lambda x_: kmeans_coarse_centers_xp(x_, cc.k, d, m, cc.coarse_iters)
    )(xp)
    fence(c0)

    timeit(f"chw refine (<= {cc.refine_iters} passes)", loop(
        lambda i, ec_, c4, c0_: jnp.sum(
            kmeans_fused_chw(
                ec_ + i.astype(mm) * 0, c4, aff, cc.k, cc.n_iter, 0,
                cc.refine_iters, init_centers=c0_,
            )[0].astype(jnp.float32)
        )
    ), ec, xc4, c0)

    timeit("e2e production (rgb -> labels)", loop(
        lambda i, r: jnp.sum(
            _segment_batch_transposed(
                r + i.astype(r.dtype), cfg, bank
            ).astype(jnp.float32)
        )
    ), rgb)


def make_bank_cached(cfg):
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    return make_bank(cfg.bank)


if __name__ == "__main__":
    main()
