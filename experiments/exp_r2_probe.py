"""Micro-probes for the next config1 cuts (round 2).

Measures, at config1 batch-16 bf16 scale:
  1. the 5-group energies concat (full-res + pooled twin) — what a
     grouped-consumer refactor would save
  2. 4x4 coarse grid: pool2x2 of the in-kernel 2x2 twin, its xp relayout,
     and kmeans_coarse_centers_xp on the 1/16-size buffer — what moving the
     multigrid warmup to a 4x4 grid would save vs the current 2x2 numbers
     (assemble_xp 6.2 ms + coarse 10.2 ms)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_r2_probe.py
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
)
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    kmeans_coarse_centers_xp,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
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
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    cc = cfg.cluster
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    b, h, w, _ = rgb.shape
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    mm = jnp.bfloat16

    ec, pe = jax.jit(
        lambda l: gabor_energies_fused(l, bank, mm, channel_major=True,
                                       pooled=True)
    )(lab)
    fence(ec), fence(pe)
    e = ec.shape[1]
    d = e + 3

    # 1. concat cost: split the buffers back into 5 group parts and time
    # re-concatenation (the group boundary sizes of config1's 5 scale groups)
    gsz = e // 5
    # device-side copies (never round-trip through the host: ~50 MB/s)
    parts = [jax.jit(lambda q: q + jnp.zeros((), mm))(ec[:, g * gsz : (g + 1) * gsz])
             for g in range(5)]
    for p in parts:
        fence(p)

    timeit("concat 5 groups, full-res (2.37 GB)", loop(
        lambda i, *ps: jnp.sum(
            jnp.concatenate(
                [p + i.astype(mm) * 0 for p in ps], axis=1
            ).astype(jnp.float32)
        )
    ), *parts)

    pparts = [jax.jit(lambda q: q + jnp.zeros((), mm))(pe[:, g * gsz : (g + 1) * gsz])
              for g in range(5)]
    for p in pparts:
        fence(p)

    timeit("concat 5 groups, pooled twin (0.6 GB)", loop(
        lambda i, *ps: jnp.sum(
            jnp.concatenate(
                [p + i.astype(mm) * 0 for p in ps], axis=1
            ).astype(jnp.float32)
        )
    ), *pparts)

    # 2. 4x4 coarse grid pieces
    xc4 = jax.jit(lambda l: build_color4(l, mm))(lab)
    aff = jax.jit(lambda e_, c: _affine_params(e_, c, cc, 1e-6))(ec, xc4)
    pc4 = jax.jit(_pool2x2_cm)(xc4)
    fence(xc4), fence(aff[0]), fence(pc4)

    timeit("pool2x2 of 2x2 twin -> 4x4 (energies+color)", loop(
        lambda i, pe_, pc_: jnp.sum(_pool2x2_cm(pe_ + i.astype(mm) * 0)
                                    .astype(jnp.float32))
        + jnp.sum(_pool2x2_cm(pc_).astype(jnp.float32))
    ), pe, pc4)

    pe4 = jax.jit(_pool2x2_cm)(pe)
    pc44 = jax.jit(_pool2x2_cm)(pc4)
    fence(pe4), fence(pc44)
    h4, w4 = pe4.shape[2], pe4.shape[3]
    m4 = h4 * w4
    dp, m4_pad, _ = xt_geometry(m4, d, mm)

    timeit("assemble_xp (4x4 grid)", loop(
        lambda i, pe_, pc_: jnp.sum(
            assemble_xp_from_affine(
                pe_ + i.astype(mm) * 0, pc_, aff[0], aff[1], dp, m4_pad, mm
            ).astype(jnp.float32)
        )
    ), pe4, pc44)

    xp4 = jax.jit(
        lambda pe_, pc_: assemble_xp_from_affine(
            pe_, pc_, aff[0], aff[1], dp, m4_pad, mm
        )
    )(pe4, pc44)
    fence(xp4)

    timeit(f"coarse_centers_xp 4x4 ({cc.coarse_iters} it)", loop(
        lambda i, x_: jnp.sum(
            kmeans_coarse_centers_xp(
                x_ + i.astype(mm) * 0, cc.k, d, m4, cc.coarse_iters
            )
        )
    ), xp4)


if __name__ == "__main__":
    main()
