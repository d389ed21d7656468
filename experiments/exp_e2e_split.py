"""Cumulative-prefix stage split of the config1 PRODUCTION path.

Times successive prefixes of the exact `_segment_batch_transposed` CHW
composition (grouped pooled energies -> affine -> xp -> coarse -> mid ->
full-res Lloyd) under one methodology (LOOP-amortized in-jit fori loop
with a real data dependence per iteration), so successive-row differences
are the true in-context stage costs — unlike per-stage harnesses whose
amortization differs from the bench's.

STATUS (measured 2026-08-19, TPU v5 lite, config1 batch-16 bf16, LOOP=25):
color ~0 / energies+twin +18.3 / affine +0.2 / xp +1.3 / coarse(maximin+15
4x4 passes) +3.0 / mid(3 2x2 passes) +2.9 / full(assign-only) +3.8 =
29.4 ms/op; production _segment_batch_transposed cross-check 29.5 (match).
Solver total 11.0 ms vs ~4.5 ms HBM floor (full-res pass streams 1.2 GB
bf16 = 1.6 ms; mid 3 x 0.37; coarse data 1.1 GB over 15 passes) — the CHW
fused Lloyd passes run ~2-2.5x above the stream floor; next target.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_e2e_split.py
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
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import (
    _pool2x2_cm,
    assemble_xp_from_affine,
)
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

LOOP = 25
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
    ms = (best * 1e3 - FENCE_MS) / LOOP
    print(f"{name:34s} ~{ms:7.2f} ms/op", flush=True)
    return ms


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    enable_compilation_cache()
    cfg = preset("config1").replace(dtype="bfloat16")
    cc = cfg.cluster
    bank = make_bank(cfg.bank)
    dtype = jnp.bfloat16
    b, h, w = 16, 321, 481
    imgs = np.stack(
        [synthetic_mosaic(h, w, n_regions=5, seed=100 + i)[0]
         for i in range(b)]
    )
    rgb = jnp.asarray(imgs, jnp.float32) / 255.0
    fence(rgb)

    def perturb(x, i):
        return x * (1.0 + i.astype(jnp.float32) * 1e-6).astype(x.dtype)

    # prefix builders: each returns a scalar checksum of everything the
    # prefix produced, composed EXACTLY like _segment_batch_transposed
    def chk(*ts):
        out = jnp.float32(0)
        for t in ts:
            if isinstance(t, tuple):
                out = out + chk(*t)
            else:
                out = out + jnp.sum(t.astype(jnp.float32))
        return out

    lvl = cc.coarse_levels

    def prefix(stop, i, r):
        color = _color_transform(perturb(r, i), cfg.color_space)
        if stop == "color":
            return chk(color)
        energies_cm, pooled_e = gabor_energies_fused(
            color, bank, dtype, channel_major=True, pooled=True, grouped=True
        )
        if stop == "energies":
            return chk(energies_cm, pooled_e)
        xc4 = build_color4(color, dtype)
        affine = _affine_params(energies_cm, xc4, cc, 1e-6)
        if stop == "affine":
            return chk(energies_cm, pooled_e, affine)
        e = sum(g.shape[1] for g in energies_cm)
        pe_l, pc_l, hc, wc = pooled_e, _pool2x2_cm(xc4), h // 2, w // 2
        levels = [(pe_l, pc_l)]
        for _ in range(lvl - 1):
            pe_l = tuple(_pool2x2_cm(g) for g in pe_l)
            pc_l = _pool2x2_cm(pc_l)
            hc, wc = hc // 2, wc // 2
            levels.append((pe_l, pc_l))
        m = hc * wc
        dp, m_pad, _ = xt_geometry(m, e + 3, dtype)
        xp = assemble_xp_from_affine(
            pe_l, pc_l, affine[0], affine[1], dp, m_pad, dtype
        )
        if stop == "xp":
            return chk(energies_cm, pooled_e, affine, xp)
        c0 = kmeans_coarse_centers_xp(xp, cc.k, e + 3, m, cc.coarse_iters)
        if stop == "coarse":
            return chk(energies_cm, pooled_e, affine, c0)
        if cc.mid_iters > 0:
            for pe_m, pc_m in reversed(levels[:-1]):
                _, c0 = kmeans_fused_chw(
                    pe_m, pc_m, affine, cc.k, 0, 0, cc.mid_iters,
                    init_centers=c0, with_labels=False,
                )
        if stop == "mid":
            return chk(energies_cm, affine, c0)
        labels, _ = kmeans_fused_chw(
            energies_cm, xc4, affine, cc.k, cc.n_iter, 0, cc.refine_iters,
            init_centers=c0,
        )
        return chk(labels)

    rows = ["color", "energies", "affine", "xp", "coarse", "mid", "full"]
    prev = 0.0
    for stop in rows:
        ms = timeit(
            f"prefix: ..{stop}",
            loop(lambda i, r, s=stop: prefix(s, i, r)), rgb,
        )
        print(f"{'':34s}   stage delta {ms - prev:+6.2f} ms", flush=True)
        prev = ms

    # cross-check vs the real production entry (identical composition)
    timeit("segment (production fn)", loop(
        lambda i, r: jnp.sum(
            _segment_batch_transposed(perturb(r, i), cfg, bank)
            .astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
