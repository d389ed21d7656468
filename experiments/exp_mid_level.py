"""Does a 2x2 intermediate Lloyd level cut full-res CHW refine passes?

Production config1 schedule: 4x4 xt warmup (maximin + 15 coarse passes,
~3 ms) -> <=5 full-res CHW passes (~3.6 ms each, fixed-point early exit).
The full-res passes dominate the solver budget. Hypothesis: a few cheap
passes on the ALREADY-RESIDENT 2x2 pooled twin (1/4 the MXU+HBM cost per
pass, zero relayout) bring the centers close enough to the full-res fixed
point that 1-2 full-res passes suffice.

Variants (all share the 4x4 warmup c0):
  A  full(<=5)                      — production today
  B  full(<=r), r in {1, 2, 3}      — just cap harder
  C  mid2x2(<=m) + full(<=r)        — the candidate schedule

Reports per variant: amortized ms/op (LOOP-in-jit, fence-subtracted),
label agreement vs A, mean PRI vs the mosaic ground truth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_mid_level.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

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
)
from gabor_color_image_segmentation_tpu.ops.features import (
    _pool2x2_cm,
    assemble_xp_from_affine,
)
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 6
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    cc = cfg.cluster
    mm = jnp.bfloat16
    pairs = [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)
             for i in range(16)]
    rgb = jnp.asarray(np.stack([p[0] for p in pairs]))
    gts = [np.asarray(p[1]) for p in pairs]
    fence(rgb.astype(jnp.float32))
    b, h, w, _ = rgb.shape

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    ec_g, pe_g = jax.jit(
        lambda l: gabor_energies_fused(
            l, bank, mm, channel_major=True, pooled=True, grouped=True
        )
    )(lab)
    for g in ec_g:
        fence(g)
    for g in pe_g:
        fence(g)
    xc4 = jax.jit(lambda l: build_color4(l, mm))(lab)
    affine = jax.jit(
        lambda e, c: _affine_params(e, c, cc, 1e-6)
    )(ec_g, xc4)
    fence(affine[0])
    e = sum(g.shape[1] for g in ec_g)
    k = cc.k

    # shared 4x4 warmup (production form)
    def warmup(ec, pe, xc, aff):
        pe4 = tuple(_pool2x2_cm(g) for g in pe)
        pc2 = _pool2x2_cm(xc)
        pc4 = _pool2x2_cm(pc2)
        hc, wc = h // 4, w // 4
        m = hc * wc
        dp, m_pad, _ = xt_geometry(m, e + 3, mm)
        xp = assemble_xp_from_affine(pe4, pc4, aff[0], aff[1], dp, m_pad, mm)
        c0 = kmeans_coarse_centers_xp(xp, k, e + 3, m, cc.coarse_iters)
        return c0, pc2

    def variant(mid_iters, full_iters):
        def run(ec, pe, xc, aff):
            def body(i, acc):
                a0 = tuple(g + (i.astype(mm) * 0) for g in ec)
                c0, pc2 = warmup(a0, pe, xc, aff)
                if mid_iters > 0:
                    _, c0 = kmeans_fused_chw(
                        pe, pc2, aff, k, 0, 0, mid_iters, init_centers=c0
                    )
                labels, _ = kmeans_fused_chw(
                    a0, xc, aff, k, 0, 0, full_iters, init_centers=c0
                )
                return acc + jnp.sum(labels)
            return lax.fori_loop(0, LOOP, body, jnp.int32(0))
        return jax.jit(run)

    def labels_of(mid_iters, full_iters):
        def run(ec, pe, xc, aff):
            c0, pc2 = warmup(ec, pe, xc, aff)
            if mid_iters > 0:
                _, c0 = kmeans_fused_chw(
                    pe, pc2, aff, k, 0, 0, mid_iters, init_centers=c0
                )
            labels, _ = kmeans_fused_chw(
                ec, xc, aff, k, 0, 0, full_iters, init_centers=c0
            )
            return labels
        return np.asarray(jax.jit(run)(ec_g, pe_g, xc4, affine))

    from gabor_color_image_segmentation_tpu.metrics.boundary import (
        fboundary_np,
    )

    ref = labels_of(0, cc.refine_iters)
    pri_ref = np.mean([pri_np(ref[i], [gts[i]]) for i in range(b)])
    f_ref = np.mean([fboundary_np(ref[i], [gts[i]])[2] for i in range(b)])

    # full=0 variants are assign-only at full resolution: every center
    # update happens on the 2x2 twin, the full-res buffer is streamed
    # exactly once (labels pass) instead of twice (update + labels)
    grid = [(0, 5), (0, 3), (0, 2), (0, 1),
            (2, 1), (2, 2), (3, 1), (3, 2), (5, 1), (5, 2), (8, 1),
            (3, 0), (4, 0), (6, 0), (8, 0), (12, 0)]
    print(f"{'variant':>14s} {'ms/op':>8s} {'agree':>8s} {'PRI':>7s}"
          f" {'F':>7s}   (ref A PRI {pri_ref:.4f} F {f_ref:.4f})",
          flush=True)
    for m_it, f_it in grid:
        fn = variant(m_it, f_it)
        fence(fn(ec_g, pe_g, xc4, affine))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(fn(ec_g, pe_g, xc4, affine))
            best = min(best, time.perf_counter() - t0)
        ms = (best * 1e3 - FENCE_MS) / LOOP
        lbl = labels_of(m_it, f_it)
        agree = float(np.mean(lbl == ref))
        pri = np.mean([pri_np(lbl[i], [gts[i]]) for i in range(b)])
        fb = np.mean([fboundary_np(lbl[i], [gts[i]])[2] for i in range(b)])
        tag = f"mid{m_it}+full{f_it}"
        print(f"{tag:>14s} {ms:8.2f} {agree:8.4f} {pri:7.4f} {fb:7.4f}",
              flush=True)


if __name__ == "__main__":
    main()
