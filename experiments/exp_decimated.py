"""Cross-formulation feature experiment: decimated large-sigma scale groups
(VERDICT r2 next-round task 7; SURVEY.md §7.4(6)).

Hypothesis: the large-sigma Gabor responses are band-limited by their
envelope, so computing those scale groups on a 2x2-mean-pooled image with
sigma/2, lambda/2 kernels (i.e. the same continuous filter sampled at
stride 2) and nearest-upsampling the energies approximates the full-res
energies at ~1/16 the MACs per decimated group — attacking the feature
stage (~18.1 ms of config1's ~27.2 ms/op budget, 69%) OUTSIDE the
banded-Toeplitz formulation whose padding floor exp_feature_roofline
measured.

Aliasing note: decimation folds original frequency content at (0.5 - f)
cycles/px onto a channel centered at f. For config1's absolute
frequencies (0.10, 0.20) the fold sources are 0.40 / 0.30 cycles/px,
attenuated by the 2x2 pre-pool (per-axis cos(pi f) = 0.31 / 0.59) — the
f=0.20 channels of the decimated groups are the risk. Empirical gates
(>=99.9% label agreement, PRI parity) decide, per the exp_vmod protocol.

Variants (config1 scales 1.5/2.5/4/6/8): decimate the largest 1, 2, or 3
scale groups. The halved kernels cap ksize at 17 because the originals of
sigma=6/8 are themselves truncated at max_ksize=31 (radius 15 -> halved
radius ~8); sigma'=2 lands at 13 taps uncapped. Filter weights are scaled
x4 so the stride-2 Riemann sum matches the full-res response amplitude
(the standardization affine would cancel any constant anyway).

The decimated path reuses the EXACT production solver schedule via
models/pipeline.py::segment_chw_grouped — the in-kernel 2x2 twin of a
nearest-upsampled buffer IS the decimated buffer, so the multigrid warmup
consumes e_lo directly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_decimated.py
"""

from __future__ import annotations

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

from gabor_color_image_segmentation_tpu.config import BankConfig, preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics.pri import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    _pool2x2_nhwc,
    segment_batch,
    segment_chw_grouped,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 20
FENCE_MS = 31.0
N_IMAGES = 16
H, W = 321, 481


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def lo_bank(cfg_bank: BankConfig, split: int):
    """Halved-parameter bank for the decimated groups (scales[split:])."""
    assert cfg_bank.frequencies is not None
    halved = BankConfig(
        scales=tuple(s / 2.0 for s in cfg_bank.scales[split:]),
        orientations=cfg_bank.orientations,
        frequencies=tuple(2.0 * f for f in cfg_bank.frequencies),
        gamma=cfg_bank.gamma,
        psi=cfg_bank.psi,
        truncate=cfg_bank.truncate,
        # originals of sigma=6/8 are truncated at radius 15 (max_ksize=31);
        # the stride-2 sample of that support is radius ~8
        max_ksize=min(cfg_bank.max_ksize, 17),
        smoothing=cfg_bank.smoothing,
        smooth_truncate=cfg_bank.smooth_truncate,
    )
    b = make_bank(halved)
    # x4: the stride-2 grid has 1/4 the taps of the full-res grid
    groups = tuple(
        dataclasses.replace(g, filters_hwio=g.filters_hwio * 4.0)
        for g in b.groups
    )
    return dataclasses.replace(b, groups=groups)


def make_decim_fn(cfg, bank, split: int, dtype):
    bank_hi = dataclasses.replace(
        bank,
        groups=bank.groups[:split],
        n_kernels=sum(len(g.kernel_indices) for g in bank.groups[:split]),
    )
    bank_lo = lo_bank(cfg.bank, split)

    def up2(g, h, w):
        u = jnp.repeat(jnp.repeat(g, 2, axis=2), 2, axis=3)
        ph, pw = h - u.shape[2], w - u.shape[3]
        if ph or pw:  # odd dims: edge-replicate the last row/col
            u = jnp.pad(u, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
        return u

    def energies(color):
        color_p = _pool2x2_nhwc(color)
        e_hi, p_hi = gabor_energies_fused(
            color, bank_hi, dtype, channel_major=True, pooled=True,
            grouped=True,
        )
        e_lo = gabor_energies_fused(
            color_p, bank_lo, dtype, channel_major=True, grouped=True
        )
        h, w = color.shape[1], color.shape[2]
        up = tuple(up2(g, h, w) for g in e_lo)
        # the 2x2 twin of a nearest-upsampled buffer is the buffer itself
        return e_hi + up, p_hi + e_lo

    def seg(rgb):
        color = _color_transform(rgb, cfg.color_space)
        e, p = energies(color)
        return segment_chw_grouped(color, e, p, cfg)

    return seg, energies


def bench(fn, arg, label):
    @jax.jit
    def run(x):
        def body(i, acc):
            # uint8 salt (the bench_device convention) defeats CSE/hoisting
            return acc + jnp.sum(fn(x + i.astype(x.dtype)).astype(jnp.float32))

        return lax.fori_loop(0, LOOP, body, jnp.float32(0))

    fence(run(arg))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(arg))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / LOOP
    mp = arg.shape[0] * arg.shape[1] * arg.shape[2] / 1e6
    print(f"{label:28s}: {ms:7.2f} ms/op  {mp / ms * 1e3:6.1f} MP/s", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    dtype = jnp.bfloat16

    imgs, gts = [], []
    for i in range(N_IMAGES):
        rgb, gt = synthetic_mosaic(h=H, w=W, n_regions=5, seed=100 + i)
        imgs.append(rgb)
        gts.append(gt)
    batch = jnp.asarray(np.stack(imgs))
    fence(batch.astype(jnp.float32))

    # ---- production baseline -------------------------------------------
    base_fn = jax.jit(lambda r: segment_batch(r, cfg, bank, False)[0])
    labels_a = np.asarray(base_fn(batch))
    bench(lambda r: segment_batch(r, cfg, bank, False)[0], batch,
          "production (all full-res)")
    pri_a = np.mean([pri_np(labels_a[i], [gts[i]]) for i in range(N_IMAGES)])

    # ---- decimated variants ---------------------------------------------
    for split, name in ((4, "decimate {8}"), (3, "decimate {6,8}"),
                        (2, "decimate {4,6,8}")):
        seg, energies = make_decim_fn(cfg, bank, split, dtype)
        labels_b = np.asarray(jax.jit(seg)(batch))
        bench(seg, batch, name)
        agree = float(np.mean(labels_b == labels_a))
        pri_b = np.mean(
            [pri_np(labels_b[i], [gts[i]]) for i in range(N_IMAGES)]
        )
        # feature accuracy of the decimated groups (f32, vs exact full-res)
        seg32, energies32 = make_decim_fn(
            cfg.replace(dtype="float32"), bank, split, jnp.float32
        )
        e_exact = gabor_energies_fused(
            jax.jit(lambda r: _color_transform(r, cfg.color_space))(
                batch[:2]
            ),
            bank, jnp.float32, channel_major=True, grouped=True,
        )
        e_dec, _ = jax.jit(energies32)(
            jax.jit(lambda r: _color_transform(r, cfg.color_space))(batch[:2])
        )
        rels = []
        for gi in range(split, len(bank.groups)):
            a = np.asarray(e_exact[gi], np.float32)
            b = np.asarray(e_dec[gi], np.float32)
            rels.append(
                float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-12))
            )
        print(
            f"  label agreement vs production: {agree:.6f}   "
            f"PRI {pri_b:.4f} (prod {pri_a:.4f})   "
            f"decimated-group rel err: "
            + ", ".join(f"{r:.3e}" for r in rels),
            flush=True,
        )


if __name__ == "__main__":
    main()
