"""Sweep kernels-per-grid-step (n_c) in the fused feature kernel.

The config1 feature stage runs 8 chunks/group x 5 groups x 16 images =
640 grid steps at the default n_c=2; per-step overhead was measured at
~3.9 ms total (empty-kernel ablation) and the (1,C,Hp,Wp) input block is
re-fetched every step. Larger n_c cuts both linearly. Per-element math is
IDENTICAL for any n_c dividing the group size (same banded dots, same
accumulation order) — the sweep asserts bitwise equality vs n_c=2.

STATUS (measured 2026-08-19, TPU v5 lite, energies+twin stage, ms/op):
n_c=2 22.9 (production) / n_c=4 26.5 / n_c=8 25.0 / n_c=16 compile
failure (VMEM). NEGATIVE RESULT, kept as record: larger grid steps are
SLOWER — the "empty-kernel" 3.6 ms is the in/out DMA floor (1.35 GB input
re-reads + 1.5 GB output writes), not per-step dispatch overhead, and
smaller steps double-buffer that DMA against compute better than big ones.
The production heuristic (n_c=2) stands; _N_C_OVERRIDE stays for re-sweeps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_nc_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gabor_color_image_segmentation_tpu.ops.fused_pallas as fp
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

LOOP = 6
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    enable_compilation_cache()
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    mm = jnp.bfloat16

    ref = None
    for n_c in (2, 4, 8, 16):
        fp._N_C_OVERRIDE = n_c
        jax.clear_caches()

        @jax.jit
        def run(l):
            def body(i, acc):
                ec, pe = fp.gabor_energies_fused(
                    l + i * 1e-6, bank, mm, channel_major=True, pooled=True
                )
                return (
                    acc
                    + jnp.sum(ec.astype(jnp.float32))
                    + jnp.sum(pe.astype(jnp.float32))
                )
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))

        try:
            fence(run(lab))
        except Exception as e:  # VMEM overflow etc — report and move on
            print(f"n_c={n_c:2d}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(lab))
            best = min(best, time.perf_counter() - t0)
        ms = (best * 1e3 - FENCE_MS) / LOOP

        ec, pe = jax.jit(
            lambda l: fp.gabor_energies_fused(
                l, bank, mm, channel_major=True, pooled=True
            )
        )(lab)
        ec_np, pe_np = np.asarray(ec[:2]), np.asarray(pe[:2])
        if ref is None:
            ref = (ec_np, pe_np)
            bit = "ref"
        else:
            bit = (
                "bitwise-equal"
                if (ec_np == ref[0]).all() and (pe_np == ref[1]).all()
                else "DIFFERS"
            )
        print(f"n_c={n_c:2d}: {ms:6.2f} ms/op   [{bit}]", flush=True)

    fp._N_C_OVERRIDE = None


if __name__ == "__main__":
    main()
