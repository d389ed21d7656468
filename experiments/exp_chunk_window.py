"""Sweep _CHUNK_WINDOW (banded-dot chunk rows AND contraction-window cap)
in the fused feature kernel, fixed mode, on the production pooled call.

Complements exp_bandstep.py (which swept fixed-vs-window MODE at 128) and
exp_nc_sweep.py (kernels per grid step): this varies the fixed step itself.
Per-element math is identical for any window (only exact-zero band terms
are dropped); the sweep asserts bitwise equality vs 128.

STATUS (measured 2026-08-19, TPU v5 lite, energies+twin stage, ms/op):
128 = 22.4 (production) / 96 = 29.3 / 160 = 28.5 / 192 = 25.6 / 256 = 26.7.
NEGATIVE RESULT, kept as record: 128 is a clear local optimum in BOTH
directions — smaller steps multiply dot dispatches, larger ones multiply
padded contraction lanes AND pipeline worse. Note the bitwise-equality
probe reports DIFFERS for windows != 128: chunk boundaries change how the
MXU segments each row's f32 accumulation, an ulp-level reordering (the
"only exact zeros dropped" argument fixes the SET of terms, not the
summation tree). Production stays at 128, where results are reproducible.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_chunk_window.py
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
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(jnp.asarray(imgs))
    fence(lab)
    mm = jnp.bfloat16

    ref = None
    for window in (128, 96, 160, 192, 256):
        fp._CHUNK_WINDOW = window
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
        except Exception as e:
            print(f"window={window:4d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
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
        print(f"window={window:4d}: {ms:6.2f} ms/op   [{bit}]", flush=True)

    fp._CHUNK_WINDOW = 128


if __name__ == "__main__":
    main()
