"""Banded-dot chunk-geometry sweep for the fused feature kernel.

The kernel's Toeplitz dots chunk their output rows/cols; each chunk pays a
(scale*step + band)-wide contraction. Smaller steps cut MACs, more chunks
cost dot dispatches. This sweeps the trade-off on the real chip at config1
batch-16 scale.

Measured 2026-08-18 (TPU v5 lite, energies_cm stage, ms/op real):
  fixed step 128 (production): 25.5      window 128 (step=128-band): 30.2
  -> see printed table for the full sweep; fixed-128 stands.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_bandstep.py
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

LOOP = 6
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(jnp.asarray(imgs))
    fence(lab)

    ref = None
    for mode, window in (
        ("fixed", 128), ("fixed", 160), ("fixed", 192), ("fixed", 256),
        ("window", 128), ("window", 192),
    ):
        fp._CHUNK_MODE, fp._CHUNK_WINDOW = mode, window

        @jax.jit
        def run(l, _salt=object()):  # fresh identity -> retrace per setting
            def body(i, acc):
                e = fp.gabor_energies_fused(
                    l * (1.0 + i.astype(jnp.float32) * 1e-6).astype(l.dtype),
                    bank, jnp.bfloat16, channel_major=True,
                )
                return acc + jnp.sum(e.astype(jnp.float32))
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))

        out = fence(run(lab))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(lab))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:7s} {window:4d}: {(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op "
              f"(checksum {out:.6g})", flush=True)
    fp._CHUNK_MODE, fp._CHUNK_WINDOW = "fixed", 128


if __name__ == "__main__":
    main()
