"""How far is the config1 fused feature kernel from the MXU roofline?

Counts the exact MACs the banded-Toeplitz chunking issues (both true and
128-padded, mirroring _chunk_step/_CHUNK_WINDOW geometry in
ops/fused_pallas.py) and divides by the measured energies-only time at
config1 batch-16 bf16 (channel-major + pooled twin — the production call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_feature_roofline.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    _CHUNK_WINDOW,
    gabor_energies_fused,
)

LOOP = 10
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def banded_macs(rows, cols, band, out_w, scale=1, step=_CHUNK_WINDOW):
    """(true, padded) MACs of dot_banded chunking for a (rows, cols)
    Toeplitz against a (cols, out_w) operand (or transposed)."""
    true = pad = 0
    for r0 in range(0, rows, step):
        r1 = min(rows, r0 + step)
        a = max(0, scale * r0 + 0)
        b = min(cols, scale * r1 + band)
        kdim = b - a
        true += (r1 - r0) * kdim * out_w
        pad += (
            -(-(r1 - r0) // 128) * -(-kdim // 128) * -(-out_w // 128) * 128**3
        )
    return true, pad


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    b = cfg.batch_size
    h, w = cfg.image_hw
    c = 3

    total_true = total_pad = 0
    for g in bank.groups:
        n = len(g.kernel_indices)
        p = g.ksize // 2
        r = g.smooth_radius
        hmid = h
        wmid = w
        # per (kernel, channel): blur = 2 m-buffers x (left ev + right eh),
        # smooth = left sv + right sh, pooled twin = stride-2 left + right
        lv = banded_macs(hmid, h + 2 * p, 2 * p, wmid)          # ev @ m
        rh = banded_macs(w, w + 2 * p, 2 * p, hmid)             # . @ eh
        sv = banded_macs(h, h, 2 * r, w)                        # sv @ mag
        sh = banded_macs(w, w, 2 * r, h)                        # . @ sh
        pv = banded_macs(h // 2, h, 2 + 2 * r, w, scale=2)      # pooled
        ph = banded_macs(w // 2, w, 2 + 2 * r, h // 2, scale=2)
        per_kc_true = 2 * (lv[0] + rh[0]) + sv[0] + sh[0] + pv[0] + ph[0]
        per_kc_pad = 2 * (lv[1] + rh[1]) + sv[1] + sh[1] + pv[1] + ph[1]
        total_true += n * c * per_kc_true
        total_pad += n * c * per_kc_pad
        print(
            f"group ksize={g.ksize} r={r} n={n}: "
            f"{n * c * per_kc_true / 1e9:.1f} GMAC true, "
            f"{n * c * per_kc_pad / 1e9:.1f} padded"
        )
    total_true *= b
    total_pad *= b
    print(
        f"config1 batch-{b}: {total_true / 1e12:.3f} TMAC true, "
        f"{total_pad / 1e12:.3f} TMAC padded "
        f"({2 * total_true / 1e12:.2f} / {2 * total_pad / 1e12:.2f} TFLOP)"
    )

    imgs = np.stack(
        [synthetic_mosaic(h, w, n_regions=5, seed=50 + i)[0] for i in range(b)]
    )
    lab = jax.jit(lambda x: _color_transform(x, "lab"))(jnp.asarray(imgs))
    fence(lab)

    @jax.jit
    def run(l):
        def body(i, acc):
            es, eps = gabor_energies_fused(
                l + i * 1e-6, bank, jnp.bfloat16,
                channel_major=True, pooled=True, grouped=True,
            )
            for t in (*es, *eps):
                acc = acc + jnp.sum(t.astype(jnp.float32))
            return acc
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))

    fence(run(lab))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(lab))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / LOOP
    print(f"energies+pooled (production call) ~{ms:6.2f} ms/op real")
    print(
        f"=> {2 * total_true / ms / 1e9:.1f} TFLOP/s true, "
        f"{2 * total_pad / ms / 1e9:.1f} TFLOP/s padded-issue "
        f"(v5e bf16 peak ~394, v5 lite likely ~197)"
    )


if __name__ == "__main__":
    main()
