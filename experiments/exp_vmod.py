"""A/B the vmod (pre-modulated vertical envelope) bf16 feature path against
the plain bf16 path on TPU at config1 batch-16 scale.

vmod folds EV @ (img o cos(wy*y)) into (EV o cos) @ img — the (Hp, Wp)
modulated planes never materialize (stage ablation 2026-08-19 priced the
plane builds at ~3.8 ms/op of the ~17.7 ms feature stage).

RESULT (TPU v5 lite via tunnel, 2026-08-19): plain 17.95 ms/op, vmod
18.05 ms/op — a wash. The plane builds overlap with the MXU dots, so
removing VPU work buys nothing; the per-kernel matrix DMA adds a little.
Production keeps the plain path (see fused_pallas._VMOD_OVERRIDE).

Uses the exp_stage_ablation.py harness pattern: raw __wrapped__ group fn +
fresh outer jit per setting so the inner jit cache cannot serve a stale
trace across _VMOD_OVERRIDE values.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops import fused_pallas as fp
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

LOOP = 20
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    enable_compilation_cache()
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=50 + i)[0]
         for i in range(16)]
    )
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(jnp.asarray(imgs))
    fence(lab)

    raw_group = fp._fused_group.__wrapped__

    for name, force in (("plain bf16", False), ("vmod bf16", True)):
        fp._VMOD_OVERRIDE = force

        @jax.jit
        def run(l, _salt=object()):
            def body(i, acc):
                li = l * (1.0 + i.astype(jnp.float32) * 1e-6).astype(l.dtype)
                for g in bank.groups:
                    out = raw_group(li, g, bank, jnp.bfloat16, True, True)
                    for t in jax.tree.leaves(out):
                        acc = acc + jnp.sum(t.astype(jnp.float32))
                return acc
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))

        fence(run(lab))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(lab))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s}: {(best * 1e3 - FENCE_MS) / LOOP:7.2f} ms/op",
              flush=True)
    fp._VMOD_OVERRIDE = None


if __name__ == "__main__":
    main()
