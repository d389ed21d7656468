"""Per-stage cost decomposition of the fused feature kernel (config1).

Deletes stages via ops.fused_pallas._ABLATE (measurement-only knob) and
times the production energies call at config1 batch-16 bf16. Differences
between settings attribute the 24.4 ms to modulate / envelope blur /
smoothing / pooled-twin / fixed costs, which decides the next optimization
(exp_dot_patterns.py suggests the kernel is dispatch-latency-bound, not
MXU-issue-bound).

Calls the UNJITTED _fused_group under a fresh outer jit per setting so the
inner jit cache cannot serve a stale trace across _ABLATE values.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_stage_ablation.py
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

LOOP = 10
FENCE_MS = 31.0

SETTINGS = [
    ("full (production)", frozenset()),
    ("no pooled twin", frozenset()),  # pooled=False flag below
    ("no smoothing", frozenset({"smooth"})),
    ("no imaginary pair", frozenset({"im"})),
    ("no envelope blur", frozenset({"blur"})),
    ("no modulate", frozenset({"modulate"})),
    ("blur only (no smooth+pool)", frozenset({"smooth"})),
    ("floor (no blur/smooth/pool)", frozenset({"blur", "smooth"})),
    # second round: decompose the 15 ms floor
    ("floor, no box filter", frozenset({"blur", "smooth", "box"})),
    ("floor, no demod", frozenset({"blur", "smooth", "demod"})),
    ("floor, no modulate", frozenset({"blur", "smooth", "modulate"})),
    ("floor, no sqrt", frozenset({"blur", "smooth", "sqrt"})),
    ("empty (all ablated)", frozenset(
        {"blur", "smooth", "modulate", "im", "demod", "sqrt", "box"})),
]
# settings whose pooled flag is off
NO_POOL = {"no pooled twin", "blur only (no smooth+pool)",
           "floor (no blur/smooth/pool)", "floor, no box filter",
           "floor, no demod", "floor, no modulate", "floor, no sqrt",
           "empty (all ablated)"}


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=50 + i)[0]
         for i in range(16)]
    )
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(jnp.asarray(imgs))
    fence(lab)

    raw_group = fp._fused_group.__wrapped__

    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, ablate in SETTINGS:
        if only and only not in name:
            continue
        fp._ABLATE = ablate
        pooled = name not in NO_POOL

        @jax.jit
        def run(l, _salt=object()):
            def body(i, acc):
                li = l * (1.0 + i.astype(jnp.float32) * 1e-6).astype(l.dtype)
                for g in bank.groups:
                    out = raw_group(li, g, bank, jnp.bfloat16, True, pooled)
                    ts = out if pooled else (out,)
                    for t in jax.tree.leaves(ts):
                        acc = acc + jnp.sum(t.astype(jnp.float32))
                return acc
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))

        fence(run(lab))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(lab))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:30s}: {(best * 1e3 - FENCE_MS) / LOOP:7.2f} ms/op",
              flush=True)
    fp._ABLATE = frozenset()


if __name__ == "__main__":
    main()
