"""MXU dot-pattern microbenchmark: is the fused feature kernel
dispatch-bound or issue-bound?

Context (2026-08-19): exp_feature_roofline.py measures the production
feature kernel at 98.5 TFLOP/s padded-issue — half the nominal v5e peak —
and exp_bandstep.py showed that HALVING the issued MACs (window-128
chunking) made the kernel SLOWER. Hypothesis: per-dot dispatch/latency
dominates, so the right restructure is fewer/bigger dots (stack the
modulated buffers along lanes so one banded dot serves every kernel in the
group), not tighter banding.

This probe times bare Pallas kernels that issue the exact dot shapes the
feature kernel uses, in both the current per-buffer form and the
lane-stacked form, plus a large-dot calibration of the chip's actual MXU
rate. No feature math — pure dot dispatch patterns.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_dot_patterns.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FENCE_MS = 31.0
TARGET_GMAC = 3000.0  # per pattern run (G chosen to hit this; device time
# must dominate the ~31 ms fence + its +-5 ms noise)

# (name, [(count, M, K, N), ...]) — one entry = the dots of one grid step
PATTERNS = [
    # calibration: big square-ish dots, MXU should run near peak
    ("calib_big", [(4, 512, 512, 4096)]),
    # current left-blur geometry: 12 buffers x 3 row-chunks, K=256 window
    ("left_small_k256", [(36, 128, 256, 512)]),
    # window-128 variant of the same (half the MACs)
    ("left_small_k128", [(36, 128, 128, 512)]),
    # lane-stacked left blur: 3 row-chunks, all 12 buffers in N
    ("left_stacked", [(3, 128, 256, 6144)]),
    # lane-stacked left blur, unchunked rows (K = full Hp padded)
    ("left_stacked_fullk", [(1, 384, 384, 6144)]),
    # current right-blur geometry: 12 buffers x 4 col-chunks
    ("right_small", [(48, 384, 256, 128)]),
    # unbanded right blur: one full-K dot per buffer
    ("right_full", [(12, 384, 512, 512)]),
    # smooth left (6 mags x 3 chunks) current vs stacked
    ("smleft_small", [(18, 128, 256, 512)]),
    ("smleft_stacked", [(3, 128, 256, 3072)]),
    # mixed: stacked left + full right (a candidate kernel's blur stage)
    ("blur_candidate", [(3, 128, 256, 6144), (12, 384, 512, 512)]),
]


def _pattern_kernel(x_ref, w_ref, o_ref, *, dots):
    # Three compiler traps this probe must defeat (all hit in earlier
    # versions):
    #  1. store shadowing: later writes to the same out slice DCE'd earlier
    #     dots -> accumulate in registers, write once;
    #  2. within-step CSE: identical (a, b) operand pairs collapse -> every
    #     dot gets a unique (row-offset, col-offset) slice pair;
    #  3. grid-loop LICM: a body with no program_id dependence is hoisted
    #     and executed once (measured absurd ~2000 TFLOP/s) -> the lhs is
    #     rolled by program_id so every step's operands differ.
    a_all = pltpu.roll(x_ref[...], shift=pl.program_id(0) % 8, axis=0)
    accs = {}
    for count, m, k, n in dots:
        for d in range(count):
            # 512-aligned col offsets that always keep the slice in bounds
            nw = (6144 - n) // 512 + 1
            woff = (d % nw) * 512
            roff = (d // nw) % 4 * 8
            a = a_all[roff : roff + m, :k]
            b = w_ref[:k, woff : woff + n]
            r = jnp.dot(a, b, preferred_element_type=jnp.float32)
            key = (m, n)
            accs[key] = r if key not in accs else accs[key] + r
    off = 0
    for (m, n), acc in accs.items():
        o_ref[:m, off : off + n] = acc.astype(jnp.bfloat16)
        off += n
    assert off <= 8192, "accumulator writes exceed out buffer"


def run_pattern(name, dots):
    step_mac = sum(c * m * k * n for c, m, k, n in dots)
    g = max(8, int(TARGET_GMAC * 1e9 / step_mac))
    kern = functools.partial(_pattern_kernel, dots=dots)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((512, 512)), jnp.bfloat16
    )  # 512 rows: room for m <= 384 at row offsets up to 24 after the roll
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((512, 6144)), jnp.bfloat16
    )
    fn = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((512, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 6144), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (384, 8192), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((384, 8192), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )
    jfn = jax.jit(lambda a, b: fn(a, b))
    out = jfn(x, w)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + fence
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, w).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 - FENCE_MS
    total_mac = g * step_mac
    n_dots = g * sum(c for c, *_ in dots)
    print(
        f"{name:20s}: {ms:7.2f} ms, {2 * total_mac / ms / 1e9:7.1f} TFLOP/s "
        f"issued, {ms * 1e3 / n_dots:7.3f} us/dot ({n_dots} dots, G={g})",
        flush=True,
    )


def main():
    for name, dots in PATTERNS:
        run_pattern(name, dots)


if __name__ == "__main__":
    main()
