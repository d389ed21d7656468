"""Cell-aligned 3-row fused-all SLIC (w3) vs the 5-row plan — TPU A/B.

The fused SLIC's measured bottleneck is VPU work on the (n_cand, band_px)
candidate-window arrays (argmin + one-hot; the mask arithmetic already
rides the MXU as the bilinear penalty dot). The w3 plan shrinks n_cand
from 128 (5 grid rows, lane-padded) to the 8-padded 3*gw (~72 at config3's
grid) by making bands cell-aligned — ~1.8x less window work, identical
per-pixel candidate sets/scores/tie-breaks; only the f32 psum accumulation
order changes (see _slic_all_kernel_w3 docstring).

Reports: per-stage SLIC ms (w3 vs w5), label agreement w3-vs-w5 and
each-vs-XLA-exact, and end-to-end config3 bench MP/s with w3 on.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_slic_w3.py
"""

import time

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import gabor_color_image_segmentation_tpu.models.slic_pallas as sp
from gabor_color_image_segmentation_tpu.models.slic import slic

B, H, W = 8, 321, 481
N_SP, RULER, ITERS = 400, 10.0, 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=5):
    fence(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.1f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_lab():
        base = jax.random.uniform(key, (B, H // 32 + 1, W // 32 + 1, 3)) * 80
        up = jax.image.resize(base, (B, H, W, 3), "linear")
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)) * 2.0
        return up + noise

    lab = make_lab()
    fence(lab)

    @jax.jit
    def xla_path(lab):
        return jax.vmap(lambda l: slic(l, N_SP, RULER, ITERS))(lab).astype(
            jnp.float32
        )

    def fused_path(lab, plan):
        return jax.jit(
            lambda l: sp.slic_fused(l, N_SP, RULER, ITERS, plan).astype(
                jnp.float32
            )
        )(lab)

    exact = xla_path(lab)

    results = {}
    for plan in ("w5", "w3"):
        out = fused_path(lab, plan)
        results[plan] = out
        agree = float(jnp.mean((out == exact).astype(jnp.float32)))
        t = timeit(f"fused-all slic {plan} (10 it)", fused_path, lab, plan)
        print(f"  agreement vs XLA exact: {agree:.6f}", flush=True)

    agree_ab = float(
        jnp.mean((results["w3"] == results["w5"]).astype(jnp.float32))
    )
    print(f"label agreement w3 vs w5: {agree_ab:.6f}", flush=True)


if __name__ == "__main__":
    main()
