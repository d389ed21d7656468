"""config2 fused params-prep loop A/B — the recorded measurement behind
models/gmm_pallas.py::_FUSED_PREP = False (VERDICT r4 task 3).

Times the full production solver (fit_pool=2, refine=1, tol-freeze path)
at n_iter = 8 and 28; the SLOPE over 20 iterations cancels the tunnel
fence and every iteration-independent cost. Run both orders to control
for compile/session effects.

Measured 2026-08-20 (TPU v5 lite, two sessions, min-of-10):
  standard loop: 0.208-0.214 ms/EM-iteration
  fused    loop: 0.266-0.274 ms/EM-iteration
despite the fused launch standalone (0.096 ms) matching the XLA
prep+glue chain it replaces (0.102 ms) — the small XLA segments pipeline
with the Pallas launches better than one long kernel. Verdict: OFF.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_fusedprep_ab.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import gabor_color_image_segmentation_tpu.models.gmm_pallas as gp

B, H, W, D, K = 8, 321, 481, 39, 5
N = H * W


def fence(o):
    return float(jnp.sum(o.astype(jnp.float32)))


def timed(fn, reps=10):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def solver(n_iter):
    return jax.jit(
        lambda xx: gp.gmm_fused_t(
            xx, K, n_iter=n_iter, tol=1e-30, hw=(H, W), fit_pool=2,
            refine_iters=1,
        )
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    for rnd in range(2):
        for mode in ("standard", "fused"):
            gp._use_fused_prep = (
                (lambda: True) if mode == "fused" else (lambda: False)
            )
            gp.gmm_fused_t_xt.clear_cache()
            s8, s28 = solver(8), solver(28)
            fence(s8(x))
            fence(s28(x))
            t8, t28 = timed(lambda: s8(x)), timed(lambda: s28(x))
            print(f"round{rnd} {mode}: T8={t8*1e3:.2f} T28={t28*1e3:.2f} "
                  f"slope={(t28-t8)/20*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
