"""A/B the one-launch Pallas batched Cholesky+inverse (chol_pallas) vs the
XLA cholesky + solve_triangular pair it replaces in config2's per-EM-
iteration glue, at the production shape (B=8, k=5, d=39).

Methodology (CLAUDE.md): upload once, loop inside jit via lax.fori_loop
with a NON-foldable per-iteration salt (the exp_gmm_glue lesson: `+ i*0.0`
constant-folds and XLA hoists the probed stage), fence with a scalar
readback, subtract nothing — both arms carry the same loop+fence overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_chol_pallas.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.models.chol_pallas import (
    precision_chol_pallas,
)
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

B, K, D = 8, 5, 39
ITERS = 200


def spd(seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((B, K, D, D + 8))
    cov = a @ a.transpose(0, 1, 3, 2) / (D + 8) + 1e-2 * np.eye(D)
    return jnp.asarray(cov, jnp.float32)


def xla_glue(cov):
    chol = jnp.linalg.cholesky(cov)
    pt = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(jnp.eye(D, dtype=cov.dtype), (B, K, D, D)),
        lower=True,
    )
    diag = jnp.diagonal(chol, axis1=2, axis2=3)
    return pt, diag


def pallas_glue(cov):
    return precision_chol_pallas(cov, d=D)


def loop(fn, cov, iters):
    def body(i, acc):
        # salt scales the matrix: cov * (1 + i*1e-7) keeps it SPD and is
        # NOT constant-foldable across iterations
        c = cov * (1.0 + jnp.float32(1e-7) * i)
        pt, diag = fn(c)
        return acc + jnp.sum(pt) + jnp.sum(diag)

    return lax.fori_loop(0, iters, body, jnp.float32(0.0))


def bench(name, fn):
    f = jax.jit(lambda cov: loop(fn, cov, ITERS))
    cov = spd(0)
    t0 = time.perf_counter()
    _ = float(f(cov))  # compile + run
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        chk = float(f(cov))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(
        f"{name}: {best*1e3/ITERS:.4f} ms/op ({ITERS} in-jit iters, "
        f"best-of-3 incl ~31 ms fence; checksum {chk:.6g})",
        flush=True,
    )
    return best * 1e3 / ITERS


def main():
    print("backend:", jax.default_backend(), flush=True)
    # parity on-device first (the kernel must TPU-compile at all)
    cov = spd(1)
    pt_p, dg_p = jax.jit(pallas_glue)(cov)
    pt_x, dg_x = jax.jit(xla_glue)(cov)
    rel = jnp.max(
        jnp.abs(pt_p - pt_x) / (jnp.abs(pt_x) + 1e-3)
    )
    print(f"on-device parity: max rel diff pt {float(rel):.3e}, "
          f"diag {float(jnp.max(jnp.abs(dg_p - dg_x))):.3e}", flush=True)
    t_x = bench("xla chol+solve", xla_glue)
    t_p = bench("pallas one-launch", pallas_glue)
    print(f"speedup: {t_x/t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
