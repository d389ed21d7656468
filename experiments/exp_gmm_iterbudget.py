"""config2 per-EM-iteration budget decomposition at round-5 HEAD
(VERDICT r4 task 3: before fusing the three per-iteration program
boundaries into one launch, measure what they actually cost NOW).

Method: SLOPES, not absolute timings — T(n_iter=28) - T(n_iter=8) over 20
iterations cancels the ~31 ms tunnel fence, the one-time assembly/init and
the final label pass exactly. Variants:

  A. full production solver (gmm_fused_t, fit_pool=2, refine=1,
     tol=1e-30 so the per-image freeze path runs but never triggers) —
     the production per-iteration cost.
  B. glue-only loop: _params_to_kernel_inputs (Pallas chol launch + the
     bias/const XLA fusion) iterated with a non-foldable SPD salt.
  C. EM-pass-only loop: _em_pass on the production-pooled buffer with a
     non-foldable salt on A.
  D. prep-only loop: _moments_to_params iterated (tiny XLA fusion).

boundary/overlap residual = A - B - C - D. If the residual is < ~0.05
ms/iter the remaining lever VERDICT names (one kernel per tol iteration)
has nothing left to win — record the floor analysis instead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_iterbudget.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
    _em_pass,
    _moments_to_params,
    _params_to_kernel_inputs,
    gmm_fused_t,
)
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    build_xt,
)
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

B, H, W, D, K = 8, 321, 481, 39, 5
N = H * W
REPS = 8


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.int32
                         else x))


def timed(fn, *args):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out if not isinstance(out, tuple) else out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)

    # ---- A: full solver slope ----------------------------------------
    def solver(n_iter):
        return jax.jit(
            lambda xx: gmm_fused_t(
                xx, K, n_iter=n_iter, tol=1e-30, hw=(H, W), fit_pool=2,
                refine_iters=1,
            )
        )

    s8, s28 = solver(8), solver(28)
    fence(s8(x)); fence(s28(x))  # compile
    t8, t28 = timed(s8, x), timed(s28, x)
    slope_a = (t28 - t8) / 20.0
    print(f"A full solver: T(8)={t8*1e3:.2f} T(28)={t28*1e3:.2f} ms "
          f"-> {slope_a*1e3:.3f} ms/iter", flush=True)

    # shared small inputs for the part loops
    from gabor_color_image_segmentation_tpu.models.gmm import gmm_fit_levels
    from gabor_color_image_segmentation_tpu.models.kmeans import pool2x2

    hp, wp, lv = gmm_fit_levels(H, W, 2)
    m = hp * wp
    fx = x
    h_, w_ = H, W
    for _ in range(lv):
        fx = pool2x2(fx, h_, w_)
        h_, w_ = h_ // 2, w_ // 2
    fit_xp = build_xt(fx, jnp.bfloat16)
    _, dp, n_pad = fit_xp.shape
    block_f = _block_for_t(m, dp, 2)

    base = np.einsum("bnd,bne->bde", np.asarray(fx, np.float64),
                     np.asarray(fx, np.float64)) / m
    covs0 = jnp.asarray(
        np.broadcast_to(base[:, None], (B, K, D, D))
        + 1e-2 * np.eye(D), jnp.float32)
    weights0 = jnp.full((B, K), 1.0 / K, jnp.float32)
    means0 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)

    # ---- B: glue-only (chol launch + bias/const fusion) ---------------
    @jax.jit
    def glue_loop(covs, n_iter):
        eye = jnp.eye(D, dtype=jnp.float32)

        def body(i, acc):
            c = covs + (1e-9 * (i + 1).astype(jnp.float32)) * eye
            a, bias, const = _params_to_kernel_inputs(
                weights0, means0, c, D, dp, K)
            return acc + jnp.sum(a) + jnp.sum(bias) + jnp.sum(const)

        return lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    fence(glue_loop(covs0, 8)); fence(glue_loop(covs0, 28))
    g8 = timed(glue_loop, covs0, 8)
    g28 = timed(glue_loop, covs0, 28)
    slope_b = (g28 - g8) / 20.0
    print(f"B glue-only: {slope_b*1e3:.3f} ms/iter", flush=True)

    # ---- C: EM-pass-only on the pooled buffer ------------------------
    a0, bias0, const0 = _params_to_kernel_inputs(
        weights0, means0, covs0, D, dp, K)

    @jax.jit
    def em_loop(a, n_iter):
        def body(i, acc):
            ai = a + 1e-9 * (i + 1).astype(jnp.float32)
            labels, ll, msums, covs = _em_pass(
                fit_xp, ai, bias0, const0, K, block_f, m, False, D)
            return acc + jnp.sum(ll) + jnp.sum(covs)

        return lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    fence(em_loop(a0, 8)); fence(em_loop(a0, 28))
    e8, e28 = timed(em_loop, a0, 8), timed(em_loop, a0, 28)
    slope_c = (e28 - e8) / 20.0
    print(f"C EM-pass-only: {slope_c*1e3:.3f} ms/iter", flush=True)

    # ---- D: prep-only (_moments_to_params) ---------------------------
    msums0 = jnp.zeros((B, 8, dp), jnp.float32).at[:, :K, :D].set(
        jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32) + 5.0)
    msums0 = msums0.at[:, :K, D].set(float(m) / K)
    covsc = jnp.asarray(
        np.broadcast_to((base * m / K)[:, None], (B, K, D, D)),
        jnp.float32)
    covsp = jnp.zeros((B, K, dp, dp), jnp.float32).at[:, :, :D, :D].set(
        covsc)

    @jax.jit
    def prep_loop(ms, n_iter):
        def body(i, acc):
            msi = ms + 1e-9 * (i + 1).astype(jnp.float32)
            w_, mu, cv = _moments_to_params(msi, covsp, D, m, K, 1e-4)
            return acc + jnp.sum(w_) + jnp.sum(mu) + jnp.sum(cv)

        return lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    fence(prep_loop(msums0, 8)); fence(prep_loop(msums0, 28))
    p8, p28 = timed(prep_loop, msums0, 8), timed(prep_loop, msums0, 28)
    slope_d = (p28 - p8) / 20.0
    print(f"D prep-only: {slope_d*1e3:.3f} ms/iter", flush=True)

    resid = slope_a - slope_b - slope_c - slope_d
    print(f"\nper-iteration budget: full {slope_a*1e3:.3f} = "
          f"glue {slope_b*1e3:.3f} + EM {slope_c*1e3:.3f} + "
          f"prep {slope_d*1e3:.3f} + boundary/overlap residual "
          f"{resid*1e3:.3f} ms", flush=True)
    print(f"(x28 iterations: residual total {resid*28*1e3:.2f} ms of the "
          f"e2e budget)")


if __name__ == "__main__":
    main()
