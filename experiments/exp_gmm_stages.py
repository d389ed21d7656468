"""Sub-stage budget of the fused GMM at config2 scale (TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_stages.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.gmm_pallas as gp
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    kmeans_fused_t_xt,
)

B, N, D, K = 8, 154401, 39, 5
LOOP = 6


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} ~{(best*1e3-31.0)/LOOP:7.2f} ms/op real", flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    dp = 48
    block = _block_for_t(N, dp, 4)
    n_pad = -(-N // block) * block
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), jnp.float32)
    xt = jnp.zeros((B, dp, n_pad), jnp.float32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(x, 1, 2))
    xt = xt.at[:, D, :N].set(1.0)
    fence(xt)
    weights = jnp.full((B, K), 1.0 / K)
    means = jax.random.normal(jax.random.PRNGKey(1), (B, K, D))
    eye = jnp.eye(D)
    covs = jnp.broadcast_to(eye, (B, K, D, D)) + 0.1 * jnp.einsum(
        "bki,bkj->bkij", means, means)

    timeit("kmeans init (10 iters, on xt)", loop(
        lambda i, xt_: jnp.sum(kmeans_fused_t_xt(
            xt_ + i * jnp.float32(1e-12), K, D, N, 10)[1])
    ), xt)

    timeit("params->kernel inputs (chol+inv)", loop(
        lambda i, w, m, c: jnp.sum(gp._params_to_kernel_inputs(
            w, m, c + i * jnp.float32(1e-12), D, dp, K)[0])
    ), weights, means, covs)

    a, bias, const = jax.jit(
        lambda w, m, c: gp._params_to_kernel_inputs(w, m, c, D, dp, K)
    )(weights, means, covs)
    fence(a)

    timeit("one _em_pass", loop(
        lambda i, xt_, a_, b_, c_: jnp.sum(gp._em_pass(
            xt_, a_ + i * jnp.float32(1e-12), b_, c_, K, block, N, False,
            D)[2])
    ), xt, a, bias, const)

    timeit("full EM iter (inputs+pass+moments)", loop(
        lambda i, xt_, w, m, c: jnp.sum(gp._moments_to_params(
            *gp._em_pass(xt_, *gp._params_to_kernel_inputs(
                w, m, c + i * jnp.float32(1e-12), D, dp, K),
                K, block, N, False, D)[2:], D, N, K, 1e-4)[1])
    ), xt, weights, means, covs)

    timeit("gmm_fused_t_xt full (30 it, tol=0)", loop(
        lambda i, xt_: jnp.sum(gp.gmm_fused_t_xt(
            xt_ + i * jnp.float32(1e-12), K, D, N, 30, 1e-4, 10, 0.0))
    ), xt)


if __name__ == "__main__":
    main()
