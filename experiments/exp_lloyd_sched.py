"""Lloyd loop scheduling variants: unrolling + labels-free loop (TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lloyd_sched.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp

B, N, D, K = 16, 154401, 243, 5
DTYPE = jnp.bfloat16
N_ITER = 25


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3-31.0:8.1f} ms real", flush=True)


def build(x):
    dp, n_pad, block = kp.xt_geometry(N, D, DTYPE)
    xt = jnp.zeros((B, dp, n_pad), DTYPE)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(x, 1, 2))
    xt = xt.at[:, D, :N].set(1.0)
    return xt, dp, n_pad, block


@jax.jit
def variant_a(x):  # production
    labels, centers = kp.kmeans_fused_t(x, K, N_ITER, DTYPE)
    return jnp.sum(labels) + jnp.sum(centers)


@jax.jit
def variant_bc(x):  # 2-iter unroll + labels-free loop + final labels pass
    xt, dp, n_pad, block = build(x)
    interpret = False
    centers0 = kp._maximin_init_t_fused(xt, K, N, block, interpret)
    cpad = jnp.zeros((B, kp._K_PAD, dp), jnp.float32).at[:, :K].set(centers0)
    cpad = cpad.at[:, :, D].set(0.0)

    def update(c):
        _, sums = kp._lloyd_t_pass(xt, c, K, block, N, interpret)
        counts = sums[:, :, D]
        new = sums / jnp.maximum(counts, 1.0)[:, :, None]
        new = new.at[:, :, D].set(0.0)
        return jnp.where(counts[:, :, None] > 0, new, c)

    def cond(carry):
        return carry[2]

    def body(carry):
        t, c, _ = carry
        c1 = update(c)
        c2 = update(c1)  # no-op once converged -> bitwise safe
        return t + 2, c2, (t + 2 < N_ITER) & jnp.any(c2 != c)

    _, centers, _ = lax.while_loop(cond, body, (jnp.int32(0), cpad, True))
    if N_ITER % 2:  # odd tail (static)
        centers = update(centers)
    labels, _ = kp._lloyd_t_pass(xt, centers, K, block, N, interpret)
    return jnp.sum(labels[:, :N]) + jnp.sum(centers)


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D)).astype(DTYPE)
    fence(x)
    timeit("A: production kmeans_fused_t (25 cap)", variant_a, x)
    timeit("BC: 2-iter unroll + labels-free", variant_bc, x)


if __name__ == "__main__":
    main()
