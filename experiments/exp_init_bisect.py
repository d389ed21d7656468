"""Bisect _maximin_init_t internals: which op eats the time? (TPU)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_init_bisect.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp

B, N, D, K = 16, 154401, 243, 5
DTYPE = jnp.bfloat16
DP = -(-(D + 1) // 16) * 16
BLOCK = kp._block_for_t(N, DP, 2)
NPAD = -(-N // BLOCK) * BLOCK


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


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D)).astype(DTYPE)
    xt = jnp.zeros((B, DP, NPAD), DTYPE)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(x, 1, 2))
    xt = xt.at[:, D, :N].set(1.0)
    xt = jax.block_until_ready(xt)
    fence(xt)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, NPAD), 1) < N

    @jax.jit
    def v_xsq(v):
        return jnp.sum(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=1))

    @jax.jit
    def v_mean(v):
        return jnp.sum(jnp.sum(v, axis=2, dtype=jnp.float32))

    @jax.jit
    def v_dist(v):
        xsq = jnp.sum(jnp.square(v.astype(jnp.float32)), axis=1)
        mean = (jnp.sum(v, axis=2, dtype=jnp.float32) / N).astype(v.dtype)
        cf = mean.astype(jnp.float32)
        cross = jnp.sum(v.astype(jnp.float32) * cf[:, :, None], axis=1)
        d2 = jnp.where(valid, xsq - 2 * cross + jnp.sum(cf * cf, axis=1, keepdims=True), -jnp.inf)
        return jnp.sum(d2[:, :N])

    @jax.jit
    def v_argmax(v):
        xsq = jnp.sum(jnp.square(v.astype(jnp.float32)), axis=1)
        mean = (jnp.sum(v, axis=2, dtype=jnp.float32) / N).astype(v.dtype)
        cf = mean.astype(jnp.float32)
        cross = jnp.sum(v.astype(jnp.float32) * cf[:, :, None], axis=1)
        d2 = jnp.where(valid, xsq - 2 * cross + jnp.sum(cf * cf, axis=1, keepdims=True), -jnp.inf)
        return jnp.sum(jnp.argmax(d2, axis=1))

    @jax.jit
    def v_gather(v):
        xsq = jnp.sum(jnp.square(v.astype(jnp.float32)), axis=1)
        mean = (jnp.sum(v, axis=2, dtype=jnp.float32) / N).astype(v.dtype)
        cf = mean.astype(jnp.float32)
        cross = jnp.sum(v.astype(jnp.float32) * cf[:, :, None], axis=1)
        d2 = jnp.where(valid, xsq - 2 * cross + jnp.sum(cf * cf, axis=1, keepdims=True), -jnp.inf)
        idx = jnp.argmax(d2, axis=1)
        c = jnp.take_along_axis(v, idx[:, None, None], axis=2)[..., 0]
        return jnp.sum(c.astype(jnp.float32))

    @jax.jit
    def v_full(v):
        return jnp.sum(kp._maximin_init_t(v, K, N))

    timeit("xsq pass", v_xsq, xt)
    timeit("mean pass", v_mean, xt)
    timeit("xsq+mean+dist(mean)", v_dist, xt)
    timeit("... + argmax", v_argmax, xt)
    timeit("... + argmax + 1 gather", v_gather, xt)
    timeit("full init (k=5)", v_full, xt)


if __name__ == "__main__":
    main()
