"""Per-iteration Lloyd cost: XLA step vs v3 transposed fused pass (TPU).

Fixed 24 chained iterations inside one jit (no early exit) — isolates the
per-iteration cost from init/transpose overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lloyd_t_iter.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp
from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)
from gabor_color_image_segmentation_tpu.ops.precision import precision_for

ITERS = 24


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    real = best * 1e3 - 31.0
    print(f"{name:44s} {real:8.1f} ms = {real/ITERS:6.2f} ms/iter", flush=True)


@functools.partial(jax.jit, static_argnums=(2, 3))
def xla_iters(x, c0, k: int, dtype):
    def step_img(x_img, centers):
        labels = jnp.argmin(_assign_scores(x_img, centers, dtype), axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=dtype)
        counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
        sums = jnp.dot(onehot.T, x_img, preferred_element_type=jnp.float32,
                       precision=precision_for(dtype))
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    def body(i, c):
        return jax.vmap(step_img)(x, c + i * jnp.float32(1e-12))

    return lax.fori_loop(0, ITERS, body, c0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fused_iters(xt, cpad, k: int, d: int, block: int):
    b, dp, n_pad = xt.shape

    def body(i, c):
        c = c + i * jnp.float32(1e-12)
        _, sums = kp._lloyd_t_pass(xt, c, k, block, n_pad, False)
        counts = sums[:, :, d]
        new = sums / jnp.maximum(counts, 1.0)[:, :, None]
        new = new.at[:, :, d].set(0.0)
        return jnp.where(counts[:, :, None] > 0, new, c)

    return lax.fori_loop(0, ITERS, body, cpad)


def main():
    print("backend:", jax.default_backend(), flush=True)
    b, n, d, k = 16, 154401, 243, 5
    for dtype in (jnp.bfloat16, jnp.float32):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, n, d)).astype(dtype)
        c0 = jax.vmap(lambda xi: maximin_init(xi, k))(x).astype(jnp.float32)
        fence(x); fence(c0)
        print(f"--- dtype {dtype.__name__}")
        timeit("XLA step x24", xla_iters, x, c0, k, dtype)
        sub = 16 if dtype == jnp.bfloat16 else 8
        dp = -(-(d + 1) // sub) * sub
        for block in (2048, 4096, 8192):
            n_pad = -(-n // block) * block
            xt = jnp.zeros((b, dp, n_pad), dtype)
            xt = xt.at[:, :d, :n].set(jnp.swapaxes(x, 1, 2))
            xt = xt.at[:, d, :n].set(1.0)
            cpad = jnp.zeros((b, kp._K_PAD, dp), jnp.float32).at[:, :k, :d].set(c0)
            fence(xt)
            timeit(f"fused_t pass x24 block={block}",
                   fused_iters, xt, cpad, k, d, block)


if __name__ == "__main__":
    main()
