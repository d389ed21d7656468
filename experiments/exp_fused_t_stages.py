"""Sub-stage budget of kmeans_fused_t at config1 scale (TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_fused_t_stages.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp

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
    b, n, d, k = 16, 154401, 243, 5
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, d)).astype(dtype)
    fence(x)
    sub = 16
    dp = -(-(d + 1) // sub) * sub
    block = kp._block_for_t(n, dp, 2)
    n_pad = -(-n // block) * block
    print(f"dp={dp} block={block} n_pad={n_pad}")

    def build_xt(xx):
        xt = jnp.zeros((b, dp, n_pad), dtype)
        xt = xt.at[:, :d, :n].set(jnp.swapaxes(xx, 1, 2))
        xt = xt.at[:, d, :n].set(1.0)
        return xt

    timeit("xt build (zeros + 2 sets)", loop(
        lambda i, xx: jnp.sum(build_xt(xx + i.astype(xx.dtype) * 0).astype(jnp.float32)[:, 0, :1])
    ), x)

    xt = jax.jit(build_xt)(x)
    fence(xt)

    timeit("maximin_init_t (k=5)", loop(
        lambda i, xt_: jnp.sum(kp._maximin_init_t(
            xt_ + i.astype(xt_.dtype) * 0, k, n).astype(jnp.float32))
    ), xt)

    cpad = jnp.zeros((b, kp._K_PAD, dp), jnp.float32)
    cpad = cpad.at[:, :k, :d].set(
        jax.random.normal(jax.random.PRNGKey(1), (b, k, d))
    )
    fence(cpad)

    @functools.partial(jax.jit, static_argnums=())
    def passes26(xt_, c0):
        def body(i, c):
            _, sums = kp._lloyd_t_pass(xt_, c + i * jnp.float32(1e-12), k, block, n, False)
            counts = sums[:, :, d]
            new = sums / jnp.maximum(counts, 1.0)[:, :, None]
            new = new.at[:, :, d].set(0.0)
            return jnp.where(counts[:, :, None] > 0, new, c)
        return lax.fori_loop(0, 26, body, c0)

    def t26(name):
        fence(passes26(xt, cpad))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(passes26(xt, cpad))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} ~{(best*1e3-31.0):7.2f} ms total ({(best*1e3-31.0)/26:5.2f}/iter)", flush=True)

    t26("26 lloyd passes")

    timeit("kmeans_fused_t full (25 cap)", loop(
        lambda i, xx: jnp.sum(kp.kmeans_fused_t(
            xx + i.astype(xx.dtype) * 0, k, 25, dtype)[0].astype(jnp.float32))
    ), x)


if __name__ == "__main__":
    main()
