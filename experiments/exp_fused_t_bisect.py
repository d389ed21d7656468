"""Bisect kmeans_fused_t's extra cost: while vs fori, init vs fixed (TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_fused_t_bisect.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp

B, N, D, K = 16, 154401, 243, 5
DTYPE = jnp.bfloat16
SUB = 16
DP = -(-(D + 1) // SUB) * SUB
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


def build_xt(x):
    xt = jnp.zeros((B, DP, NPAD), DTYPE)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(x, 1, 2))
    xt = xt.at[:, D, :N].set(1.0)
    return lax.optimization_barrier(xt)


def update(xt, c):
    labels, sums = kp._lloyd_t_pass(xt, c, K, BLOCK, N, False)
    counts = sums[:, :, D]
    new = sums / jnp.maximum(counts, 1.0)[:, :, None]
    new = new.at[:, :, D].set(0.0)
    new = jnp.where(counts[:, :, None] > 0, new, c)
    return labels, new


def solve_while(xt, cpad, n_iter):
    def cond(carry):
        return carry[3]

    def body(carry):
        t, c, _, _ = carry
        labels, upd = update(xt, c)
        new = jnp.where(t < n_iter, upd, c)
        return t + 1, new, labels, jnp.any(new != c)

    labels0 = jnp.zeros((B, NPAD), jnp.int32)
    _, c, labels, _ = lax.while_loop(cond, body, (jnp.int32(0), cpad, labels0, True))
    return labels, c


def solve_fori(xt, cpad, n_iter):
    def body(i, carry):
        c, _ = carry
        labels, new = update(xt, c + i * jnp.float32(1e-12))
        return new, labels

    labels0 = jnp.zeros((B, NPAD), jnp.int32)
    c, labels = lax.fori_loop(0, n_iter + 1, body, (cpad, labels0))
    return labels, c


@functools.partial(jax.jit, static_argnums=(1, 2))
def full(x, variant: str, use_init: bool):
    xt = build_xt(x)
    if use_init:
        c0 = kp._maximin_init_t(xt, K, N)
        cpad = jnp.zeros((B, kp._K_PAD, DP), jnp.float32).at[:, :K].set(c0)
        cpad = cpad.at[:, :, D].set(0.0)
    else:
        cpad = jnp.zeros((B, kp._K_PAD, DP), jnp.float32).at[:, :K, :D].set(
            jax.random.normal(jax.random.PRNGKey(1), (B, K, D))
        )
    solve = solve_while if variant == "while" else solve_fori
    labels, c = solve(xt, cpad, 25)
    return jnp.sum(labels[:, :N]) + jnp.sum(c)


def main():
    print("backend:", jax.default_backend(), "block", BLOCK, flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D)).astype(DTYPE)
    fence(x)
    for variant in ("fori", "while"):
        for use_init in (False, True):
            timeit(f"{variant:5s} init={use_init}",
                   lambda xx, v=variant, u=use_init: full(xx, v, u), x)


if __name__ == "__main__":
    main()
