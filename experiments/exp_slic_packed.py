"""Packed-contraction SLIC kernel vs previous 5-matmul version, plus a
micro-timing of the region gather (suspected ~10 ms of config3's glue).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_slic_packed.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LOOP = 10
B, H, W = 8, 321, 481
N_SP, RULER, ITERS = 400, 10.0, 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} ~{(best*1e3-31.0)/LOOP:6.2f} ms/op real", flush=True)


def main():
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape, slic
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_lab():
        base = jax.random.uniform(key, (B, 11, 16, 3)) * 80
        up = jax.image.resize(base, (B, H, W, 3), "linear")
        return up + jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)) * 2.0

    lab = make_lab()
    fence(lab)

    def loop(fn):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + fn(i, *args)
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))
        return run

    timeit("slic_fused packed (10 it)", loop(
        lambda i, l: jnp.sum(
            slic_fused(l + i * 1e-6, N_SP, RULER, ITERS).astype(jnp.float32)
        )
    ), lab)

    # agreement vs XLA exact path
    a = jax.jit(jax.vmap(lambda l: slic(l, N_SP, RULER, ITERS)))(lab)
    bt = slic_fused(lab, N_SP, RULER, ITERS)
    agree = float(jnp.mean((a == bt).astype(jnp.float32)))
    print(f"packed fused vs XLA(HIGHEST) agreement: {agree:.5f}", flush=True)

    # region-gather micro-benchmark: (B, H, W) int32 indices into (S,)
    gh, gw, _ = grid_shape(H, W, N_SP)
    n_sp = gh * gw
    sp = bt
    regions = jnp.arange(n_sp, dtype=jnp.int32) % 5

    timeit("regions[sp] pixel gather", loop(
        lambda i, s: jnp.sum(
            jax.vmap(lambda si: (regions + i)[si.reshape(-1)])(s).astype(
                jnp.float32
            )
        )
    ), sp)


if __name__ == "__main__":
    main()
