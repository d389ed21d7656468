"""Fused-Lloyd v2 vs plain-XLA kmeans on the real TPU (config1 shapes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_fused_lloyd.py
"""

import time

import jax
import jax.numpy as jnp

B, N, D, K, ITERS = 16, 154401, 243, 5, 25
DTYPE = jnp.bfloat16


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.1f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_x():
        base = jax.random.normal(key, (B, 1, D), jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.float32)
        # clustered-ish data so Lloyd behaves like the real workload
        mode = (jax.random.uniform(jax.random.PRNGKey(2), (B, N, 1)) * 5).astype(
            jnp.int32
        )
        return (base * 0 + noise * 0.3 + mode.astype(jnp.float32)).astype(DTYPE)

    x = make_x()
    fence(x)

    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import kmeans_fused

    @jax.jit
    def xla_path(x):
        return jax.vmap(lambda f: kmeans(f, K, ITERS, DTYPE)[0])(x)

    @jax.jit
    def fused_path(x):
        return kmeans_fused(x, K, ITERS, DTYPE)[0]

    la = xla_path(x)
    lb = fused_path(x)
    agree = float(jnp.mean((la == lb).astype(jnp.float32)))
    print(f"label agreement fused vs xla: {agree:.6f}", flush=True)

    timeit("xla vmapped kmeans (25 it)", xla_path, x)
    timeit("fused pallas kmeans (25 it)", fused_path, x)


if __name__ == "__main__":
    main()
