"""Where do kmeans_fused_t's fixed costs come from? n_iter sweep (TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_fused_t_gap.py
"""

import time

import jax
import jax.numpy as jnp

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3-31.0:8.1f} ms real", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    b, n, d, k = 16, 154401, 243, 5
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, d)).astype(dtype)
    fence(x)
    for n_iter in (1, 5, 13, 25):
        timeit(f"kmeans_fused_t n_iter={n_iter}",
               lambda xx, ni=n_iter: kp.kmeans_fused_t(xx, k, ni, dtype), x)


if __name__ == "__main__":
    main()
