"""v3 transposed fused Lloyd vs plain-XLA kmeans on TPU (config1 shapes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lloyd_t.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gabor_color_image_segmentation_tpu.models.kmeans_pallas as kp
from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_batch


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fence(out[0])  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3 - 31.0:8.1f} ms real", flush=True)
    return out


def make_blobs(b, n, d, k, dtype, noise_scale=0.8):
    key = jax.random.PRNGKey(0)
    kc, kl, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (b, k, d)) * 3.0
    labels = jax.random.randint(kl, (b, n), 0, k)
    noise = jax.random.normal(kn, (b, n, d)) * noise_scale
    x = jnp.take_along_axis(centers, labels[..., None], axis=1) + noise
    return x.astype(dtype)


def main():
    print("backend:", jax.default_backend(), flush=True)
    b, n, d, k = 16, 154401, 243, 5
    for dtype in (jnp.bfloat16, jnp.float32):
        # overlapping clusters: Lloyd keeps moving for the full 25 iterations,
        # so per-iteration cost dominates the fixed init/transpose overhead
        x = make_blobs(b, n, d, k, dtype, noise_scale=6.0)
        fence(x)
        print(f"--- dtype {dtype.__name__}  ({b}x{n}x{d}, k={k})")
        l0, _ = timeit("XLA kmeans_batch", kmeans_batch, x, k, 25, dtype)
        for blk in (1024, 2048, 4096):
            orig = kp._block_for_t
            kp._block_for_t = lambda *_a, _b=blk: _b
            kp.kmeans_fused_t.clear_cache()  # block is a trace-time constant
            try:
                l1, _ = timeit(
                    f"fused_t block={blk}",
                    lambda xx: kp.kmeans_fused_t(xx, k, 25, dtype), x
                )
                agree = float((l0 == l1).mean())
                print(f"    label agreement vs XLA: {agree:.6f}", flush=True)
            finally:
                kp._block_for_t = orig


if __name__ == "__main__":
    main()
