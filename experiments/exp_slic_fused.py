"""Fused banded SLIC vs XLA SLIC + graph-stage timing on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_slic_fused.py
"""

import time

import jax
import jax.numpy as jnp

B, H, W = 8, 321, 481
N_SP, RULER, ITERS = 400, 10.0, 10


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
    from gabor_color_image_segmentation_tpu.models.slic import slic
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_lab():
        base = jax.random.uniform(key, (B, H // 32 + 1, W // 32 + 1, 3)) * 80
        up = jax.image.resize(base, (B, H, W, 3), "linear")
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)) * 2.0
        return up + noise

    lab = make_lab()
    fence(lab)

    @jax.jit
    def xla_path(lab):
        return jax.vmap(lambda l: slic(l, N_SP, RULER, ITERS))(lab).astype(
            jnp.float32
        )

    @jax.jit
    def fused_path(lab):
        return slic_fused(lab, N_SP, RULER, ITERS).astype(jnp.float32)

    a = xla_path(lab)
    b = fused_path(lab)
    agree = float(jnp.mean((a == b).astype(jnp.float32)))
    print(f"label agreement fused vs xla: {agree:.6f}", flush=True)

    timeit("xla slic (10 it)", xla_path, lab)
    timeit("fused banded slic (10 it)", fused_path, lab)


if __name__ == "__main__":
    main()
