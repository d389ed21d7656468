"""Micro-probe: where do config4+cut's ~1.7 s of pool+assemble go?

exp_config4_cut_stages measured: energies(full-res tiled) ~108 ms/op but
energies+pool(2x)+assemble ~1820 ms/op at (4, 2160, 3840, 72) bf16 — the
pooling/assembly of the NHWC energies costs ~16x the feature kernel
itself. This probe times each piece in isolation on device buffers:

    _pool2x2_nhwc round 1        (4, 2160, 3840, 72) -> (4, 1080, 1920, 72)
    _pool2x2_nhwc round 2        -> (4, 540, 960, 72)
    assemble_features @pooled    (4, 540, 960, 75)
    reduce_window variant        (numerical cross-check + timing)
    channel-major pooling matmul variant (reference: the fast path's trick)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_pool_nhwc.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.models.pipeline import _pool2x2_nhwc
from gabor_color_image_segmentation_tpu.ops.features import assemble_features
from gabor_color_image_segmentation_tpu.config import preset

LOOP = 5


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=2):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - 31.0) / LOOP
    print(f"{name:44s} ~{per:8.2f} ms/op real", flush=True)
    return per


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def pool_rw(x):
    """reduce_window f32 block mean (order-unspecified adds) for timing."""
    xf = x.astype(jnp.float32)
    s = lax.reduce_window(xf, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                          "VALID")
    return (s * 0.25).astype(x.dtype)


def main():
    print(jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    b, h, w, c = 4, 2160, 3840, 72
    x = (jax.random.normal(key, (b, h, w, c)) * 10).astype(jnp.bfloat16)
    fence(x)

    timeit("pool2x2 nhwc round1 (2160x3840x72)", loop(
        lambda i, v: jnp.sum(
            _pool2x2_nhwc(v + i.astype(v.dtype))[:, ::4, ::4].astype(
                jnp.float32)
        )
    ), x)

    x1 = jax.jit(_pool2x2_nhwc)(x)
    fence(x1.astype(jnp.float32))
    timeit("pool2x2 nhwc round2 (1080x1920x72)", loop(
        lambda i, v: jnp.sum(
            _pool2x2_nhwc(v + i.astype(v.dtype))[:, ::4, ::4].astype(
                jnp.float32)
        )
    ), x1)

    timeit("reduce_window round1 (2160x3840x72)", loop(
        lambda i, v: jnp.sum(
            pool_rw(v + i.astype(v.dtype))[:, ::4, ::4].astype(jnp.float32)
        )
    ), x)

    a = np.asarray(jax.jit(_pool2x2_nhwc)(x1)).astype(np.float32)
    bb = np.asarray(jax.jit(pool_rw)(x1)).astype(np.float32)
    rel = np.abs(a - bb).max() / max(np.abs(a).max(), 1e-9)
    print(f"reduce_window vs per-slice pool rel err: {rel:.2e}", flush=True)

    x2 = jax.jit(_pool2x2_nhwc)(x1)
    color = (jax.random.normal(key, (b, 540, 960, 3)) * 10).astype(
        jnp.bfloat16)
    fence(x2.astype(jnp.float32))
    fence(color.astype(jnp.float32))
    ccfg = preset("config4").cluster
    timeit("assemble_features @540x960", loop(
        lambda i, e, col: jnp.sum(
            assemble_features(e + i.astype(e.dtype), col, ccfg).astype(
                jnp.float32)
        )
    ), x2, color)


if __name__ == "__main__":
    main()
