"""Connectivity-kernel Jacobi chain depth sweep (VERDICT r3 task 6 lever:
"deeper Jacobi chaining"). Times enforce_connectivity_fused on REAL fused-
SLIC output at config3 geometry for _BFS_UNROLL in {8, 16, 32} —
loop-amortized, non-foldable salt. Outputs must stay bit-identical across
depths (chaining over-steps idempotent no-op sweeps only).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_conn_unroll.py
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

import gabor_color_image_segmentation_tpu.models.connectivity_pallas as cp
from gabor_color_image_segmentation_tpu.benchmark import build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
)
from gabor_color_image_segmentation_tpu.models.slic import grid_shape
from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch

LOOP = 50
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / LOOP
    print(f"{name:40s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config3").replace(dtype="bfloat16")
    batch = jnp.asarray(build_batch(cfg, cfg.batch_size))
    g = cfg.graph
    b, h, w, _ = batch.shape
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    n_sp = gh * gw

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(batch)
    sp = jax.jit(
        lambda l: slic_batch(l, g.n_superpixels, g.slic_compactness,
                             g.slic_iters)
    )(lab)
    fence(sp)

    outs = {}
    for unroll in (8, 16, 32):
        cp._BFS_UNROLL = unroll
        jax.clear_caches()

        def run(s):
            @jax.jit
            def inner(s):
                def body(i, acc):
                    # salt: compare against a value that never occurs —
                    # not constant-foldable, labels unchanged
                    ss = jnp.where(s == -1 - i, 0, s)
                    return acc + jnp.sum(
                        cp.enforce_connectivity_fused(ss, n_sp)
                    )
                return lax.fori_loop(0, LOOP, body, jnp.int32(0))
            return inner(s)

        outs[unroll] = np.asarray(
            jax.jit(lambda s: cp.enforce_connectivity_fused(s, n_sp))(sp)
        )
        timeit(f"connectivity unroll={unroll}", run, sp)

    for u in (16, 32):
        same = (outs[u] == outs[8]).all()
        print(f"unroll {u} vs 8 bit-equal: {same}", flush=True)


if __name__ == "__main__":
    main()
