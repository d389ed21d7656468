"""config2 tol-loop form A/B: while_loop vs fixed-count fori (VERDICT r3
task 7 follow-up to exp_config2_stages).

The round-4 stage split found config2's measured stages (features 1.25 +
assembly 1.31 + refine 0.98 + labels 0.58 + ~30x(glue 0.044 + pooled pass
~0.06)) sum to ~7 ms of the 19.3 ms e2e. The unaccounted ~12 ms can only
live in the EM tol loop's FORM: a data-dependent lax.while_loop whose body
is ~0.1 ms of real work, run ~28-30 times. This probe times the fused GMM
solver on a prebuilt transposed buffer in three forms:

  a) production: tol=1e-3 while_loop with per-image freezing
  b) tol=0 fori_loop, n_iter=30 (same max pass count, no condition)
  c) (if a-b is large) the fix: fori_loop over n_iter WITH the per-image
     freeze — bitwise identical to (a): a frozen image's params stop
     updating, so iterations past global convergence are no-ops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_loopform.py
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

from gabor_color_image_segmentation_tpu.benchmark import build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.pipeline import segment_batch
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 20
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / LOOP
    print(f"{name:44s} {ms:8.3f} ms/op", flush=True)
    return ms


def loop_jit(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    import dataclasses

    print("backend:", jax.default_backend(), flush=True)
    base = preset("config2").replace(dtype="bfloat16")
    bank = make_bank(base.bank)
    batch = jnp.asarray(build_batch(base, base.batch_size))
    fence(batch.astype(jnp.float32))

    variants = {
        "e2e tol=1e-3 while (production)": base,
        "e2e tol=0 fori (30 fixed)": base.replace(
            cluster=dataclasses.replace(base.cluster, gmm_tol=0.0)
        ),
    }
    labels = {}
    for name, cfg in variants.items():
        labels[name] = np.asarray(
            jax.jit(lambda r, c=cfg: segment_batch(r, c, bank, False)[0])(
                batch
            )
        )
        timeit(name, loop_jit(
            lambda i, r, c=cfg: jnp.sum(
                segment_batch(r + i.astype(r.dtype), c, bank, False)[0]
            )
        ), batch)
    a, b = labels.values()
    print(f"label agreement while-vs-fori: {(a == b).mean():.6f}",
          flush=True)


if __name__ == "__main__":
    main()
