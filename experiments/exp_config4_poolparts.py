"""config4 pool+assemble decomposition (VERDICT r4 task 6, measurement
first): the post-fix sub-stage probe charged 321.8 ms standalone to
"pool+assemble incl. energies" (energies alone 108.5) — ~213 ms for two
NHWC 2x2 pools + feature assembly, far above the ~3 ms HBM floor of a
1.9 GB read. Where does it go?

Rows (standalone jits, batch 4 at 2160x3840, bf16, loop-amortized):
  1. tiled NHWC energies                           (the 108.5 reference)
  2. energies + 1 NHWC pool level
  3. energies + 2 NHWC pool levels
  4. energies + 2 pools + assemble_features        (the 321.8 reference)
  5. pools alone on a PRE-MATERIALIZED energies tensor (isolates the
     pooling from any fusion-with-producer effect)
  6. assemble alone on pre-pooled inputs
  7. the fused kernel's in-kernel 2x2 twin at one 432x768 window, NHWC
     vs channel_major+pooled (is a kernel-emitted first level cheaper
     than pooling the NHWC output?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config4_poolparts.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.benchmark import build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    _pool2x2_nhwc,
    compute_energies,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import assemble_features
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 5
B = 4


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
    print(f"{name:44s} ~{per:7.2f} ms/op real", flush=True)
    return per


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0))

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config4").replace(batch_size=B, dtype="bfloat16")
    bank = make_bank(cfg.bank)
    rgb = jnp.asarray(build_batch(cfg, B))
    fence(rgb.astype(jnp.float32))

    def energies(i, r):
        e, c = compute_energies(r + i.astype(r.dtype), cfg, bank)
        return jnp.sum(e.astype(jnp.float32))

    def epool(i, r, levels):
        e, c = compute_energies(r + i.astype(r.dtype), cfg, bank)
        for _ in range(levels):
            e = _pool2x2_nhwc(e)
        return jnp.sum(e.astype(jnp.float32))

    def full(i, r):
        e, c = compute_energies(r + i.astype(r.dtype), cfg, bank)
        lab = c
        for _ in range(2):
            e = _pool2x2_nhwc(e)
            c = _pool2x2_nhwc(c)
        f = assemble_features(e, c, cfg.cluster)
        return jnp.sum(f.astype(jnp.float32))

    timeit("1 energies (tiled NHWC)", loop(energies), rgb)
    timeit("2 energies + pool x1", loop(lambda i, r: epool(i, r, 1)), rgb)
    timeit("3 energies + pool x2", loop(lambda i, r: epool(i, r, 2)), rgb)
    timeit("4 energies + pools + assemble", loop(full), rgb)

    e0, c0 = jax.jit(lambda r: compute_energies(r, cfg, bank))(rgb)
    fence(e0)

    def pools_only(i, e):
        e = e + i.astype(e.dtype) * jnp.asarray(1e-3, e.dtype)
        for _ in range(2):
            e = _pool2x2_nhwc(e)
        return jnp.sum(e.astype(jnp.float32))

    timeit("5 pools alone (pre-materialized)", loop(pools_only), e0)

    ep = jax.jit(
        lambda e: _pool2x2_nhwc(_pool2x2_nhwc(e))
    )(e0)
    cp = jax.jit(
        lambda c: _pool2x2_nhwc(_pool2x2_nhwc(c))
    )(c0)
    fence(ep)
    fence(cp)

    def asm_only(i, e, c):
        f = assemble_features(
            e + i.astype(e.dtype) * jnp.asarray(1e-3, e.dtype), c,
            cfg.cluster)
        return jnp.sum(f.astype(jnp.float32))

    timeit("6 assemble alone (pre-pooled)", loop(asm_only), ep, cp)

    # 7: one window, NHWC vs kernel-emitted CM twin
    win = jax.jit(lambda r: _color_transform(r, "lab"))(
        rgb[:, :432, :768])
    fence(win)

    def w_nhwc(i, c):
        e = gabor_energies_fused(c + i * 1e-6, bank, jnp.bfloat16)
        return jnp.sum(_pool2x2_nhwc(e).astype(jnp.float32))

    def w_cm_twin(i, c):
        e, p = gabor_energies_fused(
            c + i * 1e-6, bank, jnp.bfloat16, channel_major=True,
            pooled=True)
        return jnp.sum(p.astype(jnp.float32))

    timeit("7a window NHWC energies + pool x1", loop(w_nhwc), win)
    timeit("7b window CM energies + in-kernel twin", loop(w_cm_twin), win)


if __name__ == "__main__":
    main()
