"""Probe: cost of the in-VMEM sublane->lane merge (C, HB, 512) -> (C, HB*512).

Context (exp_chw_budget.py, 2026-08-17): the CHW Lloyd solver avoids the
(H, W) -> N relayout by paying an HB x MXU-waste block-diagonal dot — per
full pass ~4 ms vs the xt solver's 1.42 ms HBM floor. If Mosaic can merge
(HB, 512) sublane-rows into 8192 lanes cheaply INSIDE VMEM (512 = W padded
to the lane-tile multiple), a v2 CHW kernel gets zero-waste dots with no
HBM relayout: read the feature kernel's native (B, E, H, W) blocks, merge,
dot (k, E) @ (E, HB*512).

Three timings at config1 scale (B=16, E=240, H=321, W=481):
  A  XLA transpose baseline — the assemble relayout the xt path pays.
  B  Pallas repack kernel: (1, E, HB, 512) block -> reshape -> (1, E, 8192)
     out block. Pure relayout through VMEM; HBM floor would be ~2.9 ms.
  C  Pallas assignment-pass probe: same read + reshape, then a
     (K8, E) @ (E, 8192) score dot + unrolled argmin + one-hot update dots,
     writing labels only — the shape of a real Lloyd pass. Floor ~1.5 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lane_merge.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, E, H, W = 16, 240, 321, 481
WP = 512
HB = 16
K8 = 8
LOOP = 6
FENCE_MS = 31.0
NB = -(-H // HB)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} ~{(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op real", flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def perturb(x, i, scale=1e-6):
    return x * (1.0 + i.astype(jnp.float32) * scale).astype(x.dtype)


# --- B: repack kernel ------------------------------------------------------


def _repack_kernel(x_ref, o_ref, *, e, hb, w, wp):
    x = x_ref[0]  # (E, HB, W)
    if w != wp:
        x = jnp.concatenate(
            [x, jnp.zeros((e, hb, wp - w), x.dtype)], axis=2
        )
    o_ref[0] = x.reshape(e, hb * wp)


@jax.jit
def repack(x):
    b, e, h, w = x.shape
    kernel = functools.partial(_repack_kernel, e=e, hb=HB, w=w, wp=WP)
    return pl.pallas_call(
        kernel,
        grid=(b, NB),
        in_specs=[
            pl.BlockSpec((1, e, HB, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, e, HB * WP), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e, NB * HB * WP), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x)


# --- C: assignment-pass probe ---------------------------------------------


def _assign_kernel(x_ref, wc_ref, lbl_ref, ps_ref, *, e, hb, w, wp, k):
    x = x_ref[0]  # (E, HB, W)
    if w != wp:
        x = jnp.concatenate(
            [x, jnp.zeros((e, hb, wp - w), x.dtype)], axis=2
        )
    xm = x.reshape(e, hb * wp)  # sublane->lane merge
    s = jax.lax.dot_general(
        wc_ref[0], xm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K8, HB*WP)
    best = s[0]
    lbl = jnp.zeros((hb * wp,), jnp.int32)
    for kk in range(1, k):
        m = s[kk] < best
        lbl = jnp.where(m, jnp.int32(kk), lbl)
        best = jnp.where(m, s[kk], best)
    lbl_ref[0] = lbl.reshape(1, hb * wp)
    sub = jax.lax.broadcasted_iota(jnp.int32, (K8, hb * wp), 0)
    oh = (sub == lbl[None]).astype(xm.dtype)
    ps_ref[0, 0] = jax.lax.dot_general(
        oh, xm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def assign_pass(x, wc):
    b, e, h, w = x.shape
    kernel = functools.partial(
        _assign_kernel, e=e, hb=HB, w=w, wp=WP, k=5
    )
    return pl.pallas_call(
        kernel,
        grid=(b, NB),
        in_specs=[
            pl.BlockSpec((1, e, HB, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K8, e), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, HB * WP), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K8, e), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, NB, HB * WP), jnp.int32),
            jax.ShapeDtypeStruct((b, NB, K8, e), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * K8 * e * NB * HB * WP),
            bytes_accessed=int(x.dtype.itemsize * b * e * h * w),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, wc)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, E, H, W)), jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((B, K8, E)), jnp.bfloat16)
    fence(x)
    fence(wc)
    gb = B * E * H * W * 2 / 1e9
    print(f"tensor: {gb:.2f} GB bf16; HBM floor read-only ~{gb/0.89:.2f} ms")

    timeit("A xla transpose (B,E,H,W)->(B,E,N) relayout", loop(
        lambda i, t: jnp.sum(
            jnp.transpose(perturb(t, i), (0, 1, 2, 3))
            .reshape(B, E, H * W)[:, :, :: 7]
            .astype(jnp.float32)
        )
    ), x)

    timeit("A2 xla pad+merge (B,E,H,512)->(B,E,H*512)", loop(
        lambda i, t: jnp.sum(
            jnp.pad(perturb(t, i), ((0, 0), (0, 0), (0, 0), (0, WP - W)))
            .reshape(B, E, H * WP)[:, :, :: 7]
            .astype(jnp.float32)
        )
    ), x)

    timeit("B pallas repack (pad 512 + lane merge)", loop(
        lambda i, t: jnp.sum(repack(perturb(t, i))[:, :, ::7].astype(jnp.float32))
    ), x)

    timeit("C pallas assign pass (merge + 0-waste dots)", loop(
        lambda i, t: sum(
            jnp.sum(o.astype(jnp.float32)) for o in assign_pass(perturb(t, i), wc)
        )
    ), x)


if __name__ == "__main__":
    main()
