"""config1 CHW-path stage budget on TPU (the relayout-free production path).

Unlike exp_config1_t_stages.py (whose ``i * 0`` perturbations constant-fold
and let XLA hoist the body out of the timing loop), every stage here
multiplies its input by (1 + i * 1e-6) with the loop index i — a real data
dependence, so each fori_loop iteration re-executes the full stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_chw_budget.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
    _affine_params,
    build_color4,
    kmeans_fused_chw,
)
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    _segment_batch_transposed,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import _pool2x2_cm
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 6
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
    print(f"{name:46s} ~{(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op real", flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def perturb(x, i, scale=1e-6):
    return x * (1.0 + i.astype(jnp.float32) * scale).astype(x.dtype)


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    fence(rgb.astype(jnp.float32))
    cc = cfg.cluster

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    energies_cm = jax.jit(
        lambda l: gabor_energies_fused(l, bank, jnp.bfloat16, channel_major=True)
    )(lab)
    fence(energies_cm)
    xc4 = jax.jit(lambda c: build_color4(c, jnp.bfloat16))(lab)
    fence(xc4)
    affine = jax.jit(lambda e, c: _affine_params(e, c, cc, 1e-6))(
        energies_cm, xc4
    )
    fence(affine[0])

    timeit("energies_cm (fused kernel)", loop(
        lambda i, l: jnp.sum(
            gabor_energies_fused(
                perturb(l, i), bank, jnp.bfloat16, channel_major=True
            ).astype(jnp.float32)
        )
    ), lab)

    timeit("color4 + affine (moments)", loop(
        lambda i, ec, l: sum(
            jnp.sum(t.astype(jnp.float32))
            for t in _affine_params(
                perturb(ec, i), build_color4(perturb(l, i), jnp.bfloat16),
                cc, 1e-6,
            )
        )
    ), energies_cm, lab)

    timeit("pool2x2 (energies + color4)", loop(
        lambda i, ec, c4: jnp.sum(
            _pool2x2_cm(perturb(ec, i)).astype(jnp.float32)
        ) + jnp.sum(_pool2x2_cm(perturb(c4, i)).astype(jnp.float32))
    ), energies_cm, xc4)

    timeit("solver chw multigrid (prebuilt inputs)", loop(
        lambda i, ec, c4, a_, b_: jnp.sum(
            kmeans_fused_chw(
                perturb(ec, i), c4, (a_, b_), cc.k, cc.n_iter,
                cc.coarse_iters, cc.refine_iters,
            )[0].astype(jnp.float32)
        )
    ), energies_cm, xc4, affine[0], affine[1])

    timeit("e2e chw (rgb -> labels)", loop(
        lambda i, r: jnp.sum(
            _segment_batch_transposed(
                perturb(r.astype(jnp.float32), i, 1e-5), cfg, bank
            ).astype(jnp.float32)
        )
    ), rgb)


if __name__ == "__main__":
    main()
