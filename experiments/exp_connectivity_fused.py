"""Validate + time the Pallas connectivity kernel on the real TPU at
config3 scale (batch 8, 481x321, real fragmented SLIC labels).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_connectivity_fused.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
    enforce_connectivity_fused,
)
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.models.slic import (
    enforce_connectivity_device,
    grid_shape,
)
from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

LOOP = 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config3").replace(dtype="bfloat16")
    g = cfg.graph
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=50 + i)[0]
         for i in range(cfg.batch_size)]
    )
    rgb = jnp.asarray(imgs)
    b, h, w, _ = rgb.shape
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    n_sp = gh * gw
    sp = jax.jit(
        lambda l: slic_fused(l, g.n_superpixels, g.slic_compactness,
                             g.slic_iters)
    )(lab)
    fence(sp.astype(jnp.float32))

    # bit-equality vs the XLA pass on the REAL fragmented labels
    a = np.asarray(
        jax.jit(lambda s: enforce_connectivity_device(s, n_sp))(sp)
    )
    t0 = time.perf_counter()
    bres = np.asarray(
        jax.jit(lambda s: enforce_connectivity_fused(s, n_sp))(sp)
    )
    print(f"fused first call (compile): {time.perf_counter() - t0:.1f}s")
    eq = (a == bres).all()
    print(f"bit-equal vs XLA pass: {eq}"
          f" (ids xla {a.max() + 1}, fused {bres.max() + 1})")
    if not eq:
        d = np.argwhere(a != bres)
        print("first diffs:", d[:5])
        return

    # amortized timing (loop in jit; CSE defeated by min(i,0) int add)
    @jax.jit
    def run(s):
        def body(i, acc):
            out = enforce_connectivity_fused(s + jnp.minimum(i, 0), n_sp)
            return acc + jnp.sum(out)
        return lax.fori_loop(0, LOOP, body, jnp.int32(0))

    fence(run(sp))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(sp))
        best = min(best, time.perf_counter() - t0)
    print(f"enforce_connectivity_fused ~{(best * 1e3 - 31.0) / LOOP:6.2f} "
          f"ms/op real (batch {b})")


if __name__ == "__main__":
    main()
