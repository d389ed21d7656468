"""Isolate the config3 graph-stage glue on TPU: the pieces of
enforce_connectivity_device and the table lookup at config3 scale
(batch 8, 481x321, n_sp=384, heavily fragmented real SLIC labels).

CSE note: loop-varying perturbations must not be constant-foldable —
``x + 0 * i`` hoists the whole body out of the timing loop (measured:
"-0.2 ms/op"). Every probe here adds ``jnp.minimum(i, 0)`` (always 0,
but XLA cannot fold it without range analysis) to an int input.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_connectivity_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.models.slic import (
    _pass_extreme,
    connected_components,
    enforce_connectivity_device,
    grid_shape,
)
from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused
from gabor_color_image_segmentation_tpu.ops.lookup import table_lookup

LOOP = 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - 31.0) / LOOP
    print(f"{name:44s} ~{per:6.2f} ms/op real", flush=True)


def loop(fn):
    """fn(j, *args) -> scalar; j = jnp.minimum(i, 0) (0, not foldable)."""

    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(jnp.minimum(i, 0), *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))

    return run


def main():
    cfg = preset("config3").replace(dtype="bfloat16")
    g = cfg.graph
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=50 + i)[0]
         for i in range(cfg.batch_size)]
    )
    rgb = jnp.asarray(imgs)
    b, h, w, _ = rgb.shape
    n = h * w
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    fence(lab)
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    n_sp = gh * gw
    sp = jax.jit(
        lambda l: slic_fused(l, g.n_superpixels, g.slic_compactness,
                             g.slic_iters)
    )(lab)
    fence(sp.astype(jnp.float32))
    comp = jax.jit(connected_components)(sp)
    fence(comp.astype(jnp.float32))
    ncomp = [len(np.unique(np.asarray(comp[i]))) for i in range(b)]
    print(f"raw SLIC components/image: {ncomp} (n_sp={n_sp})")

    timeit("one CC sweep (_pass_extreme min)", loop(
        lambda j, s: jnp.sum(_pass_extreme(
            jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32).reshape(1, h, w), (b, h, w)
            ) + j, s, "min"))
    ), sp)
    timeit("connected_components (fixpoint)", loop(
        lambda j, s: jnp.sum(connected_components(s + j))
    ), sp)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    timeit("counts scatter-add (N bins)", loop(
        lambda j, c: jnp.sum(
            jnp.zeros((b, n), jnp.int32).at[bidx, c.reshape(b, n) + j].add(1)
        )
    ), comp)
    timeit("enforce_connectivity_device", loop(
        lambda j, s: jnp.sum(enforce_connectivity_device(s + j, n_sp))
    ), sp)
    sp_c = jax.jit(lambda s: enforce_connectivity_device(s, n_sp))(sp)
    fence(sp_c.astype(jnp.float32))
    regions = jnp.asarray(
        np.random.default_rng(0).integers(0, g.n_regions, (b, n_sp)),
        jnp.int32,
    )
    timeit("table_lookup region->pixel", loop(
        lambda j, s, r: jnp.sum(table_lookup(s.reshape(b, n) + j, r))
    ), sp_c, regions)


if __name__ == "__main__":
    main()
