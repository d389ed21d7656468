"""Tiled-vs-untiled flip decomposition (VERDICT r2 weak #3 — hold the
distributed path to PARITY.md's standard).

The tiled kmeans path differs from the single-chip run in exactly two
float-order places: (1) strip FEATURES (psum'd standardization moments +
per-strip conv accumulation order — pinned to ulp-level by
tests/test_tiling.py), and (2) the distributed LLOYD (psum'd maximin
scores and per-cluster moments vs single-dot reductions). This experiment
isolates them by crossing inputs and solvers:

  A. untiled feats -> untiled solver   (reference)
  B. tiled feats   -> untiled solver   (feature-ulp flips only)
  C. untiled feats -> distributed solver (solver-order flips only)
  D. tiled feats   -> distributed solver (the production tiled path)

and additionally checks whether the distributed maximin picks the SAME
seed pixels (seed flips move whole basins; score-ulp flips move single
border pixels).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     PYTHONPATH=/root/repo python experiments/exp_tiled_parity.py
"""

from __future__ import annotations

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gabor_color_image_segmentation_tpu.config import BankConfig, preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans import kmeans, maximin_init
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.parallel.sharding import (
    _shard_map_unchecked,
)
from gabor_color_image_segmentation_tpu.parallel.tiling import (
    _strip_features,
    kmeans_sharded,
)
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def main():
    devs = jax.devices()
    assert len(devs) >= 8, "needs the fake 8-device mesh"
    mesh = Mesh(np.asarray(devs[:8]), ("space",))
    cfg = preset("config0").replace(
        feature_impl="modulated",
        bank=BankConfig(scales=(2.0, 3.0), orientations=3, frequencies=None),
    )
    bank = make_bank(cfg.bank)
    k, n_iter = cfg.cluster.k, cfg.cluster.n_iter

    feat_fn = jax.jit(
        _shard_map_unchecked(
            lambda s: _strip_features(s, cfg, bank, "space"),
            mesh, P("space", None, None), P("space", None, None),
        )
    )

    def dist_solver(feats_hwd):
        h, w, d = feats_hwd.shape
        fn = jax.jit(
            _shard_map_unchecked(
                lambda f: kmeans_sharded(
                    f.reshape(-1, d), k, n_iter, "space",
                    cfg.cluster.init_stride,
                )[0].reshape(f.shape[0], w),
                mesh, P("space", None, None), P("space", None),
            )
        )
        return np.asarray(fn(feats_hwd)).reshape(-1)

    def dist_centers(feats_hwd):
        h, w, d = feats_hwd.shape
        fn = jax.jit(
            _shard_map_unchecked(
                lambda f: kmeans_sharded(
                    f.reshape(-1, d), k, n_iter, "space",
                    cfg.cluster.init_stride,
                )[1],
                mesh, P("space", None, None), P(None, None),
            )
        )
        return np.asarray(fn(feats_hwd))

    from gabor_color_image_segmentation_tpu.parallel.tiled_graph import (
        _psum_any,  # noqa: F401 — import check only
    )

    print("| seed | feats rel-diff | seeds equal | B flips | C flips | D flips |")
    print("|---|---|---|---|---|---|")
    for seed in (5, 9, 21, 33):
        rgb, _ = synthetic_mosaic(h=256, w=96, n_regions=4, seed=seed)
        f_tiled = np.asarray(feat_fn(jnp.asarray(rgb)))
        f_ref = np.asarray(
            jax.jit(lambda r: compute_features(r[None], cfg, bank)[0])(
                jnp.asarray(rgb)
            )
        )
        scale = np.abs(f_ref).max()
        fdiff = np.abs(f_tiled - f_ref).max() / scale
        n = f_ref.shape[0] * f_ref.shape[1]
        flat_ref = f_ref.reshape(n, -1)

        # maximin seeds: distributed vs single-chip on IDENTICAL inputs
        c_ref = np.asarray(maximin_init(jnp.asarray(flat_ref), k))
        # distributed maximin is the first k rows of kmeans_sharded's
        # init — recover via a 0-iteration solve
        def dist_init(feats_hwd):
            h, w, d = feats_hwd.shape
            fn = jax.jit(
                _shard_map_unchecked(
                    lambda f: kmeans_sharded(
                        f.reshape(-1, d), k, 0, "space", 1
                    )[1],
                    mesh, P("space", None, None), P(None, None),
                )
            )
            return np.asarray(fn(feats_hwd))

        c_dist = dist_init(jnp.asarray(f_ref))
        seeds_equal = bool(np.allclose(c_ref, c_dist, rtol=0, atol=0))

        la, _ = kmeans(jnp.asarray(flat_ref), k, n_iter)
        la = np.asarray(la)
        lb, _ = kmeans(jnp.asarray(f_tiled.reshape(n, -1)), k, n_iter)
        lb = align_labels(np.asarray(lb), la)
        lc = align_labels(dist_solver(jnp.asarray(f_ref)), la)
        ld = align_labels(dist_solver(jnp.asarray(f_tiled)), la)
        print(
            f"| {seed} | {fdiff:.2e} | {seeds_equal} | "
            f"{int((lb != la).sum())} | {int((lc != la).sum())} | "
            f"{int((ld != la).sum())} | (n={n})", flush=True,
        )


if __name__ == "__main__":
    main()
