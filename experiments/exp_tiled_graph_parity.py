"""Tiled-graph flip decomposition (VERDICT r3 weak #3): the distributed cut
chain's one remaining float-order divergence is the SLIC psum'd centroid
moments — dissect it stage by stage like exp_tiled_parity did for k-means.

Per seed, on the fake 8-device CPU mesh, compares at each stage BOUNDARY:

  S1 slic labels:        slic_sharded(lab)      vs slic(lab)
  S2 connectivity:       enforce_connectivity_sharded on the SINGLE-chip
                         SLIC labels vs enforce_connectivity_device on the
                         same input (isolates connectivity: integer min/add
                         reductions are order-free, so this must be 0)
  S3 superpixel means:   psum'd one-hot moments vs single-chip moments on
                         IDENTICAL (single-chip) labels+feats — max |Δ|
  S4 full chain:         segment_tiled(graph) vs segment_image(graph)

Any S4 flips then attribute to S1 (psum'd SLIC Lloyd) unless S2/S3 show
noise of their own.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
     PYTHONPATH=/root/repo python experiments/exp_tiled_graph_parity.py
"""

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gabor_color_image_segmentation_tpu.config import BankConfig, preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.pipeline import segment_image
from gabor_color_image_segmentation_tpu.models.slic import (
    enforce_connectivity_device,
    grid_shape,
    slic,
)
from gabor_color_image_segmentation_tpu.models.graph import superpixel_means
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.parallel.sharding import (
    _shard_map_unchecked,
)
from gabor_color_image_segmentation_tpu.parallel.tiled_graph import (
    enforce_connectivity_sharded,
    slic_sharded,
    superpixel_means_sharded,
)
from gabor_color_image_segmentation_tpu.parallel.tiling import segment_tiled
from gabor_color_image_segmentation_tpu.utils.labels import align_labels
from golden.features import rgb_to_lab_np

H, W, N_SP, RULER, ITERS = 96, 64, 48, 10.0, 10


def shard_rows(fn, mesh, in_specs, out_specs):
    return jax.jit(_shard_map_unchecked(fn, mesh, in_specs, out_specs))


def main():
    devs = jax.devices()
    assert len(devs) >= 8, f"need 8 fake devices, have {len(devs)}"
    mesh = Mesh(np.asarray(devs[:8]), ("space",))
    gh, gw, _ = grid_shape(H, W, N_SP)
    n_sp = gh * gw

    base = preset("config0").replace(feature_impl="modulated")
    base = base.replace(
        bank=BankConfig(scales=(2.0, 3.0), orientations=3, frequencies=None)
    )
    cfg = base.replace(
        graph=dataclasses.replace(
            base.graph, enabled=True, n_superpixels=N_SP, n_regions=4, pool=0
        )
    )
    bank = make_bank(cfg.bank)

    print(f"| seed | S1 slic flips | S2 conn flips | S3 means max|Δ| "
          f"| S4 chain flips |")
    print("|---|---|---|---|---|")
    for seed in (3, 7, 21, 33):
        rgb, _ = synthetic_mosaic(h=H, w=W, n_regions=4, seed=seed)
        lab = rgb_to_lab_np(rgb)

        # S1: slic
        single_sp = np.asarray(slic(jnp.asarray(lab), N_SP, RULER, ITERS))
        fn1 = shard_rows(
            lambda l: slic_sharded(l, H, W, N_SP, RULER, ITERS, "space"),
            mesh, P("space", None, None), P("space", None),
        )
        shard_sp = np.asarray(fn1(jnp.asarray(lab)))
        s1 = int((shard_sp != single_sp).sum())

        # S2: connectivity on the SAME (single-chip) input
        single_cc = np.asarray(
            enforce_connectivity_device(single_sp[None], n_sp)
        )[0]
        fn2 = shard_rows(
            lambda s: enforce_connectivity_sharded(s, n_sp, H, "space"),
            mesh, P("space", None), P("space", None),
        )
        shard_cc = np.asarray(fn2(jnp.asarray(single_sp)))
        s2 = int((shard_cc != single_cc).sum())

        # S3: psum'd superpixel means on IDENTICAL labels+feats
        feats = np.asarray(lab, np.float32).reshape(-1, 3)
        m_single, c_single = superpixel_means(
            jnp.asarray(feats), jnp.asarray(single_cc.reshape(-1)), n_sp
        )
        fn3 = shard_rows(
            lambda f, s: superpixel_means_sharded(f, s, n_sp, "space"),
            mesh, (P("space", None), P("space")), (P(None, None), P(None)),
        )
        m_shard, c_shard = fn3(
            jnp.asarray(feats), jnp.asarray(single_cc.reshape(-1))
        )
        s3 = float(jnp.max(jnp.abs(m_shard - m_single)))
        assert (np.asarray(c_shard) == np.asarray(c_single)).all()

        # S4: full chain
        tiled = np.asarray(segment_tiled(rgb, cfg, bank, mesh))
        untiled, _ = segment_image(rgb, cfg, bank)
        untiled = np.asarray(untiled)
        aligned = align_labels(tiled, untiled)
        s4 = int((aligned != untiled).sum())

        print(f"| {seed} | {s1} | {s2} | {s3:.2e} | {s4} |", flush=True)


if __name__ == "__main__":
    main()
