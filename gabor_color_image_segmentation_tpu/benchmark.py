"""End-to-end throughput benchmark core (SURVEY.md §6; BASELINE metric).

Shared by the repo-root ``bench.py`` (the driver's one-JSON-line contract)
and ``cli.py bench``. Measures device-side end-to-end MP/s (ingest-from-HBM
-> int32 label maps) with a scalar-checksum execution fence — on the
tunneled axon platform ``block_until_ready()`` does not block, and
host<->device transfers ride a ~50 MB/s tunnel, so the batch is uploaded
once and the timed region loops ``iters`` executions inside one jit.
"""

from __future__ import annotations

import time

import numpy as np

# CPU golden-path throughput for the same workloads (MP/s), measured on this
# machine (1-core x86) via measure_cpu_golden on 2026-08-16; see BASELINE.md.
# Method-correct: config2's golden runs the f64 GMM EM, config3's runs
# SLIC + spectral n-cut, config4's runs the full filter->cluster->cut chain
# (pooled graph stage — re-measured 2026-08-20 after the preset flip; the
# pooled golden graph is FASTER than the old full-res 4K golden k-means,
# 0.1276 vs 0.0428, for the same reason the TPU chain is).
CPU_BASELINE_MP_S = {
    "config0": 0.1632,
    "config1": 0.0113,
    "config2": 0.00087,
    "config3": 0.02925,
    "config4": 0.1276,
}


def build_batch(cfg, n_images: int) -> np.ndarray:
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    h, w = cfg.image_hw
    return np.stack(
        [
            synthetic_mosaic(h=h, w=w, n_regions=5, seed=100 + i)[0]
            for i in range(n_images)
        ]
    )


def bench_device(cfg, batch: np.ndarray, iters: int) -> float:
    """MP/s for the jitted pipeline on the current default backend."""
    import jax
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.pipeline import segment_batch
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    bank = make_bank(cfg.bank)
    batch_dev = jnp.asarray(batch)

    @jax.jit
    def run(b):
        def body(i, acc):
            # labels-only: the kmeans pipeline takes the transposed fast
            # path on TPU (no NHWC feature tensor); other configs are
            # unchanged (feats were already dead-code-eliminated here)
            labels, _ = segment_batch(
                b + i.astype(b.dtype), cfg, bank, False
            )
            return acc + jnp.sum(labels)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    int(run(batch_dev))  # warm-up / compile
    t0 = time.perf_counter()
    int(run(batch_dev))
    dt = (time.perf_counter() - t0) / iters
    mp = batch.shape[0] * batch.shape[1] * batch.shape[2] / 1e6
    return mp / dt


def measure_cpu_golden(cfg, batch: np.ndarray, n_images: int = 1) -> float:
    """Golden-path (reference-equivalent) throughput — the 100x denominator.

    Runs the SAME stage chain as the preset under test: kmeans or per-image
    GMM EM, plus the SLIC + spectral n-cut graph stage when enabled (earlier
    versions always timed kmeans_golden, which mis-stated vs_baseline for
    configs 2 and 3)."""
    from golden.cluster import gmm_golden, kmeans_golden
    from golden.features import features_golden, rgb_to_lab_np
    from golden.graph import (
        enforce_connectivity_golden,
        ncut_golden,
        slic_golden,
    )
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    bank = make_bank(cfg.bank)
    c, g = cfg.cluster, cfg.graph
    t0 = time.perf_counter()
    for i in range(n_images):
        if g.enabled and g.cut == "ncut":
            # the graph chain mirrors the production multirate schedule
            # (GraphConfig.pool): SLIC/connectivity/n-cut on the pooled
            # grid, exactly like the jitted path — the method-correct
            # denominator for config4+cut
            from golden.graph import graph_inputs_golden

            feats, lab = graph_inputs_golden(
                batch[i], cfg.bank, c, g.pool, cfg.color_space, bank
            )
            h, w, d = feats.shape
            sp = enforce_connectivity_golden(
                slic_golden(lab, g.n_superpixels, g.slic_compactness, g.slic_iters)
            )
            gh, gw, _ = grid_shape(h, w, g.n_superpixels)
            ncut_golden(feats, sp, g.n_regions, g.affinity_sigma, gh * gw,
                            g.affinity_sigma_scale)
            continue
        feats = features_golden(batch[i], cfg.bank, c, bank=bank)
        h, w, d = feats.shape
        if c.method == "gmm":
            gmm_golden(
                feats.reshape(-1, d), c.k, c.n_iter, c.gmm_reg_covar, c.gmm_tol
            )
        elif c.coarse_iters > 0:
            from golden.cluster import kmeans_golden_multigrid

            kmeans_golden_multigrid(
                feats.reshape(-1, d), c.k, (h, w), c.coarse_iters,
                c.refine_iters, c.coarse_levels, c.mid_iters,
            )
        else:
            kmeans_golden(feats.reshape(-1, d), c.k, c.n_iter)
    dt = (time.perf_counter() - t0) / n_images
    return batch.shape[1] * batch.shape[2] / 1e6 / dt


def run_benchmark(
    preset_name: str = "config1",
    batch_size: int | None = None,
    iters: int = 50,
    dtype: str = "bfloat16",
    subsample: int = 1,
    measure_cpu: bool = False,
    cpu_images: int = 1,
    cfg=None,
) -> dict:
    """Returns the driver-contract result dict (one JSON line's content).

    Pass ``cfg`` (a PipelineConfig) to benchmark an arbitrary configuration
    (the CLI's preset-override flags build one); the stored CPU baseline is
    only trusted for unmodified presets."""
    import dataclasses
    import sys

    from gabor_color_image_segmentation_tpu.config import preset
    from gabor_color_image_segmentation_tpu.utils.jit_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # persist the pipeline executable across runs

    stock = cfg is None
    if cfg is None:
        cfg = preset(preset_name).replace(dtype=dtype)
    if subsample != 1:
        cfg = cfg.replace(
            cluster=dataclasses.replace(cfg.cluster, subsample=subsample)
        )
    if batch_size:
        cfg = cfg.replace(batch_size=batch_size)
    batch = build_batch(cfg, cfg.batch_size)

    mp_s = bench_device(cfg, batch, iters)

    cpu_mp_s = CPU_BASELINE_MP_S.get(preset_name) if stock else None
    if measure_cpu or cpu_mp_s is None:
        cpu_mp_s = measure_cpu_golden(cfg, batch, cpu_images)
        print(
            f"# measured CPU golden baseline: {cpu_mp_s:.4f} MP/s",
            file=sys.stderr,
        )
    vs = mp_s / cpu_mp_s if cpu_mp_s else None
    return {
        "metric": f"end-to-end MP/s/chip ({cfg.name}: "
        f"{cfg.bank.n_kernels}-kernel bank, batch {cfg.batch_size}, "
        f"{cfg.cluster.method} k={cfg.cluster.k})",
        "value": round(mp_s, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(vs, 1) if vs else None,
    }
