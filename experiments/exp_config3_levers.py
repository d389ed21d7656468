"""config3 in-context lever A/B — the recorded measurement behind keeping
the XLA one-hot moments and power_per_qr=8 (round 5).

After the median fix (34.6 -> 57.0 MP/s) the remaining budget is ~22
ms/batch-8. This A/B swaps one stage at a time and re-runs the FULL
production bench (the CLAUDE.md misattribution rule: standalone stage
probes charged the means stage 17.7 ms, but in context every moments
implementation measures the same):

Measured 2026-08-20 (TPU v5 lite, bench_device iters=50):
  production (_t Pallas moments, pqr=8): 57.15 MP/s
  A: XLA one-hot moments:                57.11 MP/s
  B: subspace power_per_qr=16:           57.13 MP/s
-> all within 0.1 MP/s; production keeps the simplest (XLA one-hot)
   moments and pqr=8. The Pallas moments kernels stay in
   models/graph_pallas.py as measured-equal records.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_levers.py
"""

import functools

import jax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import gabor_color_image_segmentation_tpu.models.graph as G
from gabor_color_image_segmentation_tpu.benchmark import bench_device, build_batch
from gabor_color_image_segmentation_tpu.config import preset


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config3").replace(dtype="bfloat16")
    batch = build_batch(cfg, cfg.batch_size)

    def run(tag):
        mp = bench_device(cfg, batch, 50)
        print(f"{tag}: {mp:.2f} MP/s", flush=True)

    run("production (XLA one-hot moments, pqr=8)")

    orig_spec = G.smallest_eigvecs_subspace
    G.smallest_eigvecs_subspace = functools.partial(
        orig_spec, power_per_qr=16
    )
    run("B: subspace power_per_qr=16")
    G.smallest_eigvecs_subspace = orig_spec


if __name__ == "__main__":
    main()
