"""config2 pooled-fit quality/speed probe: (fit_pool, refine_iters) grid.

For each setting: mean PRI + boundary-F over the 20-image synthetic test
split (the production transposed path via segment_images) and the official
bench number (benchmark.bench_device, batch 8) at PRODUCTION bf16 (the
dtype bench.py measures; presets default to the fp32 parity mode).

Measured 2026-08-18 (fp32, first sweep — before refine existed):
  fit_pool=0: PRI 0.7175  F 0.0683  bench 14.9 MP/s
  fit_pool=1: PRI 0.6969  F 0.0421  bench 30.8 MP/s
  fit_pool=2: PRI 0.6988  F 0.0168  bench 40.5 MP/s
The boundary-F collapse motivated gmm_refine_iters (full-res EM passes
after the pooled fit restore the block-mean-shrunken covariance scale).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_fitpool_eval.py
"""

import dataclasses

import jax
import numpy as np

from gabor_color_image_segmentation_tpu.benchmark import bench_device
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_dataset
from gabor_color_image_segmentation_tpu.eval import evaluate, load_split

GRID = ((0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2), (2, 3))


def main():
    print("backend:", jax.default_backend(), flush=True)
    data = load_split("test", limit=20)
    batch = np.stack(
        [rgb for (_, rgb, _) in synthetic_dataset(8, h=321, w=481, seed=77)]
    )
    for fp, ri in GRID:
        cfg = preset("config2").replace(dtype="bfloat16")
        cfg = cfg.replace(
            cluster=dataclasses.replace(
                cfg.cluster, gmm_fit_pool=fp, gmm_refine_iters=ri
            )
        )
        s = evaluate(data, cfg)
        mps = bench_device(cfg, batch, iters=10)
        print(
            f"fit_pool={fp} refine={ri}: PRI {s['mean_pri']:.4f}  "
            f"F {s['mean_f_boundary']:.4f}  bench {mps:.1f} MP/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
