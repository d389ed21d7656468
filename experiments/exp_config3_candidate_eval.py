"""Full-eval A/B of the config3 boundary-F remedy candidates
(exp_config3_remedy.py phase 3): production preset vs the
900-superpixel / compactness-5 / sigma-scale candidates, on the same
20-image multi-GT test split the BASELINE tables pin.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_candidate_eval.py
"""

import dataclasses

import jax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.eval import evaluate, load_split
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

CANDS = [
    ("production (400/10, scale 1, nr5)", dict()),
    ("900/5 scale0.1 nr5",
     dict(n_superpixels=900, slic_compactness=5.0, affinity_sigma_scale=0.1,
          n_regions=5)),
    ("900/5 scale0.1 nr8",
     dict(n_superpixels=900, slic_compactness=5.0, affinity_sigma_scale=0.1,
          n_regions=8)),
    ("900/5 scale0.05 nr8",
     dict(n_superpixels=900, slic_compactness=5.0, affinity_sigma_scale=0.05,
          n_regions=8)),
]


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    ds = load_split("test", limit=20)
    base = preset("config3")
    for name, over in CANDS:
        cfg = dataclasses.replace(
            base, graph=dataclasses.replace(base.graph, **over)
        )
        s = evaluate(ds, cfg)
        print(f"{name:36s}: PRI={s['mean_pri']:.4f} "
              f"F={s['mean_f_boundary']:.4f} VoI={s['mean_voi']:.3f} "
              f"cov={s['mean_covering']:.3f} fail={s['n_failed']}",
              flush=True)


if __name__ == "__main__":
    main()
