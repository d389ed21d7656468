"""Production-geometry coherence_pow sweep for config0/config1
(VERDICT r4 next-round task 2 + weak #4).

Round 4 proved the dilution mechanism (smoothing makes all 36 energy dims
coherent; the energy block keeps ~55% of post-weight variance and dilutes
the 3 color dims) and measured coherence^2 as a partial remedy — but only
on 161x241 ablation splits, plus a single p=2 point at production
geometry. The default decision therefore rests on ONE operating point of
an un-swept parameter whose 161x241 F-optimum is p=4.

This sweep runs the FULL production eval (321x481 multi-GT test split,
20 images, bfloat16, exact-F) for config0 and config1 under static and
coherence p in {1, 2, 4}, in one session. The promotion gate (VERDICT):
config1 PRI within noise of config0 (or better) on this eval.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_coherence_prod_sweep.py
"""

import dataclasses

import numpy as np

import jax

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.eval import evaluate, load_split
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

VARIANTS = [
    ("static", None),
    ("coherence", 1.0),
    ("coherence", 2.0),
    ("coherence", 4.0),
]


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    ds = load_split("test", limit=20)
    results = {}
    for name in ("config0", "config1"):
        base = preset(name)
        for cue, pw in VARIANTS:
            cl = dataclasses.replace(
                base.cluster, cue_weight=cue,
                coherence_pow=(pw if pw is not None else 1.0),
            )
            cfg = dataclasses.replace(base, cluster=cl)
            tag = f"{name}/{cue}" + (f"^p{pw:g}" if cue == "coherence" else "")
            s = evaluate(ds, cfg)
            results[tag] = s
            print(
                f"{tag:>22}: PRI={s['mean_pri']:.4f} "
                f"F={s['mean_f_boundary']:.4f} "
                f"VoI={s.get('mean_voi', float('nan')):.3f} "
                f"cov={s.get('mean_covering', float('nan')):.3f}",
                flush=True,
            )

    print("\n=== summary (mean over 20 multi-GT test images) ===")
    for tag, s in results.items():
        print(f"{tag:>22}: PRI={s['mean_pri']:.4f} "
              f"F={s['mean_f_boundary']:.4f}")


if __name__ == "__main__":
    main()
