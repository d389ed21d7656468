"""Round-5 HEAD re-pin: all five benches + eval tables + ODS sweep +
paired config0/config1 noise stats, one TPU session (the BASELINE.md
cadence — every pinned number reproducible from HEAD).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_r5_repin.py
"""

import json

import numpy as np

import jax

from gabor_color_image_segmentation_tpu.benchmark import bench_device, build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.eval import (
    evaluate,
    evaluate_sweep,
    load_split,
)
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    # ---- benches (bench.py methodology: iters=50, bf16) ---------------
    for name, batch in (("config0", 16), ("config1", None), ("config2", None),
                        ("config3", None), ("config4", 5)):
        cfg = preset(name).replace(dtype="bfloat16")
        if batch:
            cfg = cfg.replace(batch_size=batch)
        data = build_batch(cfg, cfg.batch_size)
        mp = bench_device(cfg, data, 50)
        print(f"bench {name}: {mp:.2f} MP/s/chip", flush=True)

    # ---- eval tables ---------------------------------------------------
    ds = load_split("test", limit=20)
    rows = {}
    for name in ("config0", "config1", "config2", "config3"):
        # bfloat16 = production mode, matching every pinned table since
        # round 4 (`cli eval --dtype bfloat16`); the sweep/candidate
        # experiments earlier in round 5 ran fp32-consistent A/Bs
        cfg = preset(name).replace(dtype="bfloat16")
        out = f"/tmp/eval_r5_{name}.jsonl"
        open(out, "w").close()
        s = evaluate(ds, cfg, out_path=out)
        rows[name] = out
        print(f"eval {name}: PRI={s['mean_pri']:.4f} "
              f"F={s['mean_f_boundary']:.4f} VoI={s['mean_voi']:.3f} "
              f"cov={s['mean_covering']:.3f} fail={s['n_failed']}",
              flush=True)

    # paired config0-vs-config1 noise: is the residual PRI gap within the
    # per-image paired std error? (VERDICT r4 task 2's "within noise" gate)
    def load(path):
        return {r["id"]: r for r in map(json.loads, open(path))}

    r0, r1 = load(rows["config0"]), load(rows["config1"])
    ids = sorted(set(r0) & set(r1))
    d = np.array([r0[i]["pri"] - r1[i]["pri"] for i in ids])
    print(f"paired config0-config1 PRI: mean diff {d.mean():+.4f}, "
          f"std {d.std(ddof=1):.4f}, stderr {d.std(ddof=1)/np.sqrt(len(d)):.4f} "
          f"(n={len(d)})", flush=True)

    # ---- ODS/OIS sweep (config3, region-count operating points) --------
    ds10 = load_split("test", limit=10)
    sw = evaluate_sweep(ds10, preset("config3").replace(dtype="bfloat16"),
                        ks=(3, 5, 8, 12), out_path="/tmp/eval_r5_sweep")
    print("ODS/OIS sweep (config3):", json.dumps(sw), flush=True)


if __name__ == "__main__":
    main()
