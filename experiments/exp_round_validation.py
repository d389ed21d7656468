"""Round validation on the real TPU: verify-drive + parity agreement.

1. config0/config3 pipeline drive (segment_image, PRI sanity)
2. TPU-vs-golden end-to-end label agreement, config0 fp32 + bf16, config3

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_round_validation.py
"""

import numpy as np

import gabor_color_image_segmentation_tpu as gcis
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.metrics import pri_np
from gabor_color_image_segmentation_tpu.models.pipeline import segment_image
from gabor_color_image_segmentation_tpu.utils.labels import align_labels


def agreement(ours, gold):
    a = align_labels(np.asarray(ours).reshape(-1), gold.reshape(-1))
    return (a == gold.reshape(-1)).mean()


def main():
    import jax

    from gabor_color_image_segmentation_tpu.utils.jit_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    rgb, gt = synthetic_mosaic(h=321, w=481, n_regions=5, seed=11)

    # --- drive: config0 fp32 + bf16 ---
    for dt in ("float32", "bfloat16"):
        cfg = gcis.preset("config0").replace(dtype=dt)
        labels, _ = segment_image(rgb, cfg)
        l_np = np.asarray(labels)
        print(f"config0 {dt}: ids {np.unique(l_np)} PRI {pri_np(l_np, [gt]):.4f}",
              flush=True)

    # --- golden comparison, config0 ---
    from golden.cluster import kmeans_golden
    from golden.features import features_golden

    cfg = gcis.preset("config0")
    feats_g = features_golden(rgb, cfg.bank, cfg.cluster)
    h, w, d = feats_g.shape
    gold, _ = kmeans_golden(feats_g.reshape(-1, d), 5, cfg.cluster.n_iter)
    gold = gold.reshape(h, w)
    for dt in ("float32", "bfloat16"):
        labels, _ = segment_image(rgb, cfg.replace(dtype=dt))
        print(f"config0 {dt} vs golden agreement: {agreement(labels, gold):.4f}",
              flush=True)

    # --- drive + golden comparison, config3 ---
    # Each config3 leg runs in its OWN subprocess: an fp32 graph program
    # leaves the axon TPU worker in a state where the NEXT graph program
    # in the same process crashes it ("TPU worker process crashed",
    # deterministic — round-5 bisect; sequences of bf16 graph programs
    # are fine, CLAUDE.md landmine). The compile cache keeps the
    # per-subprocess cost to jax init + cached load.
    import os
    import subprocess
    import sys
    import tempfile

    from golden.graph import ncut_golden

    cfg3 = gcis.preset("config3")

    def run_config3(dt, eig=None):
        out = tempfile.mktemp(suffix=".npy")
        code = (
            "import numpy as np, dataclasses\n"
            "import gabor_color_image_segmentation_tpu as gcis\n"
            "from gabor_color_image_segmentation_tpu.utils.jit_cache "
            "import enable_compilation_cache\n"
            "enable_compilation_cache()\n"
            "from gabor_color_image_segmentation_tpu.data import "
            "synthetic_mosaic\n"
            "from gabor_color_image_segmentation_tpu.models.pipeline "
            "import segment_image\n"
            "rgb, _ = synthetic_mosaic(h=321, w=481, n_regions=5, seed=11)\n"
            f"cfg = gcis.preset('config3').replace(dtype={dt!r})\n"
        )
        if eig:
            code += (
                "cfg = cfg.replace(graph=dataclasses.replace("
                f"cfg.graph, eig_method={eig!r}))\n"
            )
        code += (
            "labels, _ = segment_image(rgb, cfg)\n"
            f"np.save({out!r}, np.asarray(labels))\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True,
                       env=dict(os.environ), timeout=3000)
        arr = np.load(out)
        os.unlink(out)
        return arr

    for dt in ("float32", "bfloat16"):
        l3 = run_config3(dt)
        print(f"config3 {dt}: ids {np.unique(l3)} PRI {pri_np(l3, [gt]):.4f}",
              flush=True)

    from golden.features import rgb_to_lab_np
    from golden.graph import enforce_connectivity_golden, slic_golden
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape

    g = cfg3.graph
    lab_g = rgb_to_lab_np(rgb)
    sp_g = slic_golden(lab_g, g.n_superpixels, g.slic_compactness, g.slic_iters)
    gh, gw, _ = grid_shape(h, w, g.n_superpixels)
    # mirror the production graph path (models/graph.py:graph_segment_batch):
    # cv2-semantics connectivity enforcement runs between SLIC and n-cut
    sp_g = enforce_connectivity_golden(sp_g, n_sp=gh * gw, s_max=gh * gw)
    gold3 = ncut_golden(feats_g, sp_g, g.n_regions, g.affinity_sigma, gh * gw,
                        g.affinity_sigma_scale)
    labels3 = run_config3("float32")
    print(f"config3 fp32 vs golden agreement: {agreement(labels3, gold3):.4f}",
          flush=True)
    # isolate the eigensolver: golden uses dense eigh; the production TPU
    # path defaults to the matmul-only subspace iteration (eig_method=auto).
    # Forcing eigh on-device attributes any residual gap to eig basins.
    labels3e = run_config3("float32", eig="eigh")
    print(f"config3 fp32 (eigh) vs golden agreement: "
          f"{agreement(labels3e, gold3):.4f}", flush=True)


if __name__ == "__main__":
    main()
