"""Bisect config3's synthetic-eval quality change (PRI 0.882 -> 0.771).

The 0.882/0.279 table row (2026-08-16) predates BOTH (a) connectivity
enforcement in the jitted graph path and (b) the subspace-eigensolver
rework (no self-loop for dead superpixels, 8 power steps per QR). This
runs the 20-image eval in a 2x2 grid {connectivity on/off} x
{subspace, eigh} to attribute the delta. Connectivity-off is produced by
monkeypatching both enforcement passes to identity (the old path's exact
behavior).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config3_quality_bisect.py
"""

import dataclasses

import numpy as np

import gabor_color_image_segmentation_tpu.models.connectivity_pallas as cpal
import gabor_color_image_segmentation_tpu.models.slic as mslic
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.eval import evaluate, load_split


def main():
    orig_fused = cpal.enforce_connectivity_fused
    orig_dev = mslic.enforce_connectivity_device

    for conn in (True, False):
        import jax

        # identical cfg across the conn toggle would otherwise hit the jit
        # cache and keep the previously traced (connectivity-on) program
        jax.clear_caches()
        if conn:
            cpal.enforce_connectivity_fused = orig_fused
            mslic.enforce_connectivity_device = orig_dev
        else:
            cpal.enforce_connectivity_fused = (
                lambda sp, n_sp, min_size=None, s_max=None: sp
            )
            mslic.enforce_connectivity_device = (
                lambda sp, n_sp, min_size=None, s_max=None: sp
            )
        for eig in ("subspace", "eigh"):
            cfg = preset("config3").replace(dtype="bfloat16")
            cfg = cfg.replace(
                graph=dataclasses.replace(cfg.graph, eig_method=eig)
            )
            res = evaluate(load_split("test", limit=20), cfg)
            print(
                f"connectivity={conn!s:5}  eig={eig:9}  "
                f"PRI {res['mean_pri']:.4f}  F {res['mean_f_boundary']:.4f}",
                flush=True,
            )

    cpal.enforce_connectivity_fused = orig_fused
    mslic.enforce_connectivity_device = orig_dev


if __name__ == "__main__":
    main()
