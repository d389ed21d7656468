"""Which TPU SLIC path matches the exact-f32 CPU result: XLA or fused?

Phase 1 (TPU): deterministic lab batch -> save TPU-XLA and TPU-fused labels.
Phase 2 (CPU, subprocess): same batch -> exact f32 XLA labels -> agreement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_slic_groundtruth.py
"""

import os
import subprocess
import sys

import numpy as np

N_SP, RULER, ITERS = 400, 10.0, 10
OUT = "/tmp/slic_gt.npz"


def make_lab_np():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 80, (4, 11, 16, 3)).astype(np.float32)
    import scipy.ndimage as ndi

    lab = np.stack(
        [
            np.stack(
                [
                    ndi.zoom(base[i, :, :, c], (321 / 11, 481 / 16), order=1)
                    for c in range(3)
                ],
                axis=-1,
            )
            for i in range(4)
        ]
    )
    lab += rng.normal(0, 2.0, lab.shape).astype(np.float32)
    return lab.astype(np.float32)


def tpu_phase():
    import jax
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.slic import slic
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    lab = jnp.asarray(make_lab_np())
    xla = np.asarray(jax.jit(jax.vmap(lambda l: slic(l, N_SP, RULER, ITERS)))(lab))
    fused = np.asarray(slic_fused(lab, N_SP, RULER, ITERS))
    np.savez(OUT, xla=xla, fused=fused)
    print("tpu phase done", flush=True)


def cpu_phase():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.slic import slic

    lab = jnp.asarray(make_lab_np())
    cpu = np.asarray(jax.jit(jax.vmap(lambda l: slic(l, N_SP, RULER, ITERS)))(lab))
    d = np.load(OUT)
    print("TPU-XLA  vs CPU-exact:", (d["xla"] == cpu).mean())
    print("TPU-fused vs CPU-exact:", (d["fused"] == cpu).mean())
    print("TPU-XLA  vs TPU-fused:", (d["xla"] == d["fused"]).mean())


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        cpu_phase()
    else:
        tpu_phase()
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, __file__, "cpu"], env=env, check=True
        )
