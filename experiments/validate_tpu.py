"""Standing TPU validation gate (VERDICT r4 missing #3 / task 5).

The w3 escape proved interpret-mode CI cannot catch Mosaic legality: a
production-default Pallas kernel shipped at round-3 HEAD that
COMPILE-FAILED on real hardware. This gate is ONE command that must be
green before re-pinning any number or shipping a kernel change:

  1. **Mosaic compile gate** — lowers + TPU-compiles every production
     program at its production shape: the five preset pipelines (bf16)
     plus the fp32 parity-mode variants of config0/1/3 and the explicit
     SLIC w5 plan (the measured non-default alternative). Every
     production Pallas kernel (fused features incl. tiled/config4,
     kmeans v3 + CHW + coarse-all warmup + maximin, SLIC w3 + w5,
     connectivity, fused EM, Cholesky glue, table lookup) is inside one
     of these programs at exactly its production shape — a kernel that
     fails Mosaic fails HERE, not mid-round. (Persistent compile cache
     makes unchanged kernels cheap; changed kernels compile fresh.)
  2. **Parity drive** — exp_round_validation.py (config0 fp32+bf16 +
     config3 golden agreement, PRI sanity).
  3. **Perf floors** — tests/test_perf_tpu.py via pytest with
     GCIS_PERF_TESTS=1 (all five bench.py floors).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/validate_tpu.py
     [--compile-only | --skip-floors]

Cadence (CLAUDE.md): run before every number re-pin and after every
new/changed Pallas kernel.
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.pipeline import segment_batch
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, preset, dtype, batch) — production shapes; batch overrides match
# bench.py's methodology flags
_PROGRAMS = [
    # dtype must be EXPLICIT: the preset default is float32, and the f32
    # feature kernel at config4's window shapes blows the 48 MB scoped-
    # vmem stack — this gate itself caught that on its first run
    ("config0 bf16 b16", "config0", "bfloat16", 16),
    ("config1 bf16 b16", "config1", "bfloat16", None),
    ("config2 bf16 b8", "config2", "bfloat16", None),
    ("config3 bf16 b8", "config3", "bfloat16", None),
    ("config4 bf16 b5", "config4", "bfloat16", 5),
    ("config0 fp32 (parity)", "config0", "float32", 16),
    ("config1 fp32 (parity)", "config1", "float32", None),
    ("config3 fp32 (parity)", "config3", "float32", None),
]


def compile_gate() -> bool:
    ok = True
    for name, pname, dtype, batch in _PROGRAMS:
        cfg = preset(pname)
        if dtype:
            cfg = cfg.replace(dtype=dtype)
        if batch:
            cfg = cfg.replace(batch_size=batch)
        bank = make_bank(cfg.bank)
        h, w = cfg.image_hw
        rgb = jnp.zeros((cfg.batch_size, h, w, 3), jnp.uint8)

        def fn(r, cfg=cfg, bank=bank):
            return segment_batch(r, cfg, bank)[0]

        t0 = time.perf_counter()
        try:
            jax.jit(fn).lower(rgb).compile()
            print(f"  compile ok   {name:24s} ({time.perf_counter()-t0:.1f} s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure
            ok = False
            print(f"  COMPILE FAIL {name:24s}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # the explicit w5 SLIC plan (measured alternative; not in any preset)
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    # w5 at a w5-ELIGIBLE geometry (the round-5 config3 preset's 900-cell
    # grid is w3-only by construction — 5*37 > 128 lanes)
    g = preset("config3").graph
    lab = jnp.zeros((preset("config3").batch_size, 321, 481, 3), jnp.float32)
    t0 = time.perf_counter()
    try:
        jax.jit(
            lambda l: slic_fused(l, 400, g.slic_compactness,
                                 g.slic_iters, "w5")
        ).lower(lab).compile()
        print(f"  compile ok   {'slic w5 plan':24s} "
              f"({time.perf_counter()-t0:.1f} s)", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        print(f"  COMPILE FAIL slic w5 plan: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
    return ok


def parity_drive() -> bool:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "exp_round_validation",
        os.path.join(_REPO, "experiments", "exp_round_validation.py"),
    )
    exp_round_validation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(exp_round_validation)
    try:
        exp_round_validation.main()
        return True
    except Exception as e:  # noqa: BLE001
        print(f"PARITY DRIVE FAIL: {type(e).__name__}: {e}", flush=True)
        return False


def perf_floors() -> bool:
    env = dict(os.environ)
    env["GCIS_PERF_TESTS"] = "1"
    env["PYTHONPATH"] = f"{_REPO}:/root/.axon_site"
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(_REPO, "tests", "test_perf_tpu.py"), "-q"],
        env=env, cwd=_REPO, timeout=5400,
    )
    return r.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--skip-floors", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    if backend != "tpu":
        print("FATAL: validate_tpu.py must run on the real TPU "
              "(PYTHONPATH=/root/repo:/root/.axon_site)", flush=True)
        sys.exit(2)

    print("\n[1/3] Mosaic compile gate (production shapes)", flush=True)
    ok = compile_gate()
    if not args.compile_only:
        print("\n[2/3] parity drive (exp_round_validation)", flush=True)
        ok = parity_drive() and ok
        if not args.skip_floors:
            print("\n[3/3] perf floors (tests/test_perf_tpu.py)", flush=True)
            ok = perf_floors() and ok
        else:
            print("\n[3/3] perf floors SKIPPED (--skip-floors)", flush=True)
    print(f"\nvalidate_tpu: {'GREEN' if ok else 'RED'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
