"""Performance regression floors (SURVEY.md §4.5) — TPU-only.

These tests run ONLY when a real TPU backend is attached (the CPU CI suite
skips them): they assert end-to-end MP/s/chip floors well below the measured
numbers (BASELINE.md) so genuine regressions trip them but tunnel jitter
does not. Measured 2026-08-20 round-5 HEAD on v5 lite (iters=50
methodology): config0 162.2, config1 89.0, config2 85.4, config3 56.2,
config4 180.8.

NOTE: tests/conftest.py forces the CPU backend for the rest of the suite;
this module must re-select the TPU explicitly, so it spawns a subprocess
with the axon plugin on PYTHONPATH when available.
"""

import json
import os
import subprocess
import sys

import pytest

# ~80% of the 2026-08-20 round-5 HEAD measurements at the iters=50 bench
# methodology (exp_r5_repin.py: 159.9 / 89.0 / 85.4 / 56.2 /
# 180.8-at-batch-5 — config0/1 on the coherence^4 quality default,
# config3 on the boundary-F remedy preset, config4 with per-window
# pooling): tight enough to catch a real regression, loose enough for
# tunnel jitter.
_FLOORS = {
    "config0": 128.0,
    "config1": 71.0,
    "config2": 68.0,
    "config3": 45.0,
    "config4": 144.0,
}
_AXON = "/root/.axon_site"


def _tpu_available() -> bool:
    return os.path.isdir(_AXON) and os.environ.get("GCIS_PERF_TESTS") == "1"


pytestmark = pytest.mark.skipif(
    not _tpu_available(),
    reason="perf floors run on the real TPU only (set GCIS_PERF_TESTS=1)",
)


@pytest.mark.parametrize("preset_name", sorted(_FLOORS))
def test_e2e_throughput_floor(preset_name):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{_AXON}"
    env.pop("JAX_PLATFORMS", None)
    batch = ["--batch", "16"] if preset_name == "config0" else (
        ["--batch", "5"] if preset_name == "config4" else []
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--preset", preset_name]
        + batch,
        env=env, capture_output=True, text=True, timeout=3000, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    mp_s = json.loads(line)["value"]
    assert mp_s > _FLOORS[preset_name], (
        f"{preset_name}: {mp_s} MP/s below floor {_FLOORS[preset_name]}"
    )
