"""Performance regression floors (SURVEY.md §4.5) — TPU-only.

These tests run ONLY when a real TPU backend is attached (the CPU CI suite
skips them): they assert end-to-end MP/s/chip floors well below the measured
numbers (BASELINE.md) so genuine regressions trip them but tunnel jitter
does not. Measured 2026-08-18/20 on v5 lite (iters=50 methodology):
config0 169.9, config1 90.7, config2 86.6, config3 63.8, config4 128.4.

NOTE: tests/conftest.py forces the CPU backend for the rest of the suite;
this module must re-select the TPU explicitly, so it spawns a subprocess
with the axon plugin on PYTHONPATH when available.
"""

import json
import os
import subprocess
import sys

import pytest

# ~80% of the 2026-08-20 round-4 HEAD measurements at the iters=50 bench
# methodology (169.4 / 90.6 / 86.6 / 63.8 / 128.4-at-batch-5 with the cut
# chain): tight enough to catch a real regression, loose enough for tunnel
# jitter.
_FLOORS = {
    "config0": 135.0,
    "config1": 72.0,
    "config2": 69.0,
    "config3": 51.0,
    "config4": 103.0,
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
