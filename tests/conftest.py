"""Test config: force the JAX CPU backend with 8 fake devices so sharding
tests run without a TPU pod (SURVEY.md §4.4); keeps CI runnable anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox pre-sets JAX_PLATFORMS=axon and the plugin wins over the env
# var; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persist slow CPU compiles across suite runs (GCIS_COMPILE_CACHE=0 opts out)
from gabor_color_image_segmentation_tpu.utils.jit_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gabor_color_image_segmentation_tpu.data.synthetic import synthetic_mosaic  # noqa: E402


@pytest.fixture(scope="session")
def small_mosaic():
    """96x128 seeded texture mosaic + ground truth (fast CPU tests)."""
    rgb, gt = synthetic_mosaic(h=96, w=128, n_regions=4, seed=7)
    return rgb, gt


@pytest.fixture(scope="session")
def tiny_mosaic():
    rgb, gt = synthetic_mosaic(h=48, w=64, n_regions=3, seed=3)
    return rgb, gt


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
