"""Fused Pallas kernel parity (interpreter mode on CPU — the Pallas
'sanitizer' per SURVEY.md §5.2; the same suite runs compiled on TPU)."""

import numpy as np
import pytest

from gabor_color_image_segmentation_tpu.config import BankConfig
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import gabor_energies
from gabor_color_image_segmentation_tpu.ops.fused_pallas import gabor_energies_fused
from golden.features import rgb_to_lab_np

# 3 orientations => diagonal thetas: reflected-border magnitude is NOT
# symmetric for diagonal kernels, which is exactly the border-semantics bug
# class the axis-aligned orientations (0/90 deg) cannot detect
CFG = BankConfig(scales=(2.0, 3.0), orientations=3, frequencies=(0.12,))


@pytest.fixture(scope="module")
def lab(tiny_mosaic):
    rgb, _ = tiny_mosaic
    return rgb_to_lab_np(rgb)


def test_matches_direct_path(lab):
    bank = make_bank(CFG)
    direct = np.asarray(gabor_energies(lab[None], bank))[0]
    fused = np.asarray(gabor_energies_fused(lab[None], bank))[0]
    assert fused.shape == direct.shape
    peak = np.abs(direct).max()
    np.testing.assert_allclose(fused, direct, atol=2e-3 * peak, rtol=1e-3)


def test_batch(lab):
    bank = make_bank(BankConfig(scales=(2.0,), orientations=3))
    two = np.stack([lab, lab[::-1].copy()])
    fused = np.asarray(gabor_energies_fused(two, bank))
    direct = np.asarray(gabor_energies(two, bank))
    peak = np.abs(direct).max()
    np.testing.assert_allclose(fused, direct, atol=2e-3 * peak, rtol=1e-3)


def test_rejects_anisotropic(lab):
    bank = make_bank(BankConfig(scales=(2.0,), orientations=2, gamma=0.7))
    with pytest.raises(ValueError, match="gamma"):
        gabor_energies_fused(lab[None], bank)


def test_bf16_vmod_matches_plain_bf16(lab):
    """vmod folds vertical modulation into per-kernel pre-modulated
    envelope Toeplitz matrices. It is a measured perf-neutral NEGATIVE
    result kept off in production (fused_pallas._VMOD_OVERRIDE STATUS),
    but its numerics stay pinned: same math as the plain bf16 path up to
    one bf16 rounding of the combined (envelope x cos) factor, so the two
    must agree at bf16-noise level — and both at the documented ~2e-3
    bf16 bound vs the f32 direct path."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.ops import fused_pallas as fp

    bank = make_bank(CFG)
    raw = fp._fused_group.__wrapped__  # bypass jit cache: _VMOD_OVERRIDE
    # is read at trace time and is not part of the jit key

    def run(force):
        fp._VMOD_OVERRIDE = force
        try:
            parts = [raw(jnp.asarray(lab[None]), g, bank, jnp.bfloat16)
                     for g in bank.groups]
        finally:
            fp._VMOD_OVERRIDE = None
        return np.concatenate([np.asarray(p, np.float32) for p in parts],
                              axis=-1)

    vmod, plain = run(True), run(False)
    direct = np.asarray(gabor_energies(lab[None], bank))
    peak = np.abs(direct).max()
    np.testing.assert_allclose(vmod, plain, atol=2e-2 * peak, rtol=2e-2)
    np.testing.assert_allclose(vmod, direct, atol=1.6e-2 * peak, rtol=2e-2)


def test_pooled_twin_matches_pool2x2(lab):
    """pooled=True emits (P@S) @ mag @ (S@P) — real-arithmetic equal to
    2x2-pooling the full-res energies; float drift is reduction-order only."""
    from gabor_color_image_segmentation_tpu.ops.features import _pool2x2_cm

    bank = make_bank(BankConfig(scales=(2.0, 3.0), orientations=3))
    full, pooled = gabor_energies_fused(
        lab[None], bank, channel_major=True, pooled=True
    )
    ref = _pool2x2_cm(full)
    assert pooled.shape == ref.shape
    peak = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(ref), atol=2e-3 * peak, rtol=1e-3
    )
    # and the full-res output is unchanged by requesting the twin
    alone = gabor_energies_fused(lab[None], bank, channel_major=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(alone))
