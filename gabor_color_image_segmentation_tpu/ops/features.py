"""Gabor feature extraction — plain-XLA path (SURVEY.md C4-C7).

Pipeline per scale-group (all inside one jit; XLA fuses the elementwise
stages into the convs):

    pad(reflect101) -> depthwise complex conv (MXU) -> |.| magnitude
    -> separable Gaussian energy smoothing -> per-pixel energy vector

Convolution convention is CORRELATION with REFLECT_101 borders, matching
``cv2.filter2D`` defaults (imgproc.hpp:1619-1649 — filter2D computes
correlation; BORDER_REFLECT_101 is the default border), which the golden CPU
path uses verbatim. ``lax.conv_general_dilated`` computes correlation
natively, so filters are used unflipped.

Feature layout contract (shared with golden/):

    energies[..., ch * N + j]  = smoothed |I_ch * K_j|,  j = global kernel idx
    features = concat([energies, color]) -> (..., 3N + 3)
    optional per-image standardization; color dims scaled by color_weight.

The fused Pallas kernel (ops/fused_pallas.py) computes the same map with one
VMEM pass; this module is the correctness reference on-device and the
CPU-backend (config0) path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.config import ClusterConfig
from gabor_color_image_segmentation_tpu.ops.bank import GaborBank, ScaleGroup

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _reflect_pad(x: jnp.ndarray, rh: int, rw: int) -> jnp.ndarray:
    """REFLECT_101 pad of NHWC along H, W."""
    return jnp.pad(x, ((0, 0), (rh, rh), (rw, rw), (0, 0)), mode="reflect")


def _depthwise_conv(x: jnp.ndarray, filt: jnp.ndarray, dtype) -> jnp.ndarray:
    """VALID depthwise-grouped correlation. x: (B,H,W,C), filt: (k,k,1,F) per
    channel; the filter block is tiled across C groups -> (B,H',W',C*F)."""
    c = x.shape[-1]
    f = jnp.tile(filt, (1, 1, 1, c))  # (k,k,1,C*F): group order = channel-major
    out = lax.conv_general_dilated(
        x.astype(dtype),
        f.astype(dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return out


def _separable_smooth(x: jnp.ndarray, taps: jnp.ndarray, dtype) -> jnp.ndarray:
    """Depthwise separable Gaussian with REFLECT_101 borders. x: (B,H,W,C)."""
    c = x.shape[-1]
    r = taps.shape[0] // 2
    tv = jnp.tile(taps.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (k,1,1,C)
    th = jnp.tile(taps.reshape(1, -1, 1, 1), (1, 1, 1, c))  # (1,k,1,C)
    x = _reflect_pad(x, r, 0)
    x = lax.conv_general_dilated(
        x.astype(dtype), tv.astype(dtype), (1, 1), "VALID",
        dimension_numbers=_DN, feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    x = _reflect_pad(x, 0, r)
    x = lax.conv_general_dilated(
        x.astype(dtype), th.astype(dtype), (1, 1), "VALID",
        dimension_numbers=_DN, feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return x


def _group_energies(img: jnp.ndarray, group: ScaleGroup, dtype) -> jnp.ndarray:
    """Energies for one scale group. img: (B,H,W,C) -> (B,H,W,C*n_g)."""
    r = group.ksize // 2
    filt = jnp.asarray(group.filters_hwio)  # (k,k,1,2n)
    x = _reflect_pad(img, r, r)
    resp = _depthwise_conv(x, filt, dtype)  # (B,H,W,C*2n) [ch-major groups]
    re = resp[..., 0::2]
    im = resp[..., 1::2]
    mag = jnp.sqrt(re * re + im * im)  # (B,H,W,C*n)
    taps = jnp.asarray(group.smooth_taps)
    return _separable_smooth(mag, taps, dtype)


def _energy_permutation(bank: GaborBank, n_channels: int) -> np.ndarray:
    """Static gather indices mapping concat-of-groups order -> contract order
    energies[..., ch*N + global_kernel_idx]."""
    n = bank.n_kernels
    # position of (ch, global_kernel) in the concatenated group outputs
    pos = np.zeros((n_channels, n), dtype=np.int64)
    offset = 0
    for g in bank.groups:
        ng = len(g.kernel_indices)
        for ch in range(n_channels):
            for j, kidx in enumerate(g.kernel_indices):
                pos[ch, kidx] = offset + ch * ng + j
        offset += n_channels * ng
    return pos.reshape(-1)  # (C*N,) gather index into concat axis


def gabor_energies(
    img: jnp.ndarray, bank: GaborBank, dtype=jnp.float32
) -> jnp.ndarray:
    """(B,H,W,C) image (Lab or RGB channels) -> (B,H,W,C*N) smoothed energies
    in contract order (channel-major, global kernel index minor)."""
    c = img.shape[-1]
    parts = [_group_energies(img, g, dtype) for g in bank.groups]
    cat = jnp.concatenate(parts, axis=-1)
    perm = jnp.asarray(_energy_permutation(bank, c))
    return jnp.take(cat, perm, axis=-1)


def assemble_features(
    energies: jnp.ndarray,
    color: jnp.ndarray,
    cluster_cfg: ClusterConfig,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pixel feature vectors: energies ++ color, optionally standardized
    per-image (mean/std over pixels).

    After per-dim standardization the E energy dims would out-vote the 3
    color dims E/3-fold, so the color block is rescaled by sqrt(E/3) to give
    the texture and color cues equal total variance; ``color_weight`` is a
    user multiplier on top of that balance (same rule in golden/features.py).

    energies: (B,H,W,E), color: (B,H,W,3) -> (B,H,W,E+3) float32.
    """
    feats = jnp.concatenate(
        [energies.astype(jnp.float32), color.astype(jnp.float32)], axis=-1
    )
    if cluster_cfg.normalize:
        mean = jnp.mean(feats, axis=(1, 2), keepdims=True)
        std = jnp.std(feats, axis=(1, 2), keepdims=True)
        feats = (feats - mean) / (std + eps)
    e = energies.shape[-1]
    cw = cluster_cfg.color_weight * float(np.sqrt(e / 3.0))
    scale = jnp.concatenate(
        [jnp.ones((e,), jnp.float32), jnp.full((3,), cw, jnp.float32)]
    )
    return feats * scale


@partial(jax.jit, static_argnums=(1, 2, 3))
def _features_jit(lab, bank, cluster_cfg, dtype):
    energies = gabor_energies(lab, bank, dtype)
    return assemble_features(energies, lab, cluster_cfg)


def gabor_features(
    lab: jnp.ndarray,
    bank: GaborBank,
    cluster_cfg: Optional[ClusterConfig] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Convenience: (B,H,W,3) color-space image -> (B,H,W,3N+3) features."""
    if cluster_cfg is None:
        cluster_cfg = ClusterConfig()
    return _features_jit(lab, bank, cluster_cfg, dtype)
