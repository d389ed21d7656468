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

Feature layout contract (shared with golden/ and all three implementations):

    energies = concat over scale groups of per-group blocks; within a group
    the block is KERNEL-major, channel-minor:

        energies[..., group_offset(g) + j_within_group * C + ch]

    (feature order is irrelevant to the clustering stages — distances are
    permutation-invariant across dims — so the contract is chosen to be the
    natural zero-copy output order of the fused Pallas kernel; golden/ and
    the XLA paths emit the identical order.)

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


def _conv_precision(dtype):
    """f32 mode pins HIGHEST (TPU DEFAULT rounds f32 conv operands to
    bf16 — the repo-wide precision rule); bf16 operands are already
    bf16-exact, so DEFAULT is lossless and faster there."""
    return (
        lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
        else lax.Precision.DEFAULT
    )


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
        precision=_conv_precision(dtype),
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
        precision=_conv_precision(dtype),
    )
    x = _reflect_pad(x, 0, r)
    x = lax.conv_general_dilated(
        x.astype(dtype), th.astype(dtype), (1, 1), "VALID",
        dimension_numbers=_DN, feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=_conv_precision(dtype),
    )
    return x


def _group_energies(img: jnp.ndarray, group: ScaleGroup, dtype) -> jnp.ndarray:
    """Energies for one scale group. img: (B,H,W,C) -> (B,H,W,n_g*C) in
    contract order (kernel-major, channel-minor)."""
    b, h, w, c = img.shape
    n = len(group.kernel_indices)
    r = group.ksize // 2
    filt = jnp.asarray(group.filters_hwio)  # (k,k,1,2n)
    x = _reflect_pad(img, r, r)
    resp = _depthwise_conv(x, filt, dtype)  # (B,H,W,C*2n) [ch-major groups]
    re = resp[..., 0::2]
    im = resp[..., 1::2]
    mag = jnp.sqrt(re * re + im * im)  # (B,H,W,C*n) channel-major
    taps = jnp.asarray(group.smooth_taps)
    sm = _separable_smooth(mag, taps, dtype)
    # channel-major -> kernel-major (contract order; cheap last-dim shuffle)
    return jnp.transpose(sm.reshape(b, h, w, c, n), (0, 1, 2, 4, 3)).reshape(
        b, h, w, n * c
    )


def energy_index(bank: GaborBank, n_channels: int, kernel_idx: int, ch: int) -> int:
    """Contract-order position of (global kernel index, channel) in the
    energy axis: group blocks in bank.groups order, kernel-major within."""
    offset = 0
    for g in bank.groups:
        if kernel_idx in g.kernel_indices:
            j = g.kernel_indices.index(kernel_idx)
            return offset + j * n_channels + ch
        offset += len(g.kernel_indices) * n_channels
    raise IndexError(kernel_idx)


def gabor_energies(
    img: jnp.ndarray, bank: GaborBank, dtype=jnp.float32
) -> jnp.ndarray:
    """(B,H,W,C) image (Lab or RGB channels) -> (B,H,W,N*C) smoothed energies
    in contract order (group blocks; kernel-major, channel-minor within)."""
    parts = [_group_energies(img, g, dtype) for g in bank.groups]
    return jnp.concatenate(parts, axis=-1)


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

    ``cluster_cfg.feature_set`` ablates one cue: "color" drops the energy
    block entirely (color-only clustering, unit scale), "texture" drops the
    color block. "full" is bit-identical to the pre-knob behavior.
    """
    fs = getattr(cluster_cfg, "feature_set", "full")
    if fs == "color":
        energies = energies[..., :0]
    elif fs == "texture":
        color = color[..., :0]
    elif fs != "full":
        raise ValueError(f"unknown feature_set {fs!r}")
    out_dtype = energies.dtype if energies.dtype == jnp.bfloat16 else jnp.float32
    feats = jnp.concatenate(
        [energies.astype(out_dtype), color.astype(out_dtype)], axis=-1
    )
    e = energies.shape[-1]
    nc = color.shape[-1]
    cw = cluster_cfg.color_weight * float(np.sqrt(e / 3.0)) if e else 1.0
    scale = jnp.concatenate(
        [jnp.ones((e,), jnp.float32), jnp.full((nc,), cw, jnp.float32)]
    )
    if cluster_cfg.normalize:
        # moments accumulate in f32 regardless of the storage dtype. One-pass
        # variance (E[x^2] - mu^2, golden mirrors the identical formula): a
        # named f32 copy of the feature tensor would MATERIALIZE (10.4 GB for
        # a 4K batch-8 — measured HBM OOM); with the casts appearing once per
        # consumer XLA fuses them into the reductions and the normalize.
        mean = jnp.mean(feats, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        sq = jnp.mean(
            jnp.square(feats.astype(jnp.float32)), axis=(1, 2), keepdims=True
        )
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        std = jnp.sqrt(var)
        out = (feats.astype(jnp.float32) - mean) / (std + eps) * scale
    else:
        out = feats.astype(jnp.float32) * scale
    if getattr(cluster_cfg, "cue_weight", "static") == "coherence":
        cw_ = coherence_weights(out, eps)
        p = float(getattr(cluster_cfg, "coherence_pow", 1.0))
        out = out * (cw_ if p == 1.0 else cw_ ** p)
    return out.astype(out_dtype)


_COH_BLOCK = 8  # coherence pooling window (pixels per side)


def coherence_weights(feats: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(B, H, W, D) -> (B, 1, 1, D) per-image region-scale coherence weights:
    std of 8x8 block means over std (ClusterConfig.cue_weight docstring;
    golden mirror: golden/features.py::coherence_weights_np). Identity when
    the image is too small to pool (< 2 blocks per side)."""
    b, h, w, d = feats.shape
    n = _COH_BLOCK
    hb, wb = h // n, w // n
    if hb < 2 or wb < 2:
        return jnp.ones((b, 1, 1, d), jnp.float32)
    f = feats[:, : hb * n, : wb * n].astype(jnp.float32)
    p = jnp.mean(f.reshape(b, hb, n, wb, n, d), axis=(2, 4))
    pm = jnp.mean(p, axis=(1, 2), keepdims=True)
    pv = jnp.maximum(
        jnp.mean(jnp.square(p), axis=(1, 2), keepdims=True) - jnp.square(pm),
        0.0,
    )
    fm = jnp.mean(f, axis=(1, 2), keepdims=True)
    fv = jnp.maximum(
        jnp.mean(jnp.square(f), axis=(1, 2), keepdims=True) - jnp.square(fm),
        0.0,
    )
    return jnp.sqrt(pv) / (jnp.sqrt(fv) + eps)


def coherence_weights_cm(
    groups, color_cm: jnp.ndarray, a: jnp.ndarray, eps: float = 1e-6,
    pooled=None, s_full: jnp.ndarray = None,
) -> jnp.ndarray:
    """Coherence weights from RAW channel-major buffers — the fast-path
    form that lets the transposed/CHW pipelines FOLD cue_weight="coherence"
    into their standardization affine instead of falling back to NHWC
    (VERDICT r3 task 5).

    groups: tuple of (B, C_g, H, W) raw energy buffers (the fused kernel's
    grouped output); color_cm: (B, >=3, H, W) raw color rows (extra rows
    ignored); a: (B, D) the standardization-affine multiplier from
    _affine_params/_norm_affine. Returns (B, D) weights equal to
    ``coherence_weights`` on the standardized NHWC features in real
    arithmetic: standardization is per-dim affine and block means commute
    with affines, so std(blockmean(std-space))/std(std-space) =
    (a*std(blockmean(raw))) / (a*std(raw)); carrying ``a`` through keeps
    even the eps regularizer at the NHWC formula's scale. Identity (ones)
    when the image is too small to pool — the NHWC rule.

    Round-5 perf rework (the fold cost config1 ~30 ms/op at batch 16 —
    the 8x8 block means via a 6-D reshape LANE-SPLIT the full-res 243-
    channel tensor, a multi-GB relayout): block means now ride the
    measured-cheap _pool2x2_cm MXU pooling matmuls, seeded by the
    caller's 2x2 twins when available (``pooled`` = (group twins tuple,
    color twin) — 2x2 means of 2x2 means are exact 4x/8x means), and the
    full-res stds are REUSED from the standardization moments
    (``s_full`` (B, D)) instead of a second full-res pass. Two measured
    deltas vs the NHWC formula, both inside the coherence heuristic's
    tolerance (weights feed a ^p cue re-weighting, and the production
    decision swept a 4x sigma range): _pool2x2_cm rounds intermediate
    block sums to bf16 (~1e-3 relative on the block means), and s_full
    is the FULL-image std where the NHWC formula crops to the 8x8-
    divisible prefix (<= 0.4% of pixels at 321x481)."""
    n = _COH_BLOCK
    bufs = list(groups) + [color_cm[:, :3]]
    b, _, h, w = bufs[0].shape
    hb, wb = h // n, w // n
    d = sum(x.shape[1] for x in bufs)
    if hb < 2 or wb < 2:
        return jnp.ones((b, d), jnp.float32)
    if pooled is not None:
        pg, pc = pooled
        pbufs = list(pg) + [pc[:, :3]]
    else:
        pbufs = [_pool2x2_cm(x) for x in bufs]
    sp_ = []
    for q in pbufs:
        q = _pool2x2_cm(_pool2x2_cm(q[:, :, : 4 * hb, : 4 * wb]))
        qf = q.astype(jnp.float32)  # (B, C, hb, wb) 8x8 block means
        pm = jnp.mean(qf, axis=(2, 3))
        pv = jnp.maximum(
            jnp.mean(jnp.square(qf), axis=(2, 3)) - jnp.square(pm), 0.0
        )
        sp_.append(jnp.sqrt(pv))
    sp = jnp.concatenate(sp_, axis=1)  # (B, D)
    if s_full is not None:
        sf = s_full
    else:
        sf_ = []
        for buf in bufs:
            f = buf[:, :, : hb * n, : wb * n].astype(jnp.float32)
            fm = jnp.mean(f, axis=(2, 3))
            fv = jnp.maximum(
                jnp.mean(jnp.square(f), axis=(2, 3)) - jnp.square(fm), 0.0
            )
            sf_.append(jnp.sqrt(fv))
        sf = jnp.concatenate(sf_, axis=1)
    return (a * sp) / (a * sf + eps)


def fold_coherence_affine(
    a: jnp.ndarray, b_aff: jnp.ndarray, groups, color_cm, cluster_cfg,
    eps: float = 1e-6, pooled=None, s_full=None,
):
    """Fold cue_weight="coherence" into a standardization affine (a, b):
    normalized-and-weighted = raw * (a*c^p) + (b*c^p). No-op for
    cue_weight="static". ``pooled``/``s_full`` pass through to
    coherence_weights_cm (the round-5 fast statistics)."""
    if getattr(cluster_cfg, "cue_weight", "static") != "coherence":
        return a, b_aff
    c = coherence_weights_cm(groups, color_cm, a, eps, pooled, s_full)
    p = float(getattr(cluster_cfg, "coherence_pow", 1.0))
    w = c if p == 1.0 else c ** p
    return a * w, b_aff * w


def assemble_features_t(
    energies_cm: jnp.ndarray,
    color: jnp.ndarray,
    cluster_cfg: ClusterConfig,
    dp: int,
    n_pad: int,
    eps: float = 1e-6,
    out_dtype=None,
) -> jnp.ndarray:
    """Transposed assembly: channel-major energies -> solver-ready ``xt``.

    energies_cm: (B, E, H, W) — the fused kernel's native layout
    (``gabor_energies_fused(..., channel_major=True)``); color: (B, H, W, 3).
    Returns (B, dp, n_pad) in the ``xt_geometry`` layout of
    models/kmeans_pallas.py: rows [:E] standardized energies, rows [E:E+3]
    scaled color, row E+3 ones, zero padding elsewhere.

    Same math as ``assemble_features`` (one-pass f32 moments, sqrt(E/3)
    color balance); only the reduction layout differs, so borderline pixels
    may flip vs the NHWC path within float tolerance. Skips the kernel-exit
    NHWC transpose, the NHWC feature write AND the solver's transposed
    rebuild — three full-tensor HBM round-trips at config1 scale.
    """
    b, e, h, w = energies_cm.shape
    n = h * w
    d = e + 3
    if out_dtype is None:  # caller may override the derived storage dtype
        out_dtype = (
            energies_cm.dtype if energies_cm.dtype == jnp.bfloat16
            else jnp.float32
        )
    e_t = energies_cm.reshape(b, e, n)
    color_cm = jnp.transpose(color, (0, 3, 1, 2))
    c_t = color_cm.reshape(b, 3, n)
    a_e, b_e, a_c, b_c, s_full = _norm_affine(e_t, c_t, cluster_cfg, eps)
    a_e, b_e, a_c, b_c = _fold_coherence_parts(
        a_e, b_e, a_c, b_c, energies_cm, color_cm, cluster_cfg, eps,
        s_full=s_full,
    )
    # NO concat of energies+color (materializing the fused buffer measured
    # ~3 ms extra) and normalization folded into one fma per part: two
    # reads + the xt write, near the HBM floor
    xt = jnp.zeros((b, dp, n_pad), out_dtype)
    xt = xt.at[:, :e, :n].set(
        (e_t.astype(jnp.float32) * a_e + b_e).astype(out_dtype)
    )
    xt = xt.at[:, e:d, :n].set(
        (c_t.astype(jnp.float32) * a_c + b_c).astype(out_dtype)
    )
    xt = xt.at[:, d, :n].set(1.0)
    return xt


def _fold_coherence_parts(
    a_e, b_e, a_c, b_c, energies_cm, color_cm, cluster_cfg, eps,
    pooled=None, s_full=None,
):
    """fold_coherence_affine for the split (energy, color) affine parts of
    _norm_affine ((B, E, 1) / (B, 3, 1) shapes). No-op for static."""
    if getattr(cluster_cfg, "cue_weight", "static") != "coherence":
        return a_e, b_e, a_c, b_c
    e = energies_cm.shape[1]
    b = energies_cm.shape[0]
    a_full = jnp.concatenate(
        [jnp.broadcast_to(a_e, (b, e, 1))[:, :, 0],
         jnp.broadcast_to(a_c, (b, 3, 1))[:, :, 0]], axis=1
    )
    c = coherence_weights_cm(
        (energies_cm,), color_cm, a_full, eps, pooled, s_full
    )
    p = float(getattr(cluster_cfg, "coherence_pow", 1.0))
    w = (c if p == 1.0 else c ** p)[:, :, None]  # (B, D, 1)
    return (
        a_e * w[:, :e], b_e * w[:, :e], a_c * w[:, e:], b_c * w[:, e:]
    )


def _norm_affine(e_t: jnp.ndarray, c_t: jnp.ndarray, cluster_cfg, eps):
    """Per-row affine (a, b) folding standardization + color weighting:
    normalized = raw * a + b. e_t: (B, E, N); c_t: (B, 3, N). Returns
    (a_e, b_e, a_c, b_c, s_full) with s_full the (B, D) raw stds (None
    when normalize is off) for reuse by the coherence fold."""
    e = e_t.shape[1]
    cw = cluster_cfg.color_weight * float(np.sqrt(e / 3.0))
    if cluster_cfg.normalize:
        def moments(x):
            mean = jnp.mean(x, axis=2, keepdims=True, dtype=jnp.float32)
            sq = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=2, keepdims=True
            )
            std = jnp.sqrt(jnp.maximum(sq - jnp.square(mean), 0.0))
            return mean, std

        m_e, s_e = moments(e_t)
        m_c, s_c = moments(c_t)
        a_e = 1.0 / (s_e + eps)
        a_c = cw / (s_c + eps)
        s_full = jnp.concatenate([s_e[:, :, 0], s_c[:, :, 0]], axis=1)
        return a_e, -m_e * a_e, a_c, -m_c * a_c, s_full
    ones = jnp.ones((1, e, 1), jnp.float32)
    zeros = jnp.zeros((1, e, 1), jnp.float32)
    return (ones, zeros, jnp.full((1, 3, 1), cw, jnp.float32), zeros[:, :3],
            None)


def assemble_xp_from_affine(
    pe_cm: jnp.ndarray,
    pc4: jnp.ndarray,
    a: jnp.ndarray,
    b_aff: jnp.ndarray,
    dp: int,
    m_pad: int,
    out_dtype,
) -> jnp.ndarray:
    """Pooled channel-major buffers + precomputed affine -> normalized xp.

    pe_cm: (B, E, H2, W2) raw pooled energies (the feature kernel's in-VMEM
    2x2 twin, fused_pallas pooled=True), or a tuple of per-scale-group
    buffers (B, E_g, H2, W2) — the concat-free pipeline writes each group's
    rows directly; pc4: (B, 4, H2, W2) pooled color4; a, b_aff: (B, E+3)
    per-row standardization affine computed from the FULL-resolution
    moments (kmeans_chw._affine_params) — pooling commutes with the affine,
    so normalizing pooled raw rows equals pooling normalized features in
    real arithmetic. Returns (B, dp, m_pad) in the xt_geometry layout
    (ones-row at E+3, zero padding)."""
    groups = tuple(pe_cm) if isinstance(pe_cm, (tuple, list)) else (pe_cm,)
    b, _, h2, w2 = groups[0].shape
    m = h2 * w2
    e = sum(g.shape[1] for g in groups)
    d = e + 3
    f32 = jnp.float32
    c_t = pc4[:, :3].reshape(b, 3, m)
    xp = jnp.zeros((b, dp, m_pad), out_dtype)
    r0 = 0
    for g in groups:
        eg = g.shape[1]
        e_t = g.reshape(b, eg, m)
        xp = xp.at[:, r0 : r0 + eg, :m].set(
            (e_t.astype(f32) * a[:, r0 : r0 + eg, None]
             + b_aff[:, r0 : r0 + eg, None]).astype(out_dtype)
        )
        r0 += eg
    xp = xp.at[:, e:d, :m].set(
        (c_t.astype(f32) * a[:, e:, None] + b_aff[:, e:, None]).astype(out_dtype)
    )
    xp = xp.at[:, d, :m].set(1.0)
    return xp


def _pool2x2_cm(x_cm: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) channel-major -> (B, C, H//2, W//2) exact 2x2 means.

    MXU matmuls against banded 0.5-weight pooling matrices: on TPU the
    strided-slice form relayouts (~22 ms at config1 scale) and
    reduce_window costs ~11 ms; the two dots measured ~3.6 ms. 0.5 weights
    and bf16 inputs multiply exactly; accumulation is f32."""
    b, c, h, w = x_cm.shape
    h2, w2 = h // 2, w // 2
    pv = np.zeros((h2, h), np.float32)
    pv[np.arange(h2), 2 * np.arange(h2)] = 0.5
    pv[np.arange(h2), 2 * np.arange(h2) + 1] = 0.5
    ph = np.zeros((w, w2), np.float32)
    ph[2 * np.arange(w2), np.arange(w2)] = 0.5
    ph[2 * np.arange(w2) + 1, np.arange(w2)] = 0.5
    mm = jnp.bfloat16 if x_cm.dtype == jnp.bfloat16 else x_cm.dtype
    prec = (
        jax.lax.Precision.HIGHEST if mm == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    v = jax.lax.dot_general(
        jnp.asarray(pv, mm), x_cm, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (h2, B, C, W)
    o = jax.lax.dot_general(
        v.astype(mm), jnp.asarray(ph, mm), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (h2, B, C, w2)
    return jnp.transpose(o, (1, 2, 0, 3)).astype(x_cm.dtype)


def assemble_features_t_pooled(
    energies_cm: jnp.ndarray,
    color: jnp.ndarray,
    cluster_cfg: ClusterConfig,
    dp: int,
    n_pad: int,
    pooled_pad: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """assemble_features_t PLUS the 2x2-pooled twin buffer for the multigrid
    Lloyd warmup (ClusterConfig.coarse_iters).

    Returns (xt (B, dp, n_pad), xp (B, dp, pooled_pad)). Pooling happens on
    the RAW channel-major energies/color (MXU pooling matmuls, _pool2x2_cm)
    and the pooled rows are standardized with the FULL image's moments —
    normalization is a per-row affine map, so this equals pooling the
    normalized features (models.kmeans.pool2x2 semantics) exactly in real
    arithmetic; float drift is ulp-level and covered by the label-agreement
    floors."""
    b, e, h, w = energies_cm.shape
    n = h * w
    d = e + 3
    out_dtype = (
        energies_cm.dtype if energies_cm.dtype == jnp.bfloat16
        else jnp.float32
    )
    e_t = energies_cm.reshape(b, e, n)
    color_cm = jnp.transpose(color, (0, 3, 1, 2))
    c_t = color_cm.reshape(b, 3, n)
    # pool the KERNEL OUTPUT directly (contiguous) — pooling a concatenated
    # feats buffer forces XLA to materialize + relayout it (measured ~29 ms
    # extra at config1 scale); the twins also seed the coherence fold's
    # 8x8 block means (round-5 fast statistics)
    pooled_e = _pool2x2_cm(energies_cm)
    pooled_c = _pool2x2_cm(color_cm)
    a_e, b_e, a_c, b_c, s_full = _norm_affine(e_t, c_t, cluster_cfg, eps)
    a_e, b_e, a_c, b_c = _fold_coherence_parts(
        a_e, b_e, a_c, b_c, energies_cm, color_cm, cluster_cfg, eps,
        pooled=((pooled_e,), pooled_c), s_full=s_full,
    )
    m = pooled_e.shape[2] * pooled_e.shape[3]
    pe_t = pooled_e.reshape(b, e, m)
    pc_t = pooled_c.reshape(b, 3, m)

    xt = jnp.zeros((b, dp, n_pad), out_dtype)
    xt = xt.at[:, :e, :n].set(
        (e_t.astype(jnp.float32) * a_e + b_e).astype(out_dtype)
    )
    xt = xt.at[:, e:d, :n].set(
        (c_t.astype(jnp.float32) * a_c + b_c).astype(out_dtype)
    )
    xt = xt.at[:, d, :n].set(1.0)
    xp = jnp.zeros((b, dp, pooled_pad), out_dtype)
    xp = xp.at[:, :e, :m].set(
        (pe_t.astype(jnp.float32) * a_e + b_e).astype(out_dtype)
    )
    xp = xp.at[:, e:d, :m].set(
        (pc_t.astype(jnp.float32) * a_c + b_c).astype(out_dtype)
    )
    xp = xp.at[:, d, :m].set(1.0)
    return xt, xp


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
