"""Fused Pallas TPU kernel: Gabor conv + magnitude + energy smoothing in one
VMEM pass (BASELINE.json north_star; SURVEY.md C4-C6).

Math = the modulated-separable factorization (ops/modulated.py, exact for
gamma=1): per scale group and per complex kernel j

    modulate   M = I_pad .* exp(-i w_j q)          (VPU, in-kernel iota phase)
    blur       G = E_v @ M @ E_h                   (MXU: banded-Toeplitz
                                                    matrices of the truncated
                                                    1-D envelope taps)
    demod      re + i im = exp(i w_j p) G ;  re -= mu_j * box(I)
    magnitude  mag = sqrt(re^2 + im^2)             (VPU)
    smooth     out = S_v @ mag @ S_h               (MXU: normalized Gaussian
                                                    Toeplitz)

Everything for one (image, kernel-chunk) grid step lives in VMEM — the
(B,H,W,6N) complex responses and (B,H,W,3N) magnitudes that the unfused path
round-trips through HBM never materialize. The 1-D convolutions are cast as
dense Toeplitz matmuls: ~Hp/k more FLOPs than the taps need, but they run on
the MXU at ~50x the VPU rate that XLA's depthwise lowering achieves, and the
fp32 accumulation matches the unfused path's numerics.

Layout: channel-first (C, H, W) inside the kernel so H x W land on
(sublane, lane); the host-side wrapper pads/transposes and restores the
framework's (B, H, W, C*N) contract order.

Whole-image blocks (BSDS 321x481 padded ~ 2.7 MB fp32) fit VMEM comfortably;
larger images go through the spatial tiler (parallel/tiling.py) which feeds
this same kernel tile-by-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.ops.bank import GaborBank, ScaleGroup
from gabor_color_image_segmentation_tpu.ops.modulated import (
    _dc_mu,
    _envelope_taps,
    group_frequencies,
)

# Banded-dot chunk tuning (see _chunk_step inside _group_kernel). Module
# globals so the sweep experiment can retune; production values are the
# measured optimum.
_CHUNK_MODE = "fixed"  # "fixed": step = _CHUNK_WINDOW rows/cols per chunk
_CHUNK_WINDOW = 128

# Kernels per grid step (None = the heuristic in _fused_group). Module
# global so experiments/exp_nc_sweep.py can retune; per-element math is
# identical for any value that divides the group size, only grid-step
# amortization and VMEM residency change.
_N_C_OVERRIDE: int | None = None

# vmod (pre-modulated vertical envelope) path toggle. STATUS: measured
# NEGATIVE result, kept for the record (experiments/exp_vmod.py,
# 2026-08-19): folding EV @ (img o cy) into (EV o cy) @ img removes the
# full-size (Hp, Wp) modulated-plane VPU builds that stage ablation priced
# at ~3.8 ms/op — yet config1 batch-16 measured 17.95 (plain) vs 18.05
# (vmod) ms/op. The plane builds evidently overlap with the MXU dots, so
# deleting VPU work buys nothing while the per-kernel matrix DMA adds a
# little. Production therefore keeps the plain path (None/False); tests
# still pin vmod's numerics so the record stays executable.
_VMOD_OVERRIDE: bool | None = None

# Measurement-only stage ablation (experiments/exp_stage_ablation.py reads
# the per-stage cost of the kernel by deleting stages; NEVER set in
# production — results are numerically wrong by design). Recognized items:
# "im" (skip the imaginary blur pair), "blur" (skip the envelope dots),
# "smooth" (skip energy smoothing), "modulate" (skip the phase build),
# "demod" (skip the output phase + DC correction; also lets XLA DCE the
# box filter), "sqrt" (skip the magnitude sqrt).
_ABLATE: frozenset = frozenset()


def _toeplitz(taps: np.ndarray, n_out: int, dtype) -> np.ndarray:
    """(n_out, n_out + len(taps) - 1) banded correlation matrix T with
    T[i, i+t] = taps[t]; out = T @ x computes VALID 1-D correlation."""
    k = len(taps)
    t = np.zeros((n_out, n_out + k - 1), np.float32)
    for i in range(n_out):
        t[i, i : i + k] = taps
    return t.astype(dtype)


def _toeplitz_reflect(taps: np.ndarray, n: int, dtype) -> np.ndarray:
    """(n, n) SAME-size correlation matrix with REFLECT_101 borders folded in:
    T[i, reflect(i - r + t)] += taps[t]. Applying it to an UNPADDED signal
    equals reflect-pad + VALID correlation — this is how the fused kernel
    reproduces the reference's smooth(reflect_pad(magnitude)) border
    semantics exactly (reflecting the magnitude map, NOT extending the
    underlying complex response, which differs for diagonal orientations)."""
    k = len(taps)
    r = k // 2
    t = np.zeros((n, n), np.float32)
    for i in range(n):
        for tt in range(k):
            j = i - r + tt
            # REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ...
            while j < 0 or j >= n:
                if j < 0:
                    j = -j
                if j >= n:
                    j = 2 * (n - 1) - j
            t[i, j] += taps[tt]
    return t.astype(dtype)


def _group_kernel(
    x_ref,  # (1, C, Hp, Wp) f32 padded image (Hp = H + 2p)
    bv_ref,  # (H, Hp) ones-band Toeplitz (vertical box correlation)
    bh_ref,  # (Wp, W) ones-band Toeplitz (horizontal box, transposed)
    par_ref,  # (n_chunks, 3*n_c) f32 SMEM (full): [wx..., wy..., mu...]
    *refs,  # [ev (H, Hp)] plain mode OR [evc, evs (n_c, H, Hp)] vmod mode,
    # then eh (Wp, W), sv (H, H), sh (W, W) (smoothing REFLECT_101 folded,
    # transposed on the right), [svp (H2, H), shp (W, W2)] if pooled, then
    # out_ref(s), then box scratch (C, H, W) f32 (filled on chunk 0,
    # reused after)
    c: int,
    n_c: int,
    p: int,
    sradius: int,
    mm_dtype,
    precision,
    pooled: bool,
    vmod: bool,
):
    if vmod:
        # bf16 production mode: the vertical envelope Toeplitz arrives
        # pre-modulated per kernel — (EV o cos(wy*y)) and (EV o sin(wy*y)),
        # combined on the host in f64 and rounded once (see _fused_group)
        evc_ref, evs_ref, eh_ref, sv_ref, sh_ref, *refs = refs
        ev_ref = None
    else:
        ev_ref, eh_ref, sv_ref, sh_ref, *refs = refs
        evc_ref = evs_ref = None
    if pooled:
        svp_ref, shp_ref, out_ref, outp_ref, box_ref = refs
    else:
        out_ref, box_ref = refs
        svp_ref = shp_ref = outp_ref = None
    hp, wp = x_ref.shape[2], x_ref.shape[3]
    hmid, wmid = sv_ref.shape[0], eh_ref.shape[1]
    chunk = pl.program_id(1)

    # Banded-block dots: every Toeplitz here touches only a k- or 2r-wide
    # band, but a dense (H, Hp) @ (Hp, Wp) pays the full Hp contraction for
    # every output row. Splitting the output into chunks shrinks each
    # chunk's contraction window to (chunk + band). The chunk size is
    # chosen so that window <= 128 — the MXU pads the contraction dim to a
    # multiple of 128 lanes, so a (128 + band)-wide window silently costs
    # 256 MACs/row while (128 - band) rows at window exactly <= 128 hit the
    # 128 MACs/row floor (measured ~1.5x on the whole kernel vs fixed
    # 128-row chunks). Only exact-zero terms are dropped, so results are
    # bitwise-identical per element. Reflections folded into the smoothing
    # Toeplitz stay inside [max(0, r0-r), min(n, r1+r)) for every chunk
    # (border chunks clamp to the matrix edge), so the windows cover them
    # exactly. ``scale`` maps output rows to input coordinates (2 for the
    # stride-2 pooled-smoothing matrices, whose row i covers input
    # [2i + off_lo, 2i + 1 + off_hi]).
    def _chunk_step(band: int, scale: int) -> int:
        # chunk size of the banded dots: _CHUNK_MODE "fixed" reproduces the
        # original fixed-128-row chunking; "window" targets a fixed
        # contraction window (scale*step + band ~= _CHUNK_WINDOW). Swept on
        # TPU 2026-08-18 (see exp_bandstep.py): fixed-128 won — smaller
        # windows cut MACs but the extra dot dispatches cost more. The
        # stride-2 pooled-smoothing dots are the exception: a fixed-128
        # step at scale=2 gives a 2*128+band window that the MXU pads to
        # 384 lanes, so they cap the window instead (measured 2026-08-19:
        # energies+twin 22.8 -> 22.2 ms/op at config1 batch-16 — the rest
        # of the twin's ~2.3 ms is its output DMA, not MACs; bitwise-
        # identical — only exact-zero band terms are dropped either way).
        if _CHUNK_MODE == "fixed":
            if scale == 1:
                return _CHUNK_WINDOW
            return max(((_CHUNK_WINDOW - band) // scale) // 16 * 16, 16)
        for window in (_CHUNK_WINDOW, 256, 384, 512):
            step = ((window - band) // scale) // 16 * 16
            if step >= 16:
                return step
        return 128

    def dot_banded_left(t_ref, m, off_lo, off_hi, scale=1, lead=()):
        # ``lead``: leading indices into a >2-D ref (the per-kernel
        # pre-modulated vertical matrices in vmod mode); the banded dot
        # itself always runs on the trailing (rows, cols) plane.
        rows, cols = t_ref.shape[len(lead):]
        step = _chunk_step(off_hi - off_lo, scale)
        if rows <= max(step, 128) and scale == 1:
            return jnp.dot(t_ref[(*lead, slice(None), slice(None))], m,
                           preferred_element_type=jnp.float32,
                           precision=precision)
        parts = []
        for r0 in range(0, rows, step):
            r1 = min(rows, r0 + step)
            a = max(0, scale * r0 + off_lo)
            b = min(cols, scale * r1 + off_hi)
            parts.append(jnp.dot(t_ref[(*lead, slice(r0, r1), slice(a, b))],
                                 m[a:b],
                                 preferred_element_type=jnp.float32,
                                 precision=precision))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def dot_banded_right(m, t_ref, off_lo, off_hi, scale=1):
        rows, cols = t_ref.shape
        step = _chunk_step(off_hi - off_lo, scale)
        if cols <= max(step, 128) and scale == 1:
            return jnp.dot(m, t_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=precision)
        parts = []
        for c0 in range(0, cols, step):
            c1 = min(cols, c0 + step)
            a = max(0, scale * c0 + off_lo)
            b = min(rows, scale * c1 + off_hi)
            parts.append(jnp.dot(m[:, a:b], t_ref[a:b, c0:c1],
                                 preferred_element_type=jnp.float32,
                                 precision=precision))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    # 1-D coordinate vectors; the plane wave cos(wy y + wx x) is rank-2 in
    # outer products of these, so the (Hp, Wp) phase planes never materialize
    yv = jax.lax.broadcasted_iota(jnp.int32, (hp, 1), 0).astype(jnp.float32)
    xv = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(jnp.float32)

    ablate = _ABLATE
    # DC-correction box sums as banded ones-Toeplitz MXU dots, computed on
    # the FIRST kernel-chunk step of each image and cached in VMEM scratch
    # for the remaining chunks (scratch persists across grid steps). This
    # replaced an XLA cumsum-difference operand that alone cost 5.9 ms/op
    # at config1 batch-16 — a quarter of the whole feature stage
    # (exp_stage_ablation.py, 2026-08-19).
    if "demod" not in ablate and "box" not in ablate:
        @pl.when(chunk == 0)
        def _():
            for cc in range(c):
                bx = dot_banded_left(
                    bv_ref, x_ref[0, cc].astype(mm_dtype), 0, 2 * p
                )
                box_ref[cc] = dot_banded_right(
                    bx.astype(mm_dtype), bh_ref, 0, 2 * p
                )
    for jj in range(n_c):
        wx = par_ref[chunk, jj]
        wy = par_ref[chunk, n_c + jj]
        mu = par_ref[chunk, 2 * n_c + jj]
        cy, sy = jnp.cos(wy * yv), jnp.sin(wy * yv)  # (Hp, 1)
        cx, sx = jnp.cos(wx * xv), jnp.sin(wx * xv)  # (1, Wp)
        cyp, syp = cy[p : p + hmid], sy[p : p + hmid]
        cxp, sxp = cx[:, p : p + wmid], sx[:, p : p + wmid]
        for cc in range(c):
            img = x_ref[0, cc]

            if vmod:
                # Vertical modulation lives in the matrices: EV @ (img o cy)
                # = (EV o cy) @ img, so both vertical dots read the RAW
                # channel and the (Hp, Wp) modulated planes never
                # materialize. Horizontal modulation commutes with the left
                # dot (it scales columns), so it applies to the (H, Wp)
                # intermediates instead — strictly less VPU work.
                imgc = img.astype(mm_dtype)
                vc = dot_banded_left(evc_ref, imgc, 0, 2 * p, lead=(0, jj))
                vs = dot_banded_left(evs_ref, imgc, 0, 2 * p, lead=(0, jj))
                # EV @ m_re = vc o cx - vs o sx ; EV @ m_im = -(vs o cx
                # + vc o sx)  [m_re/m_im as in the plain path below]
                g_re = dot_banded_right(
                    (vc * cx - vs * sx).astype(mm_dtype), eh_ref, 0, 2 * p
                )
                if "im" in ablate:  # measurement-only
                    g_im = jnp.zeros_like(g_re)
                else:
                    g_im = dot_banded_right(
                        (-(vs * cx + vc * sx)).astype(mm_dtype),
                        eh_ref, 0, 2 * p,
                    )
            else:
                def blur(m):
                    if "blur" in ablate:  # measurement-only: skip envelope dots
                        return m[:hmid, :wmid].astype(jnp.float32)
                    v = dot_banded_left(ev_ref, m, 0, 2 * p)
                    return dot_banded_right(
                        v.astype(mm_dtype), eh_ref, 0, 2 * p
                    )

                # cos(wy y + wx x) = cy cx - sy sx ; sin = sy cx + cy sx
                # re/im processed sequentially so only one (Hp, Wp) modulated
                # buffer is live at a time (VMEM headroom)
                if "modulate" in ablate:  # measurement-only: raw image in
                    m_re = img.astype(mm_dtype)
                else:
                    m_re = (img * (cy * cx) - img * (sy * sx)).astype(mm_dtype)
                g_re = blur(m_re)  # (Hmid, Wmid) f32
                if "im" in ablate:  # measurement-only: drop imaginary pair
                    g_im = jnp.zeros_like(g_re)
                else:
                    if "modulate" in ablate:
                        m_im = img.astype(mm_dtype)
                    else:
                        m_im = (
                            -img * (sy * cx) - img * (cy * sx)
                        ).astype(mm_dtype)
                    g_im = blur(m_im)
            if "demod" in ablate:  # measurement-only: raw blur out
                re, im = g_re, g_im
            else:
                cos_p = cyp * cxp - syp * sxp
                sin_p = syp * cxp + cyp * sxp
                dc = 0.0 if "box" in ablate else mu * box_ref[cc]
                re = cos_p * g_re - sin_p * g_im - dc
                im = sin_p * g_re + cos_p * g_im
            if "sqrt" in ablate:  # measurement-only: no magnitude
                mag = (re + im).astype(mm_dtype)
            else:
                mag = jnp.sqrt(re * re + im * im).astype(mm_dtype)
            if "smooth" in ablate:  # measurement-only: unsmoothed energies
                sm = mag.astype(jnp.float32)
            else:
                sm = dot_banded_left(sv_ref, mag, -sradius, sradius)
                sm = dot_banded_right(
                    sm.astype(mm_dtype), sh_ref, -sradius, sradius
                )
            out_ref[0, 0, jj * c + cc] = sm.astype(out_ref.dtype)
            if pooled:
                # 2x2-pooled twin for the multigrid warmup, while mag is
                # still in VMEM: pooled = (P_v @ S_v) @ mag @ (S_h @ P_h)
                # with the stride-2 matrices precomputed on the host —
                # real-arithmetic equal to pooling the smoothed energies
                # (pooling and smoothing are both linear)
                pm = dot_banded_left(
                    svp_ref, mag, -sradius, 2 + sradius, scale=2
                )
                pm = dot_banded_right(
                    pm.astype(mm_dtype), shp_ref, -sradius, 2 + sradius,
                    scale=2,
                )
                outp_ref[0, 0, jj * c + cc] = pm.astype(outp_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _fused_group(
    img: jnp.ndarray, group: ScaleGroup, bank: GaborBank, dtype,
    channel_major: bool = False, pooled: bool = False,
):
    """(B, H, W, C) -> (B, H, W, n_g*C) energies for one scale group in
    contract order (kernel-major, channel-minor — features.py docstring).
    channel_major=True returns (B, n_g*C, H, W) instead — the kernel's
    native layout — skipping the NHWC transpose (the transposed clustering
    path consumes this directly). pooled=True (channel_major only) returns
    (energies, pooled2x2) where the 2x2-mean twin is produced inside the
    kernel via pre-pooled smoothing Toeplitz matrices — the multigrid
    warmup's input without a separate full-tensor pooling pass."""
    b, h, w, c = img.shape
    n = len(group.kernel_indices)
    p = group.ksize // 2
    r = group.smooth_radius
    halo = p  # conv halo only; smoothing borders fold into the Toeplitz
    hmid, wmid = h, w
    hp, wp = h + 2 * halo, w + 2 * halo

    # kernels per grid step: more kernels amortize per-step overheads and
    # overlap DMA with compute; VMEM peak stays modest since the conv-only
    # halo shrank (smoothing borders live in the Toeplitz matrices now).
    # Large tiles (config-4 spatial tiling) drop to one kernel per step —
    # the out block and Toeplitz matrices scale with the tile area.
    n_c = 2 if (n % 2 == 0 and h * w <= 400_000) else 1
    if _N_C_OVERRIDE is not None and n % _N_C_OVERRIDE == 0:
        n_c = _N_C_OVERRIDE
    n_chunks = n // n_c

    mm_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    # vmod: fold the VERTICAL modulation into per-kernel envelope Toeplitz
    # matrices (EV o cos(wy*y), EV o sin(wy*y)), combined on the host in
    # f64 and rounded once — the (Hp, Wp) modulated planes never
    # materialize in VMEM. bf16-only: the fold changes f32 rounding
    # (product association) and f32 parity mode's 1.0000 golden numbers
    # were pinned against the plain path (PARITY.md). OFF in production —
    # measured perf-neutral (see _VMOD_OVERRIDE STATUS above).
    vmod = (
        bool(_VMOD_OVERRIDE)
        and mm_dtype == jnp.bfloat16
        and not (_ABLATE & {"blur", "modulate"})
    )

    def _mat(m: np.ndarray) -> jnp.ndarray:
        # pre-cast on host so the kernel holds exactly one copy in VMEM
        return jnp.asarray(m).astype(mm_dtype)

    env = _envelope_taps(group.sigma, p)
    ev_np = _toeplitz(env, hmid, np.float32)
    ev = None if vmod else _mat(ev_np)
    eh = _mat(_toeplitz(env, wmid, np.float32).T)
    ones_taps = np.ones(group.ksize, np.float32)
    bv = _mat(_toeplitz(ones_taps, hmid, np.float32))
    bh = _mat(_toeplitz(ones_taps, wmid, np.float32).T)
    sm = np.asarray(group.smooth_taps)
    sv_np = _toeplitz_reflect(sm, h, np.float32)
    sh_np = _toeplitz_reflect(sm, w, np.float32).T
    sv = _mat(sv_np)
    sh = _mat(sh_np)
    h2, w2 = h // 2, w // 2
    if pooled:
        # stride-2 pooled smoothing: row i = 0.5*(S_v[2i] + S_v[2i+1]);
        # col j = 0.5*(S_h[:, 2j] + S_h[:, 2j+1]) — (P @ S) precomputed in
        # f64 so bf16 mode rounds the COMBINED taps once
        svp = _mat(
            0.5 * (sv_np[0 : 2 * h2 : 2].astype(np.float64)
                   + sv_np[1 : 2 * h2 : 2]).astype(np.float32)
        )
        shp = _mat(
            0.5 * (sh_np[:, 0 : 2 * w2 : 2].astype(np.float64)
                   + sh_np[:, 1 : 2 * w2 : 2]).astype(np.float32)
        )

    freqs = group_frequencies(group, bank).astype(np.float32)  # (n, 2) [wx, wy]
    mus = _dc_mu(group, bank)  # (n,)
    par_in = jnp.asarray(
        np.concatenate(
            [
                freqs[:, 0].reshape(n_chunks, n_c),
                freqs[:, 1].reshape(n_chunks, n_c),
                mus.reshape(n_chunks, n_c),
            ],
            axis=1,
        )
    )  # (n_chunks, 3*n_c)

    if vmod:
        # per-kernel pre-modulated vertical envelopes, (n_chunks, n_c, H, Hp)
        # blocked along the chunk grid dim; y matches the kernel's padded
        # iota (0..Hp-1), wy rounded to f32 first to match par_ref
        ypad = np.arange(hp, dtype=np.float64)
        phase = freqs[:, 1].astype(np.float64)[:, None] * ypad[None, :]
        ev64 = ev_np.astype(np.float64)[None]  # (1, H, Hp)
        evc = _mat((ev64 * np.cos(phase)[:, None, :])
                   .reshape(n_chunks, n_c, hmid, hp))
        evs = _mat((ev64 * np.sin(phase)[:, None, :])
                   .reshape(n_chunks, n_c, hmid, hp))

    # channel-first, reflect-padded, per-channel CENTERED: for any constant
    # shift c the DC-corrected response is invariant (the mu*box correction
    # absorbs it exactly), and centering shrinks the large near-DC blur
    # intermediates ~5x — the difference between catastrophic cancellation
    # and clean bf16/MXU numerics (see tests/test_fused_pallas.py).
    img_cf = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
    img_cf = img_cf - jnp.mean(img_cf, axis=(2, 3), keepdims=True)
    xpad = jnp.pad(
        img_cf, ((0, 0), (0, 0), (halo, halo), (halo, halo)), mode="reflect"
    )

    precision = (
        jax.lax.Precision.HIGHEST
        if mm_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _group_kernel, c=c, n_c=n_c, p=p, sradius=len(sm) // 2,
        mm_dtype=mm_dtype, precision=precision, pooled=pooled, vmod=vmod,
    )

    in_specs = [
        pl.BlockSpec(
            (1, c, hp, wp), lambda i, j: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((hmid, hp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wp, wmid), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n_chunks, 3 * n_c), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    operands = [xpad, bv, bh, par_in]
    if vmod:
        in_specs += [
            pl.BlockSpec((1, n_c, hmid, hp), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_c, hmid, hp), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [evc, evs]
    else:
        in_specs += [
            pl.BlockSpec((hmid, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [ev]
    in_specs += [
        pl.BlockSpec((wp, wmid), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, hmid), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wmid, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [eh, sv, sh]
    out_specs = pl.BlockSpec(
        (1, 1, n_c * c, h, w), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # bf16 mode also stores bf16 energies: halves the kernel's write
    # traffic and keeps the whole feature tensor bf16 through clustering
    out_shape = jax.ShapeDtypeStruct((b, n_chunks, n_c * c, h, w), mm_dtype)
    if pooled:
        in_specs += [
            pl.BlockSpec((h2, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [svp, shp]
        out_specs = (out_specs, pl.BlockSpec(
            (1, 1, n_c * c, h2, w2), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (b, n_chunks, n_c * c, h2, w2), mm_dtype
        ))

    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            # per-image box sums, filled on chunk 0 and reused (persists
            # across grid steps)
            pltpu.VMEM((c, hmid, wmid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(
                2 * b * n * c
                * (hmid * hp * wp + hmid * wp * wmid + h * hmid * wmid + h * wmid * w)
            ),
            bytes_accessed=int(4 * b * (c * hp * wp + n * c * h * w)),
            transcendentals=int(2 * b * n_chunks * hp * wp),
        ),
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem stack limit is 16 MB; the fp32 whole-image
            # path peaks slightly above it on the large-halo groups
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    # (B, n_chunks, n_c*C, H, W) is already the contract order (kernel-major,
    # channel-minor) along a flattened channel axis — only the channel-first
    # -> channel-last layout change remains
    if pooled:
        out, outp = out
        return out.reshape(b, n * c, h, w), outp.reshape(b, n * c, h2, w2)
    out = out.reshape(b, n * c, h, w)
    if channel_major:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


def gabor_energies_fused(
    img: jnp.ndarray, bank: GaborBank, dtype=jnp.float32,
    channel_major: bool = False, pooled: bool = False,
    grouped: bool = False,
):
    """(B,H,W,C) -> (B,H,W,C*N) smoothed energies, contract order.

    Drop-in replacement for features.gabor_energies / modulated path.
    channel_major=True returns (B, C*N, H, W) — same feature order along
    axis 1, no NHWC transpose. pooled=True (requires channel_major)
    additionally returns the in-kernel 2x2-mean twin (B, C*N, H//2, W//2):
    ``(energies, pooled2x2)``. grouped=True (requires channel_major)
    returns the per-scale-group buffers as tuples instead of concatenating
    along the channel axis — the concat is a pure-HBM full-tensor copy
    (~6 ms/batch-16 at config1 scale) that grouped consumers (the CHW
    fused Lloyd, the grouped affine/assembly) never need.
    """
    if bank.config.gamma != 1.0:
        raise ValueError("fused pallas path requires isotropic envelope gamma=1")
    if pooled and not channel_major:
        raise ValueError("pooled energies require channel_major=True")
    if grouped and not channel_major:
        raise ValueError("grouped energies require channel_major=True")
    if pooled:
        parts = [_fused_group(img, g, bank, dtype, True, True)
                 for g in bank.groups]
        if grouped:
            return (
                tuple(p[0] for p in parts),
                tuple(p[1] for p in parts),
            )
        return (
            jnp.concatenate([p[0] for p in parts], axis=1),
            jnp.concatenate([p[1] for p in parts], axis=1),
        )
    parts = [_fused_group(img, g, bank, dtype, channel_major)
             for g in bank.groups]
    if grouped:
        return tuple(parts)
    return jnp.concatenate(parts, axis=1 if channel_major else -1)
