"""Relayout-free fused Lloyd on the feature kernel's native CHW layout.

Why this exists: the v3 transposed solver (kmeans_pallas.py) is at the HBM
floor PER PASS, but building its ``xt (B, dp, n_pad)`` buffer from the fused
feature kernel's channel-major output ``(B, E, H, W)`` costs ~25 ms at
config1 batch-16 — not arithmetic, pure RELAYOUT: TPU arrays tile the last
two dims, so flattening (H, W) -> N moves every element from an (h, w) tile
to a (dp, n) tile. No formulation avoids that copy as long as the solver
wants pixels on lanes and features on sublanes of a flattened buffer.

This module removes the copy by running Lloyd directly on the 4-D layout:

  * Inputs are the kernel's own ``energies_cm (B, E, H, W)`` plus a tiny
    ``color4 (B, 4, H, W)`` buffer (Lab rows + a ones-row whose update sums
    double as member counts). Blocks are ``(1, C, HB, W)`` — whole image
    rows, exactly the resident tiling, so every DMA is dense.
  * In-kernel, ``(C, HB, W)`` reshapes to ``(C*HB, W)`` for free (merging
    LEADING dims into the sublane dim never moves data — unlike merging
    (H, W) into lanes). One MXU dot with a BLOCK-DIAGONAL expanded weight
    matrix ``W[(kk, r), (d, r')] = wc[kk, d] * delta(r, r')`` computes the
    per-row, per-center scores of all HB rows at once; the k-major row
    order makes the argmin an unrolled leading-dim min. The extra MXU work
    (HB x the useful FLOPs) stays far below the DMA floor.
  * Per-image standardization is folded into the CENTER transform instead
    of the pixel buffer: for x = a*r + b (per-row affine; a also carries
    the sqrt(E/3) color balance), argmin_c ||x - c||^2 over raw rows r is
    scored as offs_c - 2*(a*(c - b)) . r with offs_c = ||c - b||^2, and the
    update maps raw member means back with the same affine. Real-arithmetic
    identical to clustering the normalized features (affine commutes with
    means); float rounding differs only at borderline pixels, covered by
    the same label-agreement floors as the xt path.
  * Maximin seeding uses the weighted form: d(x_i, p)^2 =
    sum_d a_d^2 (r_id - p_d)^2, with the probe-independent weighted
    ||x||^2 computed in-kernel from a block-diagonal a^2 matrix.
  * Labels are written as (B, H, W) int32 directly — the (B, N) -> (B, H,
    W) exit relayout of the xt path disappears too.

Multigrid (ClusterConfig.coarse_iters): the pooled twin stays 4-D — MXU
pooling matmuls (ops/features.py::_pool2x2_cm) produce (B, E, H/2, W/2) and
the same kernels run on it. Semantics (seeds, tie-breaks, pass schedule,
empty-cluster rule, fixed-point early exit) mirror
models/kmeans.py::kmeans and golden/cluster.py, which remain the
references; parity is pinned by tests/test_kmeans_chw.py.

Measured (TPU v5 lite, config1 batch-16 bf16, 2026-08-17): end-to-end
rgb->labels 74.6 -> ~51 ms/batch with identical PRI — the assemble stage
(~25 ms of relayouts) is gone and the label exit is free.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.ops.precision import precision_for

_K_PAD = 8  # centers on one sublane tile; same ceiling as kmeans_pallas
_HB = 16  # image rows per sub-tile = one bf16 sublane tile of (h, w)

# Sub-tiles per grid step (None = _pick_tsub heuristic). The expanded
# weight matrices scale with the SUB-TILE height (hb), not the grid-step
# block, so processing T sub-tiles per step reuses the same weights and
# issues the same dots in the same order — bitwise-identical labels and
# partial sums — while cutting grid steps (and their fixed per-step cost)
# by T. Module global so experiments can re-sweep. NOTE: read at TRACE
# time inside the jitted passes and not part of any jit key — a sweep MUST
# call jax.clear_caches() after each flip or it silently re-measures the
# stale trace (exp_nc_sweep.py shows the pattern for the sibling knobs).
_T_SUB_OVERRIDE: Optional[int] = None


def _num_blocks(h: int) -> int:
    return -(-h // _HB)


def _pick_tsub(nb: int, e: int, w: int, itemsize: int) -> int:
    """Largest divisor of nb (so the partial-sum count and the XLA-side
    reduction shape stay IDENTICAL to t_sub=1 — bitwise-equal results)
    whose per-step streamed block fits a ~12 MB VMEM budget (x2 for
    double buffering stays well under the 100 MB scoped limit)."""
    if _T_SUB_OVERRIDE is not None and nb % _T_SUB_OVERRIDE == 0:
        return _T_SUB_OVERRIDE
    best = 1
    for t in range(2, min(nb, 16) + 1):
        if nb % t == 0 and (e + 4) * _HB * t * w * itemsize <= 12 * 2**20:
            best = t
    return best


def _expand_diag(m: jnp.ndarray, hb: int) -> jnp.ndarray:
    """(B, R, D) -> (B, R*hb, D*hb) block-diagonal expansion:
    out[b, kk*hb + r, d*hb + r'] = m[b, kk, d] * delta(r, r')."""
    b, rr, d = m.shape
    eye = jnp.eye(hb, dtype=m.dtype)
    out = m[:, :, None, :, None] * eye[None, None, :, None, :]
    return out.reshape(b, rr * hb, d * hb)


# ---------------------------------------------------------------------------
# Lloyd pass
# ---------------------------------------------------------------------------


def _mask_invalid_rows_one(x, hb: int, h: int, i):
    """Zero the flattened (C*HB, W) rows whose image row lies past H.

    The last grid step's block reads beyond the array; the values are
    garbage (NaN in interpret mode). They would poison every dot through
    0 * garbage even where the block-diagonal weight is zero, so the loads
    are masked at the source. Row index of flat row (d, r) is r = idx % HB.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % hb
    return jnp.where((r + i * hb) < h, x, jnp.zeros_like(x))


def _mask_invalid_rows(xe, xc, hb: int, h: int, i):
    return (
        _mask_invalid_rows_one(xe, hb, h, i),
        _mask_invalid_rows_one(xc, hb, h, i),
    )


def _lloyd_chw_kernel(
    *refs,
    # inputs: G xe_refs (1, E_g, HB, W), xc_ref (1, 4, HB, W),
    #         G wce_refs (1, k*HB, E_g*HB) block-diag expanded energy
    #         weights, wcc_ref (1, k*HB, 4*HB) expanded color weights,
    #         offs_ref (1, 8, 128) f32 per-center score offsets in col 0
    # outputs: labels_ref (1, HB, W) int32,
    #          G pse_refs (1, 1, k, E_g*HB) f32 per-block partial raw sums,
    #          psc_ref (1, 1, k, 4*HB) f32 (color; row 3 = counts)
    #          (assign_only=True drops the ps* outputs entirely)
    # The per-group operands let the feature kernel's scale-group outputs
    # feed the solver DIRECTLY — no (B, E, H, W) concatenation pass over
    # the full feature tensor (a pure-HBM copy, ~6 ms/batch-16 at config1
    # scale). Scores/sums are identical: the concat dot is the sum of the
    # per-group dots over the same f32 accumulator structure.
    k: int,
    es: tuple,
    hb: int,
    h: int,
    w: int,
    assign_only: bool,
    t_sub: int,
):
    g = len(es)
    xe_refs = refs[:g]
    xc_ref = refs[g]
    wce_refs = refs[g + 1 : 2 * g + 1]
    wcc_ref = refs[2 * g + 1]
    offs_ref = refs[2 * g + 2]
    labels_ref = refs[2 * g + 3]
    if not assign_only:
        pse_refs = refs[2 * g + 4 : 3 * g + 4]
        psc_ref = refs[3 * g + 4]

    i = pl.program_id(1)
    prec = precision_for(xc_ref.dtype)
    # t_sub sub-tiles of hb rows per grid step: the weight matrices scale
    # with hb (one sub-tile), so every sub-tile reuses them and issues the
    # SAME dots as the t_sub=1 kernel — only the per-step fixed cost is
    # amortized. Static unroll; tile-aligned sublane slices.
    for t in range(t_sub):
        ii = i * t_sub + t  # global sub-tile index (= old program_id)
        sl = slice(t * hb, (t + 1) * hb)
        xes = [
            r[0, :, sl, :].reshape(eg * hb, w)
            for r, eg in zip(xe_refs, es)
        ]
        xc = xc_ref[0, :, sl, :].reshape(4 * hb, w)
        xc = _mask_invalid_rows_one(xc, hb, h, ii)
        xes = [_mask_invalid_rows_one(x, hb, h, ii) for x in xes]
        # one dot per group scores all hb rows for all centers: rows
        # ordered k-major so the argmin is an unrolled leading-dim min
        # below. Only the k REAL center rows are expanded (M = k*hb, not
        # _K_PAD*hb) — MXU cost scales with M and k=5 of 8 padded rows
        # would be 37% pure waste.
        s = jax.lax.dot_general(
            wcc_ref[0], xc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        for xg, wg in zip(xes, wce_refs):
            s = s + jax.lax.dot_general(
                wg[0], xg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (k*HB, W)
        s3 = s.reshape(k, hb, w)
        offs = offs_ref[0][:, 0:1]  # (8, 1)
        # scores = offs - 2*cross; unrolled first-min argmin over the k
        # real rows
        best = offs[0, 0] - 2.0 * s3[0]
        lbl = jnp.zeros((hb, w), jnp.int32)
        for kk in range(1, k):
            sc = offs[kk, 0] - 2.0 * s3[kk]
            m = sc < best
            lbl = jnp.where(m, jnp.int32(kk), lbl)
            best = jnp.where(m, sc, best)
        labels_ref[0, sl, :] = lbl
        if assign_only:
            # final-assignment pass: the caller only wants labels under
            # fixed centers, so the one-hot build + both raw-sum MXU dots
            # (half the pass's FLOPs) are skipped — bytes streamed are
            # identical, labels bitwise-identical (same scores, same
            # argmin).
            continue

        row = jax.lax.broadcasted_iota(jnp.int32, (1, hb, w), 1)
        valid = (row + ii * hb) < h  # rows past the image get no vote
        sub = jax.lax.broadcasted_iota(jnp.int32, (k, hb, w), 0)
        oh3 = ((sub == lbl[None]) & valid).astype(xc.dtype)
        oh = oh3.reshape(k * hb, w)

        def collapse(p, d):
            r = jax.lax.broadcasted_iota(jnp.int32, (k, hb, d * hb), 1)
            rp = jax.lax.broadcasted_iota(jnp.int32, (k, hb, d * hb), 2) % hb
            return jnp.sum(jnp.where(r == rp, p, 0.0), axis=1)

        # raw-sum update: contract lanes (the Q @ K^T MXU form), then
        # collapse the block-diagonal: psums[kk, (d, r')] =
        # sum_r P[(kk, r), (d, r')] masked to r == r'
        for xg, eg, pse_ref in zip(xes, es, pse_refs):
            pe = jax.lax.dot_general(
                oh, xg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(k, hb, eg * hb)
            pse_ref[0, t] = collapse(pe, eg)
        pc = jax.lax.dot_general(
            oh, xc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(k, hb, 4 * hb)
        psc_ref[0, t] = collapse(pc, 4)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _lloyd_chw_pass(xe_groups, xc4, wce_groups, wcc_x, offs, k: int,
                    hb: int, interpret: bool, assign_only: bool = False):
    """One fused assignment+accumulate pass over grouped (B, E_g, H, W) raw
    feature buffers (a single (B, E, H, W) array = the 1-group case).

    wce_groups/wcc_x: block-diag expanded weights (see _expand_diag), offs:
    (B, 8, 128) f32 score offsets in column 0. Returns (labels (B, H, W)
    int32, sums_e (B, K8, E) f32 concatenated over groups, sums_c4
    (B, K8, 4) f32) — raw-space sums; sums_c4[..., 3] is the member count.
    assign_only=True returns labels alone and skips the raw-sum dots.

    Each grid step processes t_sub sub-tiles of hb rows (see _pick_tsub):
    same dots, same per-sub-tile partial sums, identical XLA-side
    reduction shape — bitwise-equal to t_sub=1, minus the per-step cost.
    """
    if not isinstance(xe_groups, (tuple, list)):
        xe_groups = (xe_groups,)
    if not isinstance(wce_groups, (tuple, list)):
        wce_groups = (wce_groups,)
    b, _, h, w = xe_groups[0].shape
    es = tuple(x.shape[1] for x in xe_groups)
    e = sum(es)
    nb = _num_blocks(h)
    t_sub = _pick_tsub(nb, e, w, xe_groups[0].dtype.itemsize)
    nbo = nb // t_sub
    kernel = functools.partial(
        _lloyd_chw_kernel, k=k, es=es, hb=hb, h=h, w=w,
        assign_only=assign_only, t_sub=t_sub,
    )
    hs = hb * t_sub  # rows per grid step
    in_specs = (
        [pl.BlockSpec((1, eg, hs, w), lambda bi, i: (bi, 0, i, 0),
                      memory_space=pltpu.VMEM) for eg in es]
        + [pl.BlockSpec((1, 4, hs, w), lambda bi, i: (bi, 0, i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, k * hb, eg * hb), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM) for eg in es]
        + [pl.BlockSpec((1, k * hb, 4 * hb), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, 8, 128), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_specs = [
        pl.BlockSpec((1, hs, w), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, w), jnp.int32)]
    if not assign_only:
        out_specs += (
            [pl.BlockSpec((1, t_sub, k, eg * hb),
                          lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM) for eg in es]
            + [pl.BlockSpec((1, t_sub, k, 4 * hb),
                            lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)]
        )
        out_shape += (
            [jax.ShapeDtypeStruct((b, nb, k, eg * hb), jnp.float32)
             for eg in es]
            + [jax.ShapeDtypeStruct((b, nb, k, 4 * hb), jnp.float32)]
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b, nbo),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=int((2 if assign_only else 4)
                      * b * nb * k * hb * (e + 4) * hb * w),
            bytes_accessed=int(
                xe_groups[0].dtype.itemsize * b * (e + 4) * h * w
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*xe_groups, xc4, *wce_groups, wcc_x, offs)
    labels = outs[0]
    if assign_only:
        return labels
    pses = outs[1 : 1 + len(es)]
    psc = outs[1 + len(es)]
    sums_e = jnp.concatenate(
        [jnp.sum(p, axis=1).reshape(b, k, eg, hb).sum(axis=3)
         for p, eg in zip(pses, es)],
        axis=2,
    )
    sums_c = jnp.sum(psc, axis=1).reshape(b, k, 4, hb).sum(axis=3)
    return labels, sums_e, sums_c


# ---------------------------------------------------------------------------
# maximin seeding
# ---------------------------------------------------------------------------


def _maximin_chw_kernel(
    xe_ref,  # (1, E, HB*T, W)
    xc_ref,  # (1, 4, HB*T, W)
    wp_ref,  # (1, HB, E*HB) — expanded probe weights (a^2 * probe)
    wpc_ref,  # (1, HB, 4*HB)
    a2e_ref,  # (1, HB, E*HB) — expanded a^2 (weighted-||x||^2 matrix)
    a2c_ref,  # (1, HB, 4*HB)
    csq_ref,  # (1, 8, 128) f32 — probe self-term in [0, 0]
    dmin_ref,  # (1, HB*T, W) f32 running min (ignored on reset)
    dmin_out_ref,  # (1, HB*T, W) f32
    beste_ref,  # (1, T, 8, E*HB) f32 — sub-tile-argmax raw column, row 0
    bestc_ref,  # (1, T, 8, 4*HB) f32
    bestv_ref,  # (1, T, 8, 128) f32 — sub-tile max in [0, 0]
    *,
    reset: bool,
    e: int,
    hb: int,
    h: int,
    w: int,
    t_sub: int,
):
    i = pl.program_id(1)
    prec = precision_for(xe_ref.dtype)
    f32 = jnp.float32
    for t in range(t_sub):  # see _lloyd_chw_kernel: same dots, fewer steps
        ii = i * t_sub + t
        sl = slice(t * hb, (t + 1) * hb)
        xe = xe_ref[0, :, sl, :].reshape(e * hb, w)
        xc = xc_ref[0, :, sl, :].reshape(4 * hb, w)
        xe, xc = _mask_invalid_rows(xe, xc, hb, h, ii)
        # weighted ||x||^2: one block-diag dot over the elementwise squares
        # (f32 squares of bf16 operands are exact)
        xe2 = (xe.astype(f32) * xe.astype(f32)).astype(xe.dtype)
        xc2 = (xc.astype(f32) * xc.astype(f32)).astype(xc.dtype)
        xsqw = jax.lax.dot_general(
            a2e_ref[0], xe2, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ) + jax.lax.dot_general(
            a2c_ref[0], xc2, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # (HB, W)
        cross = jax.lax.dot_general(
            wp_ref[0], xe, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ) + jax.lax.dot_general(
            wpc_ref[0], xc, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        d2 = xsqw - 2.0 * cross + csq_ref[0][0, 0]
        row = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0)
        valid = (row + ii * hb) < h
        d2 = jnp.where(valid, d2, -jnp.inf)
        dmin_new = d2 if reset else jnp.minimum(dmin_ref[0, sl, :], d2)
        # re-mask after the min: the dmin INPUT's out-of-range rows are
        # garbage (NaN in interpret mode) and min(garbage, -inf) keeps the
        # garbage
        dmin_new = jnp.where(valid, dmin_new, -jnp.inf)
        dmin_out_ref[0, sl, :] = dmin_new

        # sub-tile argmax with first-(row, col) tie-break, then one-hot
        # contraction to extract the winning RAW column without any lane
        # gather
        m = jnp.max(dmin_new)
        col = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1)
        idx = row * w + col
        cand = jnp.where(dmin_new == m, idx, jnp.int32(2**30))
        mi = jnp.min(cand)
        oh = (cand == mi).astype(xe.dtype)  # single 1 at the sub-tile argmax

        def pick(x, d):
            p = jax.lax.dot_general(
                oh, x, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )  # (HB, d*HB); keep the r == r' diagonal, collapse rows
            r = jax.lax.broadcasted_iota(jnp.int32, (hb, d * hb), 0)
            rp = jax.lax.broadcasted_iota(jnp.int32, (hb, d * hb), 1) % hb
            return jnp.sum(jnp.where(r == rp, p, 0.0), axis=0, keepdims=True)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, e * hb), 0)
        beste_ref[0, t] = jnp.where(lane == 0, pick(xe, e), 0.0)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (8, 4 * hb), 0)
        bestc_ref[0, t] = jnp.where(lane4 == 0, pick(xc, 4), 0.0)
        bestv_ref[0, t] = jnp.full((8, 128), m, f32)


@functools.partial(jax.jit, static_argnums=(8, 9, 10))
def _maximin_chw_pass(xe, xc4, wp_x, wpc_x, a2e_x, a2c_x, csq, dmin,
                      reset: bool, hb: int, interpret: bool):
    """One fused weighted-maximin step on the CHW layout.

    Returns (dmin_out (B, H, W) f32, best_e (B, E) f32, best_c (B, 4) f32)
    where best_* is the raw feature column at the global argmax of
    dmin_out (first index on ties, matching models.kmeans.maximin_init).
    """
    b, e, h, w = xe.shape
    nb = _num_blocks(h)
    t_sub = _pick_tsub(nb, e, w, xe.dtype.itemsize)
    nbo = nb // t_sub
    hs = hb * t_sub
    kernel = functools.partial(
        _maximin_chw_kernel, reset=reset, e=e, hb=hb, h=h, w=w, t_sub=t_sub
    )
    dmin_out, beste, bestc, bestv = pl.pallas_call(
        kernel,
        grid=(b, nbo),
        in_specs=[
            pl.BlockSpec((1, e, hs, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, hs, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, e * hb), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 4 * hb), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, e * hb), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 4 * hb), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, w), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hs, w), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_sub, 8, e * hb), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_sub, 8, 4 * hb), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_sub, 8, 128), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 8, e * hb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 8, 4 * hb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 8, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * b * nb * hb * (e + 4) * hb * w),
            bytes_accessed=int(xe.dtype.itemsize * b * (e + 4) * h * w),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xe, xc4, wp_x, wpc_x, a2e_x, a2c_x, csq, dmin)
    bi = jnp.argmax(bestv[:, :, 0, 0], axis=1)  # (B,) first-max block
    be = jnp.take_along_axis(beste[:, :, 0, :], bi[:, None, None], axis=1)[:, 0]
    bc = jnp.take_along_axis(bestc[:, :, 0, :], bi[:, None, None], axis=1)[:, 0]
    be = be.reshape(-1, e, hb).sum(axis=2)
    bc = bc.reshape(-1, 4, hb).sum(axis=2)
    return dmin_out, be, bc


def _maximin_init_chw(xe, xc4, a, b_aff, k: int, hb: int, interpret: bool):
    """Weighted maximin seeding on raw CHW buffers -> NORMALIZED centers.

    a, b_aff: (B, D) per-row affine with D = E + 3 (x_norm = a*raw + b).
    Same seed sequence as models.kmeans.maximin_init on the normalized
    features: probe the mean, then farthest-point steps; distances are the
    normalized-space ones via the a^2 weighting (the ones-row weight is 0,
    so it never contributes).
    """
    b, e, h, w = xe.shape
    d = e + 3
    f32 = jnp.float32
    n = h * w
    mm = xe.dtype
    a2 = jnp.concatenate(
        [a * a, jnp.zeros((b, 1), f32)], axis=1
    )  # (B, D+1); ones-row weight 0
    # expanded a^2: rows r, cols (d, r') -> a2[d] * delta(r, r'); built once
    # (_expand_diag on a (B, 1, E) input gives exactly (B, hb, e*hb))
    a2e_x = _expand_diag(a2[:, None, :e], hb).astype(mm)
    a2c_x = _expand_diag(a2[:, None, e:], hb).astype(mm)

    # probe sequence state: raw-space probes (the mean, then data columns)
    mean_e = jnp.mean(xe.astype(f32), axis=(2, 3))  # (B, E)
    mean_c = jnp.mean(xc4.astype(f32), axis=(2, 3))  # (B, 4); row 3 == 1
    centers_raw = jnp.zeros((b, k, d), f32)
    dmin = jnp.zeros((b, h, w), f32)
    pe, pc = mean_e, mean_c

    for step in range(k):
        wpe = a2[:, :e] * pe  # (B, E)
        wpc = a2[:, e:] * pc  # (B, 4); row 3 weight 0
        csq_v = jnp.sum(a2[:, :e] * pe * pe, axis=1) + jnp.sum(
            a2[:, e:] * pc * pc, axis=1
        )
        csq = jnp.zeros((b, 8, 128), f32).at[:, 0, 0].set(csq_v)
        wp_x = _expand_diag(wpe[:, None, :], hb).astype(mm)
        wpc_x = _expand_diag(wpc[:, None, :], hb).astype(mm)
        dmin, be, bc = _maximin_chw_pass(
            xe, xc4, wp_x, wpc_x, a2e_x, a2c_x, csq, dmin, step < 2, hb,
            interpret,
        )
        centers_raw = centers_raw.at[:, step].set(
            jnp.concatenate([be, bc[:, :3]], axis=1)
        )
        pe, pc = be, jnp.concatenate(
            [bc[:, :3], jnp.ones((b, 1), f32)], axis=1
        )
    # normalized-space centers for the Lloyd loop
    return a[:, None, :] * centers_raw + b_aff[:, None, :]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _affine_params(xe, xc4, cluster_cfg, eps: float, pooled=None):
    """Per-row standardization affine over raw CHW buffers: x = a*r + b.

    xe: (B, E, H, W) or a tuple of per-group (B, E_g, H, W) buffers (the
    concat-free pipeline form; per-channel moments are independent, so
    grouped computation is identical). Returns (a (B, D), b (B, D)) f32,
    D = E + 3, with the sqrt(E/3) color balance and ``color_weight`` folded
    into the color rows — the same moments/affine as
    ops/features.py::_norm_affine, computed in the (h, w)-tiled layout."""
    groups = tuple(xe) if isinstance(xe, (tuple, list)) else (xe,)
    b = groups[0].shape[0]
    e = sum(g.shape[1] for g in groups)
    f32 = jnp.float32
    cw = cluster_cfg.color_weight * float(np.sqrt(e / 3.0))
    if not cluster_cfg.normalize:
        from gabor_color_image_segmentation_tpu.ops.features import (
            fold_coherence_affine,
        )

        a = jnp.concatenate(
            [jnp.ones((b, e), f32), jnp.full((b, 3), cw, f32)], axis=1
        )
        return fold_coherence_affine(
            a, jnp.zeros((b, e + 3), f32), groups, xc4, cluster_cfg, eps,
            pooled=pooled,
        )

    def moments(x):
        mean = jnp.mean(x, axis=(2, 3), dtype=f32)
        sq = jnp.mean(jnp.square(x.astype(f32)), axis=(2, 3))
        return mean, jnp.sqrt(jnp.maximum(sq - jnp.square(mean), 0.0))

    mse = [moments(g) for g in groups]
    m_e = jnp.concatenate([m for m, _ in mse], axis=1)
    s_e = jnp.concatenate([s for _, s in mse], axis=1)
    m_c, s_c = moments(xc4[:, :3])
    a_e = 1.0 / (s_e + eps)
    a_c = cw / (s_c + eps)
    a = jnp.concatenate([a_e, a_c], axis=1)
    bb = jnp.concatenate([-m_e * a_e, -m_c * a_c], axis=1)
    from gabor_color_image_segmentation_tpu.ops.features import (
        fold_coherence_affine,
    )

    s_full = jnp.concatenate([s_e, s_c], axis=1)
    return fold_coherence_affine(a, bb, groups, xc4, cluster_cfg, eps,
                                 pooled=pooled, s_full=s_full)


def build_color4(color: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, H, W, 3) color -> (B, 4, H, W) channel-major rows [L, a, b, 1].
    The ones-row's update sums double as member counts in the Lloyd pass."""
    b, h, w, _ = color.shape
    cm = jnp.transpose(color.astype(dtype), (0, 3, 1, 2))
    return jnp.concatenate([cm, jnp.ones((b, 1, h, w), dtype)], axis=1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 10))
def kmeans_fused_chw(
    energies_cm: jnp.ndarray,
    color4: jnp.ndarray,
    affine: Tuple[jnp.ndarray, jnp.ndarray],
    k: int,
    n_iter: int = 25,
    coarse_iters: int = 0,
    refine_iters: int = 10,
    eps: float = 1e-6,
    pooled: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    init_centers: Optional[jnp.ndarray] = None,
    with_labels: bool = True,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Fused Lloyd directly on the feature kernel's CHW output.

    energies_cm: (B, E, H, W) raw (unnormalized) energies, OR a tuple of
    per-scale-group buffers (B, E_g, H, W) exactly as the fused feature
    kernel emits them (gabor_energies_fused(grouped=True)) — the grouped
    form skips the full-tensor concatenation copy entirely; color4:
    (B, 4, H, W) from build_color4; affine: (a, b) from _affine_params.
    Returns (labels (B, H, W) int32, centers (B, k, E+3) f32 in NORMALIZED
    feature space — directly comparable to the xt/golden solvers').
    with_labels=False returns (None, centers) and skips the final
    assignment pass entirely — the warm-start form used for coarse/mid
    multigrid levels, where only the centers feed the next level.

    Multigrid (coarse_iters > 0): seed + coarse Lloyd on the 2x2 MXU-pooled
    twin (1/4 HBM per pass), then refine_iters full-resolution passes with
    the fixed-point early exit — the schedule of kmeans_fused_t_xt /
    golden/cluster.py (pooling raw rows commutes with the affine, so this
    equals pooling normalized features in real arithmetic). The production
    pipeline instead precomputes the warm start on the pooled xt twin and
    passes ``init_centers``; the grouped input form requires that (the
    in-function maximin/multigrid warmup falls back to a concatenated
    buffer).
    """
    if k > _K_PAD:
        raise ValueError(f"fused chw Lloyd supports k <= {_K_PAD}, got {k}")
    groups = (
        tuple(energies_cm)
        if isinstance(energies_cm, (tuple, list))
        else (energies_cm,)
    )
    es = tuple(x.shape[1] for x in groups)
    b, _, h, w = groups[0].shape
    e = sum(es)
    d = e + 3
    a, b_aff = affine
    interpret = jax.default_backend() != "tpu"
    hb = _HB
    f32 = jnp.float32
    mm = groups[0].dtype
    bounds = np.cumsum((0,) + es)

    def solve(xe, xc4_, c0, max_iter, need_labels=True):
        """Lloyd to fixed point (<= max_iter) on one resolution level,
        then one assign-only pass for the labels (skipped entirely when
        need_labels=False — coarse/mid levels only feed centers upward).
        xe: tuple of group buffers (or a single array). Pass/label
        semantics identical to golden/cluster.py::kmeans_golden:
        max_iter center updates (fixed-point early exit is an identity
        after convergence), final labels = assignment under the final
        centers."""

        def center_inputs(c):
            u = c - b_aff[:, None, :]  # (B, k, D)
            wc = a[:, None, :] * u
            offs_v = jnp.sum(u * u, axis=2)  # (B, k)
            # only the k real rows are expanded: MXU cost of both kernel
            # dots scales with M = k*hb, so padding to _K_PAD would be waste
            wck = jnp.zeros((b, k, d + 1), f32).at[:, :, :d].set(wc)
            if isinstance(xe, tuple):
                wce_x = tuple(
                    _expand_diag(
                        wck[:, :, bounds[gi] : bounds[gi + 1]], hb
                    ).astype(mm)
                    for gi in range(len(xe))
                )
            else:
                wce_x = _expand_diag(wck[:, :, :e], hb).astype(mm)
            wcc_x = _expand_diag(wck[:, :, e:], hb).astype(mm)
            offs = jnp.zeros((b, 8, 128), f32).at[:, :k, 0].set(offs_v)
            return wce_x, wcc_x, offs

        def update(c):
            wce_x, wcc_x, offs = center_inputs(c)
            _, sums_e, sums_c = _lloyd_chw_pass(
                xe, xc4_, wce_x, wcc_x, offs, k, hb, interpret
            )
            counts = sums_c[:, :, 3]  # ones-row sums
            raw_mean = jnp.concatenate(
                [sums_e, sums_c[:, :, :3]], axis=2
            ) / jnp.maximum(counts, 1.0)[:, :, None]
            new = a[:, None, :] * raw_mean + b_aff[:, None, :]
            new = jnp.where(counts[:, :, None] > 0, new, c)
            return new

        def cond(carry):
            t, _, changed = carry
            return changed & (t < max_iter)

        def body(carry):
            t, c, _ = carry
            new = update(c)
            return t + 1, new, jnp.any(new != c)

        _, c_fin, _ = lax.while_loop(
            cond, body, (jnp.int32(0), c0, jnp.bool_(True))
        )
        if not need_labels:
            return None, c_fin
        wce_x, wcc_x, offs = center_inputs(c_fin)
        labels = _lloyd_chw_pass(
            xe, xc4_, wce_x, wcc_x, offs, k, hb, interpret, True
        )
        return labels, c_fin

    xe_in = groups if len(groups) > 1 else groups[0]
    if init_centers is not None:
        # externally-produced multigrid warm start (normalized feature
        # space, e.g. kmeans_pallas.kmeans_coarse_centers_xp on a pooled
        # xt buffer) — run only the full-resolution refinement here
        labels, centers = solve(
            xe_in, color4, init_centers, refine_iters, with_labels
        )
        return labels, centers
    # the in-function warmup/seeding paths run on a single concatenated
    # buffer (the production pipeline precomputes init_centers instead, so
    # grouped callers never pay this concat)
    energies_cm = (
        jnp.concatenate(groups, axis=1) if len(groups) > 1 else groups[0]
    )
    if coarse_iters > 0 and h >= 2 and w >= 2:
        if pooled is not None:
            # the feature kernel produced the pooled twin in-VMEM
            # (fused_pallas pooled=True) — no standalone pooling pass
            pe, pc = pooled
        else:
            from gabor_color_image_segmentation_tpu.ops.features import (
                _pool2x2_cm,
            )

            pe = _pool2x2_cm(energies_cm)
            pc = _pool2x2_cm(color4)
        c0 = _maximin_init_chw(pe, pc, a, b_aff, k, hb, interpret)
        _, c_w = solve(pe, pc, c0, coarse_iters, False)
        labels, centers = solve(
            energies_cm, color4, c_w, refine_iters, with_labels
        )
    else:
        c0 = _maximin_init_chw(energies_cm, color4, a, b_aff, k, hb, interpret)
        labels, centers = solve(energies_cm, color4, c0, n_iter, with_labels)
    return labels, centers
