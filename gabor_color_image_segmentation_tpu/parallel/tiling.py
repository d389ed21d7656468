"""Spatial tiling with halo exchange — the large-image path (SURVEY.md §5.7,
BASELINE config 4: tiled 4K pipeline on v5e-8).

A 4K image exceeds comfortable single-pass VMEM/HBM budgets, and config 4
shards it across chips: the image's ROW dimension is split over a ``space``
mesh axis via ``shard_map``. Structure per device:

  1. **Halo exchange**: each device sends its top/bottom ``halo`` rows to its
     neighbors with ``lax.ppermute`` (the ring-attention-shaped communication
     of this workload — two neighbor passes over ICI, no all-to-all).
  2. **Local feature extraction** on the strip + halos (modulated XLA path or
     the fused Pallas kernel — both are local once halos are present), then
     crop back to the owned rows.
  3. **Globally-consistent k-means**: Lloyd iterations where each device
     computes local label assignments and per-cluster (sum, count), reduced
     with ``lax.psum`` so every device steps identical centers — the
     distributed analog of the single-chip solver, bitwise-consistent across
     mesh shapes up to float reduction order. Init is a deterministic global
     maximin seeded via all-gathered local candidates.
  4. **Graph-cut chain** (``cfg.graph.enabled`` — BASELINE config 4's
     filter→cluster→CUT form): distributed SLIC + connectivity enforcement
     + psum'd superpixel stats + replicated spectral n-cut, implemented in
     ``parallel/tiled_graph.py`` and entered through ``_graph_strip_fn``.

Edge devices reflect-pad locally (matching the single-device REFLECT_101
border), interior edges use true neighbor rows, so a tiled run equals the
untiled run up to float-order — asserted in tests/test_tiling.py on the
fake 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gabor_color_image_segmentation_tpu.config import PipelineConfig
from gabor_color_image_segmentation_tpu.ops.bank import GaborBank


def _halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """x: (rows, W, C) local strip -> (rows + 2*halo, W, C) with neighbor rows.

    Boundary devices get REFLECT_101 of the LOCAL array instead of a
    neighbor. Used at two levels (the key to exact borders): exchanging
    INPUT rows before the conv stage (reflected input == the conv border
    contract) and exchanging MAGNITUDE rows before the smoothing stage
    (reflected magnitudes == the smoothing border contract — reflecting
    input there instead is wrong for diagonal orientations, the round-1
    approximation this two-level scheme removed).
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    # send my bottom rows to the next device (they become its top halo)
    from_prev = lax.ppermute(
        x[-halo:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my top rows to the previous device (they become its bottom halo)
    from_next = lax.ppermute(
        x[:halo], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    top_reflect = x[1 : halo + 1][::-1]
    bot_reflect = x[-halo - 1 : -1][::-1]
    top = jnp.where(idx == 0, top_reflect, from_prev)
    bot = jnp.where(idx == n - 1, bot_reflect, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def _strip_energies(
    rgb_strip: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rows, W, 3) sRGB strip -> ((rows, W, E) energies, (rows, W, 3)
    color), BITWISE equal to the untiled path's rows (tests/test_tiling.py
    pins exactness).

    Two-level halo exchange: (1) input rows (conv radius) -> per-group
    DC-corrected magnitudes of the OWNED rows, with plane-wave phases in
    GLOBAL row coordinates (a strip-local origin differs from the untiled
    values by float rounding of the phase shift); (2) magnitude rows
    (smoothing radius) -> smoothing, with true borders reflecting the
    magnitude map exactly like the untiled run."""
    from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
    from gabor_color_image_segmentation_tpu.ops.modulated import (
        modulated_group_magnitudes,
        smooth_group_magnitudes,
    )

    p = bank.max_conv_radius
    r = bank.max_smooth_radius
    rows, w, _ = rgb_strip.shape

    color = _color_transform(rgb_strip, cfg.color_space)
    row0 = (lax.axis_index(axis_name) * rows).astype(jnp.float32)
    colorh = _halo_exchange_rows(color, p, axis_name)
    mags = [
        modulated_group_magnitudes(
            colorh[None], g, bank, jnp.float32, h_halo=p, y0=row0
        )[0]
        for g in bank.groups
    ]
    magh = _halo_exchange_rows(jnp.concatenate(mags, axis=-1), r, axis_name)
    outs, off = [], 0
    for g, m in zip(bank.groups, mags):
        e = m.shape[-1]
        outs.append(
            smooth_group_magnitudes(
                magh[None, :, :, off : off + e], g, jnp.float32, h_halo=r
            )[0]
        )
        off += e
    return jnp.concatenate(outs, axis=-1), color


def _standardize_strip(
    energies: jnp.ndarray, color: jnp.ndarray, cfg: PipelineConfig,
    axis_name: str,
) -> jnp.ndarray:
    """Assemble + standardize strip features with psum'd GLOBAL moments —
    the distributed mirror of ops/features.py::assemble_features
    (including the optional cue_weight="coherence" region-scale weights,
    whose 8x8 block means stay strip-local when rows % 8 == 0)."""
    feats = jnp.concatenate([energies, color], axis=-1)
    if cfg.cluster.normalize:
        cnt = feats.shape[0] * feats.shape[1]
        total = lax.psum(cnt, axis_name)
        mean = lax.psum(jnp.sum(feats, axis=(0, 1)), axis_name) / total
        var = (
            lax.psum(jnp.sum((feats - mean) ** 2, axis=(0, 1)), axis_name)
            / total
        )
        feats = (feats - mean) / (jnp.sqrt(var) + 1e-6)
    e = energies.shape[-1]
    cw = cfg.cluster.color_weight * float(np.sqrt(e / 3.0))
    scale = jnp.concatenate(
        [jnp.ones((e,), jnp.float32), jnp.full((3,), cw, jnp.float32)]
    )
    feats = feats * scale
    if cfg.cluster.cue_weight == "coherence":
        rows, w, d = feats.shape
        n = 8
        if rows % n:
            raise ValueError(
                f"cue_weight='coherence' needs strip rows % {n} == 0, got {rows}"
            )
        hb, wb = rows // n, w // n
        f = feats[:, : wb * n].astype(jnp.float32)
        p = jnp.mean(f.reshape(hb, n, wb, n, d), axis=(1, 3))
        nb = lax.psum(hb * wb, axis_name)
        pm = lax.psum(jnp.sum(p, axis=(0, 1)), axis_name) / nb
        pv = jnp.maximum(
            lax.psum(jnp.sum(jnp.square(p), axis=(0, 1)), axis_name) / nb
            - jnp.square(pm),
            0.0,
        )
        nf = lax.psum(f.shape[0] * f.shape[1], axis_name)
        fm = lax.psum(jnp.sum(f, axis=(0, 1)), axis_name) / nf
        fv = jnp.maximum(
            lax.psum(jnp.sum(jnp.square(f), axis=(0, 1)), axis_name) / nf
            - jnp.square(fm),
            0.0,
        )
        cwts = jnp.sqrt(pv) / (jnp.sqrt(fv) + 1e-6)
        pw = float(getattr(cfg.cluster, "coherence_pow", 1.0))
        feats = feats * (cwts if pw == 1.0 else cwts ** pw)
    return feats


def _strip_features(
    rgb_strip: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    axis_name: str,
) -> jnp.ndarray:
    """(rows, W, 3) sRGB strip -> (rows, W, D) standardized features (see
    _strip_energies for the exactness contract)."""
    energies, color = _strip_energies(rgb_strip, cfg, bank, axis_name)
    return _standardize_strip(energies, color, cfg, axis_name)


def _strip_graph_inputs(
    rgb_strip: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed mirror of the pipeline's pooled graph-branch inputs
    (models/pipeline.py::segment_batch, graph.enabled): full-res strip
    energies, pooled ``graph.pool`` times by strip-local 2x2 block means
    (strip heights divisible by 2^pool keep every block inside one strip,
    so pooling is bitwise the untiled pooling), standardized on the pooled
    grid with psum'd moments. Returns ((rows_p, W_p, D) feats,
    (rows_p, W_p, 3) pooled Lab)."""
    from gabor_color_image_segmentation_tpu.models.pipeline import (
        _color_transform,
        _pool2x2_nhwc,
    )

    energies, color = _strip_energies(rgb_strip, cfg, bank, axis_name)
    same = cfg.color_space == "lab"
    lab = color if same else _color_transform(rgb_strip, "lab")
    for _ in range(cfg.graph.pool):
        energies = _pool2x2_nhwc(energies[None])[0]
        color = _pool2x2_nhwc(color[None])[0]
        lab = color if same else _pool2x2_nhwc(lab[None])[0]
    return _standardize_strip(energies, color, cfg, axis_name), lab


def _global_maximin(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """Deterministic farthest-point init over row-sharded data.

    x: (N_local, D). Every device returns the same (k, D) centers.
    """
    mean = lax.pmean(jnp.mean(x, axis=0), axis_name)
    # matvec distance form + HIGHEST precision, mirroring the single-chip
    # maximin_init (models/kmeans.py) so tiled and untiled runs make
    # identical seed picks
    xsq = jnp.sum(x * x, axis=1)
    hi = jax.lax.Precision.HIGHEST

    def dist_to(c):
        cross = jnp.dot(x, c, preferred_element_type=jnp.float32, precision=hi)
        return xsq - 2.0 * cross + jnp.sum(c * c)

    def global_argmax_point(scores):
        # local winner -> all-gather candidates -> common global winner.
        # Ties break to the lowest device index (stable, device-count-
        # dependent only through data placement, like the reference order).
        i = jnp.argmax(scores)
        cand_x = x[i]
        cand_s = scores[i]
        all_x = lax.all_gather(cand_x, axis_name)  # (n_dev, D)
        all_s = lax.all_gather(cand_s, axis_name)  # (n_dev,)
        j = jnp.argmax(all_s)
        return all_x[j]

    c0 = global_argmax_point(dist_to(mean))
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(c0)
    dmin = dist_to(c0)

    def body(i, carry):
        centers, dmin = carry
        c = global_argmax_point(dmin)
        centers = centers.at[i].set(c)
        dmin = jnp.minimum(dmin, dist_to(c))
        return centers, dmin

    centers, _ = lax.fori_loop(1, k, body, (centers, dmin))
    return centers


# HIGHEST: TPU DEFAULT f32 dots round operands to bf16; tiled-vs-untiled
# label parity (tests/test_tiling.py) needs true f32 scores
_HI = jax.lax.Precision.HIGHEST


def _assign_sharded(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.sum(centers * centers, axis=1) - 2.0 * jnp.dot(
        x, centers.T, preferred_element_type=jnp.float32, precision=_HI
    )
    return jnp.argmin(scores, axis=1)


def _lloyd_sharded(
    x: jnp.ndarray, centers0: jnp.ndarray, k: int, n_iter: int, axis_name: str
) -> jnp.ndarray:
    """n_iter distributed Lloyd iterations from centers0 over the row-sharded
    (N_local, D) view: local assignment + psum'd (sum, count) moments, so
    every device steps identical centers. Empty-cluster rule (keep the
    previous center) mirrors models/kmeans.py. A fixed iteration count is
    bitwise the untiled solver's fixed-point early exit: once centers repeat,
    every further step is the identity."""

    def body(_, centers):
        labels = _assign_sharded(x, centers)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        sums = lax.psum(
            jnp.dot(onehot.T, x, preferred_element_type=jnp.float32, precision=_HI),
            axis_name,
        )
        counts = lax.psum(jnp.sum(onehot, axis=0), axis_name)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    return lax.fori_loop(0, n_iter, body, centers0)


def kmeans_sharded(
    x: jnp.ndarray,
    k: int,
    n_iter: int,
    axis_name: str,
    init_stride: int = 1,
    hw_local: Tuple[int, int] = None,
    coarse_iters: int = 0,
    refine_iters: int = 10,
    coarse_levels: int = 1,
    mid_iters: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed Lloyd over row-sharded pixels. x: (N_local, D) ->
    (labels (N_local,) int32, centers (k, D) replicated).

    With ``coarse_iters > 0`` this runs the PRODUCTION multigrid schedule
    (models/kmeans.py::kmeans_multigrid — maximin seed + coarse Lloyd on the
    2^levels-pooled grid, ``mid_iters`` at each intermediate level, then
    full-res refinement), distributed: pooling is strip-LOCAL (exact global
    2x2 block means when strip rows divide 2^coarse_levels — enforced) and
    every level's Lloyd moments are psum'd. Without it the tiled config1 run
    computed a different fixed point than the untiled run (25 single-grid
    passes vs the 15/3/1 multigrid — VERDICT r3 missing #2, agreement
    0.9959); now both paths walk the same schedule.

    init_stride strides each LOCAL shard; when the local pixel count divides
    by the stride this is exactly the untiled path's global strided subset,
    keeping tiled-vs-untiled init identical (multigrid requires stride 1,
    mirroring kmeans_batch's gate)."""
    from gabor_color_image_segmentation_tpu.models.kmeans import pool2x2

    x = x.astype(jnp.float32)
    multigrid = coarse_iters > 0 and hw_local is not None and init_stride == 1
    if not multigrid:
        centers0 = _global_maximin(x[::init_stride], k, axis_name)
        centers = _lloyd_sharded(x, centers0, k, n_iter, axis_name)
        return _assign_sharded(x, centers).astype(jnp.int32), centers

    rows, w = hw_local
    if rows % (1 << coarse_levels):
        raise ValueError(
            f"multigrid coarse_levels={coarse_levels} needs strip rows "
            f"divisible by {1 << coarse_levels} for strip-local pooling to "
            f"equal the untiled pooling, got {rows}-row strips — use fewer "
            f"devices or coarse_iters=0"
        )
    levels = []
    xp, h_, w_ = x, rows, w
    for _ in range(coarse_levels):
        xp = pool2x2(xp, h_, w_)
        h_, w_ = h_ // 2, w_ // 2
        levels.append(xp)
    centers = _global_maximin(levels[-1], k, axis_name)
    centers = _lloyd_sharded(levels[-1], centers, k, coarse_iters, axis_name)
    if mid_iters > 0:
        for xl in reversed(levels[:-1]):
            centers = _lloyd_sharded(xl, centers, k, mid_iters, axis_name)
    centers = _lloyd_sharded(x, centers, k, refine_iters, axis_name)
    labels = _assign_sharded(x, centers).astype(jnp.int32)
    return labels, centers




def _graph_strip_fn(
    rgb_strip: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    h: int, w: int, axis_name: str, sync_axes=None,
) -> jnp.ndarray:
    """Per-strip filter->CUT chain (BASELINE config 4's missing leg):
    halo'd strip energies -> pooled standardized features -> distributed
    SLIC + connectivity + psum'd superpixel stats + replicated n-cut
    (parallel/tiled_graph.py) -> local 2^pool upsample."""
    from gabor_color_image_segmentation_tpu.parallel.tiled_graph import (
        graph_cut_strip,
    )

    p = cfg.graph.pool
    feats, lab = _strip_graph_inputs(rgb_strip, cfg, bank, axis_name)
    labels = graph_cut_strip(
        feats, lab, cfg, h >> p, axis_name, sync_axes=sync_axes
    )
    if p:
        f = 1 << p
        labels = jnp.repeat(jnp.repeat(labels, f, axis=0), f, axis=1)
    return labels.astype(jnp.int32)


def _check_graph_strip(rows: int, w: int, cfg: PipelineConfig) -> None:
    p = cfg.graph.pool
    if p and (rows % (1 << p) or w % (1 << p)):
        raise ValueError(
            f"graph.pool={p} needs strip rows and W divisible by {1 << p}, "
            f"got {rows}x{w} strips"
        )


def _check_strip(rows: int, bank: GaborBank, axis_name: str) -> None:
    """Single-hop ppermute needs strips taller than each exchange's halo.
    Two-level exchange relaxes the old (conv + smooth) bound to
    max(conv, smooth)."""
    halo = max(bank.max_conv_radius, bank.max_smooth_radius)
    if halo >= rows:
        raise ValueError(
            f"halo {halo} >= strip height {rows}: single-hop ppermute halo "
            f"exchange needs taller strips — use fewer devices along "
            f"{axis_name!r} or a smaller-scale bank"
        )


def segment_tiled(
    rgb: jnp.ndarray,
    cfg: PipelineConfig,
    bank: GaborBank,
    mesh: Mesh,
    axis_name: str = "space",
) -> jnp.ndarray:
    """(H, W, 3) single large image, rows sharded over mesh[axis_name] ->
    (H, W) int32 labels (same sharding). Feature stage local-with-halos;
    clustering globally consistent via psum."""
    from jax import shard_map

    h, w, _ = rgb.shape
    n_dev = mesh.shape[axis_name]
    assert h % n_dev == 0, f"H={h} must divide over {n_dev} devices"
    _check_strip(h // n_dev, bank, axis_name)
    if cfg.graph.enabled:
        _check_graph_strip(h // n_dev, w, cfg)

    def local_fn(rgb_strip):
        # rgb_strip: (rows, W, 3) uint8/float
        if cfg.graph.enabled:
            return _graph_strip_fn(rgb_strip, cfg, bank, h, w, axis_name)
        feats = _strip_features(rgb_strip, cfg, bank, axis_name)
        rows = feats.shape[0]
        labels, _ = kmeans_sharded(
            feats.reshape(rows * w, -1),
            cfg.cluster.k,
            cfg.cluster.n_iter,
            axis_name,
            cfg.cluster.init_stride,
            hw_local=(rows, w),
            coarse_iters=cfg.cluster.coarse_iters,
            refine_iters=cfg.cluster.refine_iters,
            coarse_levels=cfg.cluster.coarse_levels,
            mid_iters=cfg.cluster.mid_iters,
        )
        return labels.reshape(rows, w).astype(jnp.int32)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(axis_name, None),
    )
    return jax.jit(fn)(rgb)


def tiled_batch_fn(
    cfg: PipelineConfig,
    bank: GaborBank,
    mesh: Mesh,
    batch_axis: str = "batch",
    space_axis: str = "space",
):
    """Jitted BASELINE-config-4 segmenter over a 2-D batch x space mesh.
    Exposed (like ``sharding.make_sharded_fn``) so the driver dryrun can
    ``.lower().compile()`` it and count the collectives in the HLO —
    expected: 2 collective-permutes (halo ring), psums for moments + Lloyd
    (and, with the graph stage enabled, the SLIC/connectivity/superpixel-
    stat psums + seam-row permutes of parallel/tiled_graph.py), only tiny
    (n_dev, D)-sized all-gathers from the maximin seeding."""
    from jax import shard_map

    def per_image(rgb_strip):
        rows, w, _ = rgb_strip.shape
        if cfg.graph.enabled:
            n_s = mesh.shape[space_axis]
            # convergence flags sync over BOTH mesh axes so every space
            # group runs its data-dependent fixpoint loops the same number
            # of times (see tiled_graph._psum_any)
            return _graph_strip_fn(
                rgb_strip, cfg, bank, rows * n_s, w, space_axis,
                sync_axes=(batch_axis, space_axis),
            )
        feats = _strip_features(rgb_strip, cfg, bank, space_axis)
        labels, _ = kmeans_sharded(
            feats.reshape(rows * w, -1),
            cfg.cluster.k,
            cfg.cluster.n_iter,
            space_axis,
            cfg.cluster.init_stride,
            hw_local=(rows, w),
            coarse_iters=cfg.cluster.coarse_iters,
            refine_iters=cfg.cluster.refine_iters,
            coarse_levels=cfg.cluster.coarse_levels,
            mid_iters=cfg.cluster.mid_iters,
        )
        return labels.reshape(rows, w).astype(jnp.int32)

    def local_fn(rgb_local):  # (B_loc, rows, W, 3)
        return jax.vmap(per_image)(rgb_local)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(batch_axis, space_axis, None, None),
        out_specs=P(batch_axis, space_axis, None),
    )
    return jax.jit(fn)


def segment_tiled_batch(
    rgb: jnp.ndarray,
    cfg: PipelineConfig,
    bank: GaborBank,
    mesh: Mesh,
    batch_axis: str = "batch",
    space_axis: str = "space",
) -> jnp.ndarray:
    """BASELINE config 4 execution shape: (B, H, W, 3) large images on a 2-D
    mesh — data-parallel over ``batch_axis``, each image's rows spatially
    sharded over ``space_axis`` with halo exchange + psum'd clustering.

    Per (batch-shard, space-shard) device: local strips of B/n_b images; the
    per-image tiled pipeline vmaps over the local batch; ppermute/psum ride
    the ``space`` submesh only (DP needs zero communication).
    """
    b, h, w, _ = rgb.shape
    n_b = mesh.shape[batch_axis]
    n_s = mesh.shape[space_axis]
    assert b % n_b == 0, f"B={b} must divide over {n_b} batch shards"
    assert h % n_s == 0, f"H={h} must divide over {n_s} space shards"
    _check_strip(h // n_s, bank, space_axis)
    if cfg.graph.enabled:
        _check_graph_strip(h // n_s, w, cfg)
    return tiled_batch_fn(cfg, bank, mesh, batch_axis, space_axis)(rgb)
