"""End-to-end pipeline composition (SURVEY.md §3.1/§3.5).

One pure function ``segment_batch``: (B, H, W, 3) sRGB -> (B, H, W) int32
label maps, fully jit-compiled — color transform, Gabor features, clustering
and (optionally) the superpixel/graph-cut stage never leave HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.config import PipelineConfig
from gabor_color_image_segmentation_tpu.ops.bank import GaborBank, make_bank
from gabor_color_image_segmentation_tpu.ops.color import rgb_to_lab
from gabor_color_image_segmentation_tpu.ops.features import (
    assemble_features,
    gabor_energies,
)


def _color_transform(rgb: jnp.ndarray, color_space: str) -> jnp.ndarray:
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0
    if color_space == "lab":
        return rgb_to_lab(rgb)
    return rgb.astype(jnp.float32)


def compute_energies(
    rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    pool: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,3) sRGB -> ((B,H>>pool,W>>pool,E) energies, (B,H,W,3) color).

    ``pool`` > 0 returns 2^pool-block-mean-pooled energies (the graph
    branch's multirate grid). On the tiled path the pooling happens
    per-window INSIDE gabor_energies_tiled — bitwise the same means, but
    the full-res NHWC energies never materialize (the monolithic
    pool-after pass measured ~54-228 ms at config4's 4K scale,
    exp_config4_poolparts.py); color is always returned full-res."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    color = _color_transform(rgb, cfg.color_space)
    impl = cfg.feature_impl
    if impl == "auto":
        if cfg.bank.gamma == 1.0 and jax.default_backend() == "tpu":
            impl = "pallas"
        elif cfg.bank.gamma == 1.0:
            impl = "modulated"
        else:
            impl = "direct"
    if impl == "pallas":
        try:
            from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
                gabor_energies_fused,
            )
        except ImportError:
            impl = "modulated"
    if impl == "pallas":
        fn = gabor_energies_fused
    elif impl == "modulated":
        from gabor_color_image_segmentation_tpu.ops.modulated import (
            gabor_energies_mod,
        )

        fn = gabor_energies_mod
    elif impl == "direct":
        fn = gabor_energies
    else:
        raise ValueError(f"unknown feature_impl {cfg.feature_impl!r}")
    _, h, w, _ = color.shape
    if cfg.tile_hw is not None and (h > cfg.tile_hw[0] or w > cfg.tile_hw[1]):
        # large images: exact spatial tiling keeps the fused kernel's VMEM
        # footprint bounded (ops/tiled.py; config 4)
        from gabor_color_image_segmentation_tpu.ops.tiled import (
            gabor_energies_tiled,
        )

        energies = gabor_energies_tiled(
            color, bank, dtype, cfg.tile_hw, fn, pool
        )
    else:
        energies = fn(color, bank, dtype)
        for _ in range(pool):
            energies = _pool2x2_nhwc(energies)
    return energies, color


def compute_features(
    rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank
) -> jnp.ndarray:
    """(B,H,W,3) sRGB -> (B,H,W,D) standardized pixel features."""
    energies, color = compute_energies(rgb, cfg, bank)
    return assemble_features(energies, color, cfg.cluster)


def _pool2x2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H//2,W//2,C) exact 2x2 block means — the ordered f32
    sum of models/kmeans.py::pool2x2 (((x00+x01)+(x10+x11))*0.25, cast back),
    mirrored bit-for-bit by golden/graph pooling.

    Layout note (the 1.7 s/op config4 regression, exp_pool_nhwc.py): a
    stride-2 slice along W hits the SUBLANE dim of an NHWC tensor — four
    of them on the (4, 2160, 3840, 72) energies cost ~1.7 s/op. Instead,
    reshape (W, C) -> (W/2, 2C): identical linear order (one cheap
    relayout), after which the column split is a LANE slice and the row
    split strides an untiled major dim. Casts stay per-operand so no
    full-res f32 copy materializes (21 GB at config4's 4K batch-5 —
    measured HBM OOM); the add order is unchanged, results bitwise
    identical to the strided-slice form."""
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    c = x.shape[3]
    g = x[:, : 2 * h2, : 2 * w2]
    f32 = jnp.float32
    gp = g.reshape(g.shape[0], 2 * h2, w2, 2 * c)
    e, o = gp[:, 0::2], gp[:, 1::2]  # even / odd pixel rows
    s = (
        e[..., :c].astype(f32) + e[..., c:].astype(f32)
    ) + (o[..., :c].astype(f32) + o[..., c:].astype(f32))
    return (0.25 * s).astype(x.dtype)


def _can_segment_transposed(cfg: PipelineConfig, h: int, w: int) -> bool:
    """The transposed fast path applies to the plain-kmeans pipeline on TPU:
    channel-major fused energies -> transposed assembly -> kmeans_fused_t_xt,
    skipping three full-tensor layout round-trips. Falls back whenever the
    NHWC feature tensor is needed anyway (graph stage, non-kmeans, tiling,
    non-fused feature impl, turbo subsample, or off-TPU)."""
    from gabor_color_image_segmentation_tpu.models.kmeans import (
        PIPELINE_N_MAX,
        fused_solver_ready,
    )

    return (
        fused_solver_ready(cfg.cluster.k, h * w, n_max=PIPELINE_N_MAX)
        and cfg.cluster.method in ("kmeans", "gmm")
        and not cfg.graph.enabled
        and cfg.cluster.subsample == 1
        and cfg.cluster.feature_set == "full"
        # cue_weight="coherence" folds into the standardization affine on
        # the fast paths (ops/features.py::fold_coherence_affine) — no
        # fallback needed since round 4
        and cfg.bank.gamma == 1.0
        and cfg.feature_impl in ("auto", "pallas")
        and (cfg.tile_hw is None or (h <= cfg.tile_hw[0] and w <= cfg.tile_hw[1]))
    )


def segment_chw_grouped(
    color: jnp.ndarray,
    energies_cm,
    pooled_e,
    cfg: PipelineConfig,
    fold_twin=None,
) -> jnp.ndarray:
    """Relayout-free CHW kmeans on precomputed grouped energy buffers.

    color: (B, H, W, 3) Lab/RGB; energies_cm: tuple of per-scale-group
    (B, E_g, H, W) channel-major buffers exactly as the fused feature kernel
    emits them (gabor_energies_fused(grouped=True)); pooled_e: the matching
    2x2-mean twins (B, E_g, H//2, W//2), or None to skip the multigrid
    warmup. Extracted from the production transposed path so experiments
    (e.g. decimated large-sigma groups, exp_decimated.py) can feed custom
    buffers through the identical solver schedule.

    The fused Lloyd consumes the kernel's CHW output directly
    (models/kmeans_chw.py) — no xt buffer, no (H, W) -> N relayout, labels
    written in 2-D layout. Measured ~25 ms/batch-16 faster than the xt
    assembly at config1 scale.
    """
    from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
        _affine_params,
        build_color4,
        kmeans_fused_chw,
    )
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_coarse_centers_xp,
        xt_geometry,
    )
    from gabor_color_image_segmentation_tpu.ops.features import (
        _pool2x2_cm,
        assemble_xp_from_affine,
    )

    _, h, w, _ = color.shape
    dtype = energies_cm[0].dtype
    lvl = cfg.cluster.coarse_levels
    multigrid = pooled_e is not None
    with jax.named_scope("assemble"):
        xc4 = build_color4(color, dtype)
        # the kernel's 2x2 twins seed the coherence fold's 8x8 block
        # means (round-5 fast statistics — the full-res reshape route
        # cost config1 ~30 ms/op); ``fold_twin`` supplies them even
        # without the multigrid warmup (config0 + coherence). The color
        # twin is computed here and reused by the warmup below.
        twin = fold_twin if fold_twin is not None else pooled_e
        pc0 = _pool2x2_cm(xc4) if (multigrid or twin is not None) else None
        pooled_stats = (tuple(twin), pc0) if twin is not None else None
        affine = _affine_params(
            energies_cm, xc4, cfg.cluster, 1e-6, pooled=pooled_stats
        )
    c0 = None
    if multigrid:
        # multigrid warmup in the xt layout: the pooled buffer is 1/4
        # the data (1/16 at coarse_levels=2), so its one-time lane
        # relayout is cheap, and an xt Lloyd pass runs at the HBM floor
        # (~0.36 ms at config1 scale, 4x less again per extra level)
        # vs ~1.7 ms for the block-diagonal CHW pooled pass. Refinement
        # stays relayout-free in the CHW layout below. Deeper coarse
        # grids pool the kernel's 2x2 twin with the exact MXU pooling
        # matmuls (2x2 means of 2x2 means = 4x4 means; golden mirrors).
        e = sum(g.shape[1] for g in energies_cm)
        pe_l, pc_l, hc, wc = pooled_e, pc0, h // 2, w // 2
        levels = [(pe_l, pc_l)]  # CHW pooled twins, finest first
        for _ in range(lvl - 1):
            pe_l = tuple(_pool2x2_cm(g) for g in pe_l)
            pc_l = _pool2x2_cm(pc_l)
            hc, wc = hc // 2, wc // 2
            levels.append((pe_l, pc_l))
        m = hc * wc
        dp, m_pad, _ = xt_geometry(m, e + 3, dtype)
        with jax.named_scope("assemble_xp"):
            xp = assemble_xp_from_affine(
                pe_l, pc_l, affine[0], affine[1], dp, m_pad, dtype,
            )
        with jax.named_scope("coarse"):
            c0 = kmeans_coarse_centers_xp(
                xp, cfg.cluster.k, e + 3, m, cfg.cluster.coarse_iters
            )
        if cfg.cluster.mid_iters > 0:
            # intermediate-level Lloyd on the ALREADY-RESIDENT pooled
            # CHW twins (ascending), centers-only: each 2x2-level pass
            # streams 1/4 of a full-res pass, cutting refine_iters —
            # schedule mirrored by golden/kmeans_golden_multigrid and
            # the XLA/xt multigrid (experiments/exp_mid_level.py)
            with jax.named_scope("mid"):
                for pe_m, pc_m in reversed(levels[:-1]):
                    _, c0 = kmeans_fused_chw(
                        pe_m, pc_m, affine, cfg.cluster.k, 0, 0,
                        cfg.cluster.mid_iters, init_centers=c0,
                        with_labels=False,
                    )
    with jax.named_scope("cluster"):
        labels, _ = kmeans_fused_chw(
            energies_cm, xc4, affine, cfg.cluster.k, cfg.cluster.n_iter,
            0, cfg.cluster.refine_iters, init_centers=c0,
        )
    return labels.astype(jnp.int32)


def _segment_batch_transposed(
    rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank
) -> jnp.ndarray:
    """Labels-only kmeans pipeline in the transposed layout (see
    _can_segment_transposed). Same stages/math as the NHWC path; moments and
    matmuls reduce in a different layout, so borderline pixels may flip
    within float tolerance (tests pin >=99.9% agreement)."""
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        kmeans_fused_t_xt,
        xt_geometry,
    )
    from gabor_color_image_segmentation_tpu.ops.features import (
        assemble_features_t,
    )
    from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
        gabor_energies_fused,
    )

    b, h, w, _ = rgb.shape
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    chw = cfg.cluster.method == "kmeans" and cfg.cluster.init_stride == 1
    lvl = cfg.cluster.coarse_levels
    multigrid = (
        chw and cfg.cluster.coarse_iters > 0
        and h >= max(4, 1 << lvl) and w >= max(4, 1 << lvl)
    )
    # the coherence fold's fast statistics want the kernel's 2x2 twin even
    # without the multigrid warmup (config0: coherence^4 default, no
    # coarse schedule) — the fallback's extra full-res _pool2x2_cm level
    # costs ~0.6 ms/op where the in-kernel twin is nearly free
    want_twin = multigrid or (
        chw
        and getattr(cfg.cluster, "cue_weight", "static") == "coherence"
        and h >= 16 and w >= 16
    )
    with jax.named_scope("features"):
        color = _color_transform(rgb, cfg.color_space)
        if want_twin:
            # the kernel emits the 2x2-pooled multigrid twin in the same
            # VMEM pass (pre-pooled smoothing Toeplitz) — a standalone
            # pooling pass measured ~8 ms/batch-16 at config1 scale.
            # grouped=True: all downstream consumers (affine moments, xp
            # assembly, the grouped CHW Lloyd) take per-scale-group buffers
            # directly, so the full-tensor concat copy never happens.
            energies_cm, pooled_e = gabor_energies_fused(
                color, bank, dtype, channel_major=True, pooled=True,
                grouped=True,
            )
        else:
            energies_cm = gabor_energies_fused(
                color, bank, dtype, channel_major=True
            )
    if chw:
        return segment_chw_grouped(
            color, energies_cm, pooled_e if multigrid else None, cfg,
            fold_twin=pooled_e if want_twin else None,
        )
    e = energies_cm.shape[1]
    dp, n_pad, _ = xt_geometry(h * w, e + 3, dtype)
    multigrid = (
        cfg.cluster.method == "kmeans" and cfg.cluster.coarse_iters > 0
        and cfg.cluster.init_stride == 1
        and h >= (1 << lvl) and w >= (1 << lvl)
    )
    xp = None
    with jax.named_scope("assemble"):
        if multigrid and lvl == 1:
            from gabor_color_image_segmentation_tpu.ops.features import (
                assemble_features_t_pooled,
            )

            m = (h // 2) * (w // 2)
            _, m_pad, _ = xt_geometry(m, e + 3, dtype)
            xt, xp = assemble_features_t_pooled(
                energies_cm, color, cfg.cluster, dp, n_pad, m_pad
            )
        else:
            # deeper coarse grids on this rarely-taken fallback leave
            # xp=None: kmeans_fused_t_xt pools the xt buffer itself
            xt = assemble_features_t(energies_cm, color, cfg.cluster, dp, n_pad)
    with jax.named_scope("cluster"):
        if cfg.cluster.method == "gmm":
            from gabor_color_image_segmentation_tpu.models.gmm import (
                gmm_fit_levels,
            )
            from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
                gmm_fused_t_xt,
            )

            fit_xp = None
            hp, wp, lv = gmm_fit_levels(h, w, cfg.cluster.gmm_fit_pool)
            if lv > 0:
                # pooled fit buffer from the CHANNEL-MAJOR energies with
                # MXU pooling matmuls + the full-res affine — pooling the
                # transposed buffer itself strides the lane axis (measured
                # ~43 ms/batch-8 at config2 scale vs ~2 ms this way);
                # affine(pool(raw)) == pool(affine(raw)) in real arithmetic
                from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
                    _affine_params,
                    build_color4,
                )
                from gabor_color_image_segmentation_tpu.ops.features import (
                    _pool2x2_cm,
                    assemble_xp_from_affine,
                )

                with jax.named_scope("assemble_fit_xp"):
                    xc4 = build_color4(color, dtype)
                    aff = _affine_params(energies_cm, xc4, cfg.cluster, 1e-6)
                    pe_l, pc_l = energies_cm, xc4
                    for _ in range(lv):
                        pe_l, pc_l = _pool2x2_cm(pe_l), _pool2x2_cm(pc_l)
                    _, mp_pad, _ = xt_geometry(hp * wp, e + 3, dtype)
                    fit_xp = assemble_xp_from_affine(
                        pe_l, pc_l, aff[0], aff[1], dp, mp_pad, dtype,
                    )
            labels = gmm_fused_t_xt(
                xt, cfg.cluster.k, e + 3, h * w, cfg.cluster.n_iter,
                cfg.cluster.gmm_reg_covar, 10, cfg.cluster.gmm_tol,
                (h, w), cfg.cluster.gmm_fit_pool, fit_xp,
                cfg.cluster.gmm_refine_iters,
            )
        else:
            labels, _ = kmeans_fused_t_xt(
                xt, cfg.cluster.k, e + 3, h * w, cfg.cluster.n_iter,
                cfg.cluster.init_stride, (h, w) if multigrid else None,
                cfg.cluster.coarse_iters if multigrid else 0,
                cfg.cluster.refine_iters, xp=xp, coarse_levels=lvl,
                mid_iters=cfg.cluster.mid_iters if multigrid and lvl > 1
                and xp is None else 0,
            )
    return labels.reshape(b, h, w).astype(jnp.int32)


@partial(jax.jit, static_argnums=(1, 2, 3))
def segment_batch(
    rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank,
    with_features: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B,H,W,3) sRGB -> ((B,H,W) int32 labels, (B,H,W,D) features).

    Per-image clustering vmaps the solver over the batch. The graph stage
    (SLIC + n-cut), when enabled, refines the label maps (models/graph.py).

    with_features=False returns (labels, None) and lets the kmeans pipeline
    run the transposed fast path on TPU (no NHWC feature tensor ever
    materializes — see _segment_batch_transposed); production serving wants
    label maps, not 243-dim per-pixel features.
    """
    b, h, w, _ = rgb.shape
    if not with_features and _can_segment_transposed(cfg, h, w):
        return _segment_batch_transposed(rgb, cfg, bank), None

    if cfg.graph.enabled:
        # the graph stage replaces the pixel-cluster labels wholesale, so
        # don't emit the cluster solver at all (Pallas custom calls are not
        # reliably DCE'd by XLA the way pure HLO is)
        from gabor_color_image_segmentation_tpu.models.graph import (
            graph_segment_batch,
        )

        p = cfg.graph.pool
        if p and (h % (1 << p) or w % (1 << p)):
            raise ValueError(
                f"graph.pool={p} needs H, W divisible by {1 << p}, got {h}x{w}"
            )
        with jax.named_scope("features"):
            # energies are computed at FULL resolution (filtering a pooled
            # image is not the same operator), then pooled by exact block
            # means BEFORE assembly so standardization moments are measured
            # on the grid the graph stage actually clusters. The pooling
            # rides inside compute_energies (per-window on the tiled path
            # — see its docstring for the round-5 measurement).
            fcfg = cfg
            if cfg.feature_impl == "auto" and (
                b == 1 or cfg.dtype == "float32"
            ):
                # The Pallas feature kernel co-resident with the graph
                # stage in ONE program deterministically CRASHES the axon
                # TPU worker at BATCH 1 (any dtype — bisect 2026-08-20:
                # every pairwise stage subset runs, batch >= 2 runs, only
                # the batch-1 full co-residency faults; "TPU worker
                # process crashed", CLAUDE.md landmine). Batch-1 is the
                # non-throughput case, and for fp32 parity mode the exact
                # modulated XLA formulation is the more parity-grade
                # choice anyway — consistent with the dtype-aware
                # slic/eig resolution. Production bf16 batches keep the
                # fused kernel.
                fcfg = cfg.replace(feature_impl="modulated")
            energies, color = compute_energies(rgb, fcfg, bank, pool=p)
            same = cfg.color_space == "lab"
            lab = color if same else _color_transform(rgb, "lab")
            for _ in range(p):
                color = _pool2x2_nhwc(color)
                lab = color if same else _pool2x2_nhwc(lab)
            feats = assemble_features(energies, color, cfg.cluster)
        with jax.named_scope("graph_cut"):
            labels = graph_segment_batch(feats, lab, cfg)
        if p:
            f = 1 << p
            labels = jnp.repeat(jnp.repeat(labels, f, axis=1), f, axis=2)
        # with pool > 0 the returned features are the POOLED grid's —
        # the tensor the graph stage actually consumed
        return labels, (feats if with_features else None)

    with jax.named_scope("features"):
        feats = compute_features(rgb, cfg, bank)
    d = feats.shape[-1]
    flat = feats.reshape(b, h * w, d)

    kmeans_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.cluster.method == "kmeans":
        from gabor_color_image_segmentation_tpu.models.kmeans import kmeans_batch

        # batched entry point: fused single-pass Pallas Lloyd on TPU,
        # vmapped XLA solver elsewhere (same scores/init/tie-breaks)
        with jax.named_scope("cluster"):
            labels = kmeans_batch(
                flat,
                cfg.cluster.k,
                cfg.cluster.n_iter,
                kmeans_dtype,
                cfg.cluster.subsample,
                cfg.cluster.init_stride,
                (h, w),
                cfg.cluster.coarse_iters,
                cfg.cluster.refine_iters,
                cfg.cluster.coarse_levels,
                cfg.cluster.mid_iters,
            )[0].reshape(b, h, w).astype(jnp.int32)
    elif cfg.cluster.method == "gmm":
        from gabor_color_image_segmentation_tpu.models.kmeans import (
            PIPELINE_N_MAX,
            fused_solver_ready,
        )

        use_fused_em = (
            fused_solver_ready(cfg.cluster.k, h * w, n_max=PIPELINE_N_MAX)
            and cfg.cluster.subsample == 1
        )
        if use_fused_em:
            from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
                gmm_fused_t,
            )

            with jax.named_scope("cluster"):
                labels = gmm_fused_t(
                    flat, cfg.cluster.k, cfg.cluster.n_iter,
                    cfg.cluster.gmm_reg_covar, 10, cfg.cluster.gmm_tol,
                    (h, w), cfg.cluster.gmm_fit_pool,
                    cfg.cluster.gmm_refine_iters,
                ).reshape(b, h, w).astype(jnp.int32)
        else:
            from gabor_color_image_segmentation_tpu.models.gmm import gmm_predict

            cluster = lambda f: gmm_predict(
                f,
                cfg.cluster.k,
                cfg.cluster.n_iter,
                cfg.cluster.gmm_reg_covar,
                cfg.cluster.subsample,
                cfg.cluster.gmm_tol,
                (h, w),
                cfg.cluster.gmm_fit_pool,
                cfg.cluster.gmm_refine_iters,
            )
            with jax.named_scope("cluster"):
                labels = jax.vmap(cluster)(flat).reshape(b, h, w).astype(jnp.int32)
    else:
        raise ValueError(cfg.cluster.method)

    return labels, (feats if with_features else None)


def segment_image(rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank = None):
    """Single-image convenience wrapper -> ((H,W) labels, (H,W,D) features)."""
    if bank is None:
        bank = make_bank(cfg.bank)
    labels, feats = segment_batch(rgb[None], cfg, bank)
    return labels[0], feats[0]


def segment_images(rgb: jnp.ndarray, cfg: PipelineConfig, bank: GaborBank = None):
    """Host-orchestrated batch entry point: (B,H,W,3) -> (B,H,W) int32.

    Identical to ``segment_batch`` for device-only configs; additionally
    handles the host-side stages: the min-cut graph variant (sequential
    union-find, SURVEY.md §7.4) and SLIC connectivity enforcement.
    """
    import numpy as np

    if bank is None:
        bank = make_bank(cfg.bank)
    g = cfg.graph
    if not (g.enabled and g.cut == "mincut"):
        # labels-only: the eval/serving entry point never consumes the
        # feature tensor, so run the production transposed fast path where
        # eligible (the same program the bench measures)
        labels, _ = segment_batch(rgb, cfg, bank, False)
        return labels

    from gabor_color_image_segmentation_tpu.models.graph import mincut_segment
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
        grid_shape,
    )
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch

    p = g.pool

    def prep(b):
        # same pooled-graph input rule as the jitted ncut branch above
        energies, color = compute_energies(b, cfg, bank)
        same = cfg.color_space == "lab"
        lab = color if same else _color_transform(b, "lab")
        for _ in range(p):
            energies = _pool2x2_nhwc(energies)
            color = _pool2x2_nhwc(color)
            lab = color if same else _pool2x2_nhwc(lab)
        return assemble_features(energies, color, cfg.cluster), lab

    feats, lab = jax.jit(prep)(jnp.asarray(rgb))
    hp, wp = rgb.shape[1] >> p, rgb.shape[2] >> p
    gh, gw, _ = grid_shape(hp, wp, g.n_superpixels)
    sp = jax.jit(
        lambda l: enforce_connectivity_device(
            slic_batch(l, g.n_superpixels, g.slic_compactness, g.slic_iters,
                       g.slic_impl),
            gh * gw,
        )
    )(lab)
    feats_np = np.asarray(feats)
    sp_np = np.asarray(sp)
    out = np.stack(
        [
            mincut_segment(feats_np[i], sp_np[i], g.mincut_k, g.mincut_min_size)
            for i in range(rgb.shape[0])
        ]
    )
    if p:
        out = out.repeat(1 << p, axis=1).repeat(1 << p, axis=2)
    return jnp.asarray(out)
