"""SLIC superpixels: golden parity + structural properties (SURVEY.md C10)."""

import numpy as np

from gabor_color_image_segmentation_tpu.models.slic import (
    enforce_connectivity,
    grid_shape,
    slic,
)
from golden.features import rgb_to_lab_np
from golden.graph import slic_golden


def test_matches_golden(small_mosaic):
    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    ours = np.asarray(slic(lab, 64, 10.0, 10))
    gold = slic_golden(lab, 64, 10.0, 10)
    agree = (ours == gold).mean()
    assert agree > 0.999, f"SLIC agreement {agree}"


def test_label_range_and_coverage(small_mosaic):
    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    n_target = 64
    labels = np.asarray(slic(lab, n_target, 10.0, 10))
    gh, gw, _ = grid_shape(*lab.shape[:2], n_target)
    assert labels.min() >= 0 and labels.max() < gh * gw
    # most cells survive as non-empty superpixels
    assert len(np.unique(labels)) > 0.7 * gh * gw


def test_locality(small_mosaic):
    """Each superpixel stays within a ~2-cell radius of its seed (SLIC ruler)."""
    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    labels = np.asarray(slic(lab, 64, 10.0, 10))
    h, w = labels.shape
    gh, gw, s = grid_shape(h, w, 64)
    yy, xx = np.mgrid[0:h, 0:w]
    for v in np.unique(labels):
        m = labels == v
        cy, cx = (v // gw + 0.5) * h / gh, (v % gw + 0.5) * w / gw
        assert np.abs(yy[m] - cy).max() < 2.5 * s
        assert np.abs(xx[m] - cx).max() < 2.5 * s


def test_enforce_connectivity():
    # construct a label map with a disconnected fragment + a tiny island
    labels = np.zeros((20, 20), np.int32)
    labels[:, 10:] = 1
    labels[0:2, 0:2] = 1  # fragment of label 1 inside label 0 region
    labels[10, 3] = 2  # one-pixel island
    out = enforce_connectivity(labels, min_size=8)
    # islands absorbed; components contiguous
    from scipy import ndimage

    for v in np.unique(out):
        cc, n = ndimage.label(out == v)
        assert n == 1, f"label {v} split into {n} components"
    assert (out[0:2, 0:2] == out[3, 3]).all()  # fragment absorbed into region 0


def test_device_connectivity_matches_golden(small_mosaic):
    """enforce_connectivity_device == the numpy mirror, bit for bit."""
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
    )
    from golden.graph import enforce_connectivity_golden

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    sp = np.asarray(slic(lab, 64, 10.0, 10))
    gh, gw, _ = grid_shape(*lab.shape[:2], 64)
    dev = np.asarray(enforce_connectivity_device(sp[None], gh * gw))[0]
    gold = enforce_connectivity_golden(sp, n_sp=gh * gw)
    assert (dev == gold).all()


def test_device_connectivity_crafted():
    """cv2 semantics: >= min_size components survive (renumbered in raster
    order), smaller fragments absorbed; output 4-connected."""
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
    )
    from scipy import ndimage

    labels = np.zeros((20, 20), np.int32)
    labels[:, 10:] = 1
    labels[15:18, 2:5] = 1  # 9px fragment of label 1 inside label 0's region
    labels[10, 3] = 2  # one-pixel island
    # min_size default = 400 // 3 // 4 = 33 > 9: both fragments absorbed
    out = np.asarray(enforce_connectivity_device(labels[None], 3))[0]
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for v in np.unique(out):
        cc, ncc = ndimage.label(out == v, structure=structure)
        assert ncc == 1, f"label {v} split into {ncc} components"
    # raster renumbering: left region root (0,0) -> 0, right root (0,10) -> 1
    assert (out[:, 10:] == 1).all()
    assert out[10, 3] == 0 and (out[15:18, 2:5] == 0).all()  # absorbed
    assert set(np.unique(out)) == {0, 1}

    # a LARGE secondary fragment becomes its own superpixel (cv2 renumber)
    labels2 = np.zeros((20, 20), np.int32)
    labels2[:, 10:] = 1
    labels2[12:20, 0:6] = 1  # 48px >= min_size fragment of label 1
    out2 = np.asarray(enforce_connectivity_device(labels2[None], 3))[0]
    assert (out2[:, 10:] == 1).all()  # roots in raster order: 0, then right=1
    assert len(np.unique(out2)) == 3  # the big fragment got a NEW id (2)
    assert (out2[12:20, 0:6] == 2).all()


def test_graph_path_superpixels_are_connected(small_mosaic):
    """Property: every superpixel feeding the affinity graph in the config3
    device path is 4-connected (VERDICT round-1 item 5)."""
    import dataclasses

    import jax.numpy as jnp
    from scipy import ndimage

    from gabor_color_image_segmentation_tpu.config import preset
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
    )
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_batch

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    cfg = preset("config3")
    g = dataclasses.replace(cfg.graph, n_superpixels=64)
    gh, gw, _ = grid_shape(*lab.shape[:2], 64)
    # the exact sequence graph_segment_batch runs before superpixel_means
    sp = slic_batch(
        jnp.asarray(lab)[None], g.n_superpixels, g.slic_compactness,
        g.slic_iters, g.slic_impl,
    )
    raw = np.asarray(sp)[0]
    sp = np.asarray(enforce_connectivity_device(sp, gh * gw))[0]
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for v in np.unique(sp):
        cc, ncc = ndimage.label(sp == v, structure=structure)
        assert ncc == 1, f"superpixel {v} split into {ncc} components"
    # full-rule check (min_size survival, raster renumbering, s_max clamp,
    # absorption priority) via the bit-exact numpy mirror
    from golden.graph import enforce_connectivity_golden

    assert (sp == enforce_connectivity_golden(raw, n_sp=gh * gw)).all()


def test_fused_banded_matches_plain(small_mosaic):
    """Interpret-mode banded Pallas SLIC vs plain XLA SLIC.

    The kernel's scores are bf16x3 (two-bf16 operand split, ~2^-16 relative
    — Mosaic supports neither HIGH nor f32 dot algorithms), so pixels that
    are near-equidistant between two superpixels may flip; everything else
    is identical. Per-pixel agreement lands ~0.995; the downstream
    region-level test below is the functional gate."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.slic_pallas import (
        slic_fused,
        slic_fused_eligible,
    )

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    h, w = lab.shape[:2]
    assert slic_fused_eligible(h, w, 64)
    plain = np.asarray(slic(lab, 64, 10.0, 5))
    fused = np.asarray(slic_fused(jnp.asarray(lab)[None], 64, 10.0, 5))[0]
    agree = (plain == fused).mean()
    assert agree > 0.99, f"fused SLIC agreement {agree}"


def test_fused_all_matches_banded_loop(small_mosaic):
    """The whole-image all-iterations SLIC kernel must match the
    launch-per-pass banded loop it replaces, BITWISE — on the w5 plan,
    whose band order and matmul chunking are identical to the banded loop
    (the cell-aligned w3 plan changes the psum accumulation order and is
    held to the agreement standard by test_w3_agreement instead; advisor
    r3 low #2 — this test now pins the plan it actually contracts)."""
    import jax.numpy as jnp

    import gabor_color_image_segmentation_tpu.models.slic_pallas as sp

    rgb, _ = small_mosaic
    lab = jnp.asarray(rgb_to_lab_np(rgb))[None]
    fused_all = np.asarray(sp.slic_fused(lab, 64, 10.0, 5, "w5"))
    old = sp._SLIC_FUSE_BYTES
    try:
        sp._SLIC_FUSE_BYTES = 0  # force the banded launch-per-pass form
        # the gate is read at TRACE time: without clearing the jit cache the
        # second call would reuse the first call's executable and compare
        # the kernel against itself
        sp.slic_fused.clear_cache()
        # the banded loop is plan-free (its band order IS w5's); an
        # explicit plan on this path now raises (advisor r4 low #2)
        banded = np.asarray(sp.slic_fused(lab, 64, 10.0, 5, "auto"))
    finally:
        sp._SLIC_FUSE_BYTES = old
        sp.slic_fused.clear_cache()
    assert (fused_all == banded).all()


def test_w3_agreement(small_mosaic):
    """Cell-aligned w3 fused-all vs the 5-row fused-all plan: same
    9-candidate rule and scores, psum accumulation order differs — labels
    must agree (exactly here; the production gate is the >=0.999 agreement
    + PRI parity standard, exp_slic_w3.py measures it at config3 scale).
    Plan selection is a per-call static argument — no global flips, no
    cache clearing (advisor r3 low #4)."""
    import jax.numpy as jnp

    import gabor_color_image_segmentation_tpu.models.slic_pallas as sp

    rgb, _ = small_mosaic
    lab = jnp.asarray(rgb_to_lab_np(rgb))[None]
    w3 = np.asarray(sp.slic_fused(lab, 64, 10.0, 5, "w3"))
    w5 = np.asarray(sp.slic_fused(lab, 64, 10.0, 5, "w5"))
    agree = (w3 == w5).mean()
    assert agree >= 0.999, f"w3 vs w5 agreement {agree}"
    # the production default must be one of the two measured plans
    # the production plan is w3 — an EXPLICIT expectation, not a
    # reflection of the module global: flipping the default must fail
    # this test loudly so the flip is a recorded, measured decision
    # (VERDICT r4 weak #5)
    assert sp._W3_FUSED is True, "production SLIC plan changed from w3"
    auto = np.asarray(sp.slic_fused(lab, 64, 10.0, 5))
    assert (auto == w3).all()


def test_fused_banded_downstream_regions(small_mosaic):
    """Boundary-pixel flips from the fused kernel must not move the final
    n-cut regions: superpixel means average ~hundreds of pixels."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.graph import (
        ncut_from_superpixels,
    )
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape
    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    h, w = lab.shape[:2]
    feats = jnp.asarray(lab, jnp.float32)  # color features suffice here
    gh, gw, _ = grid_shape(h, w, 64)
    plain_sp = slic(lab, 64, 10.0, 5)
    fused_sp = slic_fused(jnp.asarray(lab)[None], 64, 10.0, 5)[0]
    a = np.asarray(ncut_from_superpixels(feats, plain_sp, gh * gw, 4, None, "eigh"))
    b = np.asarray(ncut_from_superpixels(feats, fused_sp, gh * gw, 4, None, "eigh"))
    from gabor_color_image_segmentation_tpu.utils.labels import align_labels

    aligned = align_labels(b.reshape(-1), a.reshape(-1)).reshape(a.shape)
    agree = (aligned == a).mean()
    assert agree > 0.995, f"downstream region agreement {agree}"


def test_fused_banded_batched(tiny_mosaic, small_mosaic):
    """Batched fused SLIC matches per-image XLA SLIC on each image."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.slic_pallas import slic_fused

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    batch = np.stack([lab, lab[:, ::-1]])
    fused = np.asarray(slic_fused(jnp.asarray(batch), 48, 10.0, 4))
    for i in range(2):
        plain = np.asarray(slic(batch[i], 48, 10.0, 4))
        agree = (plain == fused[i]).mean()
        # bf16x3 scores: boundary-equidistant pixels may flip (see above)
        assert agree > 0.99, f"image {i} agreement {agree}"


def test_fused_connectivity_bit_equal_random():
    """connectivity_pallas (interpret mode on CPU) == the XLA device pass,
    bit for bit, on heavily fragmented random labels — the survivor rule
    (capped BFS subtree count, connectivity_pallas.py docstring) must make
    the identical keep/absorb decisions as the true-counts histogram."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
        enforce_connectivity_fused,
    )
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
    )

    rng = np.random.default_rng(7)
    for h, w, n_sp, min_size in [(48, 64, 12, 16), (40, 56, 9, 10)]:
        base = rng.integers(0, n_sp, ((h + 7) // 8, (w + 7) // 8))
        lab = np.kron(base, np.ones((8, 8), int))[:h, :w]
        noise = rng.integers(0, n_sp, (h, w))
        lab = np.where(rng.random((h, w)) < 0.25, noise, lab)
        lab = np.stack([lab, lab[:, ::-1]]).astype(np.int32)
        a = np.asarray(enforce_connectivity_device(jnp.asarray(lab), n_sp, min_size))
        b = np.asarray(enforce_connectivity_fused(jnp.asarray(lab), n_sp, min_size))
        assert (a == b).all(), f"{h}x{w}: {(a != b).sum()} differing pixels"


def test_fused_connectivity_on_slic_output(small_mosaic):
    """Same bit-equality on a real SLIC label map (golden-path input),
    including the default min_size/s_max derivation."""
    import jax.numpy as jnp

    from gabor_color_image_segmentation_tpu.models.connectivity_pallas import (
        enforce_connectivity_fused,
    )
    from gabor_color_image_segmentation_tpu.models.slic import (
        enforce_connectivity_device,
        grid_shape,
    )

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    h, w = lab.shape[:2]
    sp = np.asarray(slic(lab, 48, 10.0, 5))[None].astype(np.int32)
    gh, gw, _ = grid_shape(h, w, 48)
    a = np.asarray(enforce_connectivity_device(jnp.asarray(sp), gh * gw))
    b = np.asarray(enforce_connectivity_fused(jnp.asarray(sp), gh * gw))
    assert (a == b).all(), f"{(a != b).sum()} differing pixels"


def test_fused_w_rows4_plan(small_mosaic):
    """Shapes where 5 grid rows exceed the 128-lane window (config4's
    pooled 4K grid: gh=15, gw=27) fall back to a 4-row window with bands
    shorter than one cell height — same exact 9-candidate rule, so
    agreement with the exact XLA path matches the usual bf16x3 level."""
    import jax.numpy as jnp

    import gabor_color_image_segmentation_tpu.models.slic_pallas as sp

    # config3's plan is unchanged by the w_rows=4 extension
    p = sp._plan(321, 481, 400)
    assert (p["w_rows"], p["band_rows"]) == (5, 32)
    # config4's pooled grid becomes eligible (was None before the extension)
    p2 = sp._plan(540, 960, 400)
    assert p2 is not None and p2["w_rows"] == 4 and p2["gw"] == 27

    rgb, _ = small_mosaic  # 96 x 128; n_sp=588 -> gw=28: 5 rows > 128 lanes
    lab = rgb_to_lab_np(rgb)
    p3 = sp._plan(96, 128, 588)
    assert p3 is not None and p3["w_rows"] == 4
    plain = np.asarray(slic(jnp.asarray(lab), 588, 10.0, 5))
    fused = np.asarray(sp.slic_fused(jnp.asarray(lab)[None], 588, 10.0, 5))[0]
    agree = (plain == fused).mean()
    assert agree > 0.99, f"w_rows=4 fused SLIC agreement {agree}"


def test_explicit_plan_on_banded_path_raises(small_mosaic):
    """An explicit w3/w5 plan is only honored by the whole-image fused
    launch; the banded fall-through must reject it rather than silently
    run plan-free (advisor r4 low #2)."""
    import jax.numpy as jnp
    import pytest

    import gabor_color_image_segmentation_tpu.models.slic_pallas as sp

    rgb, _ = small_mosaic
    lab = jnp.asarray(rgb_to_lab_np(rgb))[None]
    with pytest.raises(ValueError, match="unknown SLIC plan"):
        sp.slic_fused(lab, 64, 10.0, 5, "w4")
    old = sp._SLIC_FUSE_BYTES
    try:
        sp._SLIC_FUSE_BYTES = 0  # force the banded launch-per-pass form
        sp.slic_fused.clear_cache()
        with pytest.raises(ValueError, match="plan-free"):
            sp.slic_fused(lab, 64, 10.0, 5, "w5")
    finally:
        sp._SLIC_FUSE_BYTES = old
        sp.slic_fused.clear_cache()


def test_w3_only_plan_geometry(small_mosaic):
    """Round-5 config3 geometry (900 superpixels at 321x481 -> gw=37):
    5*gw and 4*gw exceed the 128-lane window, so the banded/w5 plans are
    ineligible — the cell-aligned w3 whole-image kernel must still run
    (w3-only plan, w_rows=0) and match plain XLA SLIC at the usual bf16x3
    agreement standard; explicit plan='w5' must raise."""
    import jax.numpy as jnp
    import pytest

    import gabor_color_image_segmentation_tpu.models.slic_pallas as sp

    rgb, _ = small_mosaic
    lab = rgb_to_lab_np(rgb)
    bp = sp._plan(*lab.shape[:2], 800)
    assert bp is not None and bp["w_rows"] == 0  # w3-only geometry
    assert sp.slic_fused_eligible(*lab.shape[:2], 800)
    plain = np.asarray(slic(lab, 800, 5.0, 5))
    fused = np.asarray(sp.slic_fused(jnp.asarray(lab)[None], 800, 5.0, 5))[0]
    agree = (plain == fused).mean()
    assert agree > 0.98, f"w3-only fused agreement {agree}"
    with pytest.raises(ValueError, match="w3-only"):
        sp.slic_fused(jnp.asarray(lab)[None], 800, 5.0, 5, "w5")
    # the production config3 geometry itself is w3-only and stays fused
    assert sp._plan(321, 481, 900)["w_rows"] == 0
    assert sp.slic_fused_eligible(321, 481, 900)
