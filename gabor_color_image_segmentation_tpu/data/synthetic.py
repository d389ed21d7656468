"""Deterministic synthetic texture mosaics — BSDS500 stand-in (SURVEY.md §4.3).

The sandbox has no BSDS500 download, so tests and benchmarks use seeded
texture-mosaic images with known ground-truth segments: each region gets a
distinct base color plus an oriented sinusoidal texture (different frequency
and orientation per region) — exactly the signal family a Gabor+color
pipeline is built to separate. Ground truth is exact by construction, so PRI
and boundary-F have meaningful targets.
"""

from __future__ import annotations

import numpy as np


def _voronoi_labels(h: int, w: int, n_regions: int, rng: np.random.Generator):
    """Voronoi partition from random sites -> (h, w) int32 labels in [0, n)."""
    sites = np.stack(
        [rng.uniform(0, h, n_regions), rng.uniform(0, w, n_regions)], axis=1
    )
    yy, xx = np.mgrid[0:h, 0:w]
    d = (yy[..., None] - sites[:, 0]) ** 2 + (xx[..., None] - sites[:, 1]) ** 2
    return np.argmin(d, axis=-1).astype(np.int32)


def synthetic_mosaic(
    h: int = 321,
    w: int = 481,
    n_regions: int = 5,
    seed: int = 0,
    texture_strength: float = 0.25,
    noise: float = 0.02,
    texture_only: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded texture mosaic.

    Returns (rgb uint8 (h,w,3), gt labels int32 (h,w)).

    ``texture_only=True`` gives every region the SAME base color; regions
    differ ONLY in texture orientation (evenly spaced across [0, pi)) and
    frequency (evenly spaced bins) — the split that isolates the Gabor
    bank's contribution from the color cue (VERDICT r2 missing #4: the
    default split gives each region a distinct color AND texture, so
    color-only features could explain most of the PRI). The default path's
    RNG draw sequence is unchanged, so all seeded images/tests/benchmarks
    are bit-identical to before.
    """
    rng = np.random.default_rng(seed)
    gt = _voronoi_labels(h, w, n_regions, rng)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    # distinct, well-separated base colors
    hues = np.linspace(0.0, 1.0, n_regions, endpoint=False)
    rng.shuffle(hues)
    for r in range(n_regions):
        base = _hsv_to_rgb(hues[r], 0.55, 0.75)
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.06, 0.22)  # cycles/pixel, inside typical bank band
        phase = rng.uniform(0, 2 * np.pi)
        if texture_only:
            # one shared color; textures guaranteed separable per region
            # (the draws above still happen, keeping the default stream)
            base = (0.55, 0.55, 0.55)
            theta = np.pi * r / n_regions
            freq = 0.07 + 0.13 * r / max(1, n_regions - 1)
        tex = np.sin(2 * np.pi * freq * (xx * np.cos(theta) + yy * np.sin(theta)) + phase)
        m = gt == r
        for c in range(3):
            img[:, :, c][m] = base[c] + texture_strength * tex[m]
    img += rng.normal(0.0, noise, img.shape)
    img = np.clip(img, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8), gt


def _hsv_to_rgb(h: float, s: float, v: float) -> tuple[float, float, float]:
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    return [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]


def synthetic_mosaic_multigt(
    h: int = 321,
    w: int = 481,
    n_regions: int = 5,
    seed: int = 0,
    n_gts: int = 3,
    texture_strength: float = 0.25,
    noise: float = 0.02,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Mosaic with GENUINELY disagreeing ground truths (BSDS humans differ
    mostly in granularity, not in arbitrary label edits — VERDICT r2
    missing #4 retired the old merge-of-the-exact-GT variants).

    The image is built hierarchically: a FINE Voronoi partition of
    ~2*n_regions cells, each cell assigned one of n_regions appearance
    classes (color + texture). The GT variants are then three honest
    segmentations of the same image at different granularities:

    * gt[0] — the appearance classes (the generative truth; boundaries
      exactly where appearance changes),
    * gt[1] — the fine cells themselves (an over-segmenting human: extra
      boundaries INSIDE uniform-appearance regions, where gt[0] has none),
    * gt[2] — appearance classes pairwise-merged (a coarse human).

    Returns (rgb uint8, [gts] with len n_gts, finest granularity LAST so
    gts[0] stays the exact truth for single-GT consumers).
    """
    rng = np.random.default_rng(seed)
    m = 2 * n_regions
    cells = _voronoi_labels(h, w, m, rng)
    # every class present; remaining cells assigned pseudo-randomly
    cls_of_cell = np.concatenate(
        [np.arange(n_regions), rng.integers(0, n_regions, m - n_regions)]
    ).astype(np.int32)
    rng.shuffle(cls_of_cell)
    gt_exact = cls_of_cell[cells]

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    hues = np.linspace(0.0, 1.0, n_regions, endpoint=False)
    rng.shuffle(hues)
    for r in range(n_regions):
        base = _hsv_to_rgb(hues[r], 0.55, 0.75)
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.06, 0.22)
        phase = rng.uniform(0, 2 * np.pi)
        tex = np.sin(
            2 * np.pi * freq * (xx * np.cos(theta) + yy * np.sin(theta)) + phase
        )
        msk = gt_exact == r
        for c in range(3):
            img[:, :, c][msk] = base[c] + texture_strength * tex[msk]
    img += rng.normal(0.0, noise, img.shape)
    img = np.clip(img, 0.0, 1.0)
    rgb = (img * 255.0 + 0.5).astype(np.uint8)

    gts = [gt_exact]
    if n_gts > 1:
        gts.append(cells.astype(np.int32))  # over-segmenting human
    if n_gts > 2:
        gts.append((gt_exact // 2).astype(np.int32))  # coarse human
    for g in range(3, n_gts):
        # further humans: alternative cell->class merges at mid granularity
        merge = (cls_of_cell + g) % max(2, n_regions - 1)
        gts.append(merge[cells].astype(np.int32))
    return rgb, gts[:n_gts]


def synthetic_dataset(
    n_images: int,
    h: int = 321,
    w: int = 481,
    n_regions: int = 5,
    seed: int = 0,
    n_gts: int = 3,
):
    """Yield (image_id, rgb, [gt variants]) — mimics BSDS's multiple human
    ground truths with genuinely different granularities per variant
    (synthetic_mosaic_multigt)."""
    for i in range(n_images):
        rgb, gts = synthetic_mosaic_multigt(
            h, w, n_regions, seed=seed + i, n_gts=n_gts
        )
        yield f"synth{i:04d}", rgb, gts
