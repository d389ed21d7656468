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
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded texture mosaic.

    Returns (rgb uint8 (h,w,3), gt labels int32 (h,w)).
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


def synthetic_dataset(
    n_images: int,
    h: int = 321,
    w: int = 481,
    n_regions: int = 5,
    seed: int = 0,
    n_gts: int = 3,
):
    """Yield (image_id, rgb, [gt perturbed variants]) — mimics BSDS's multiple
    human ground truths by re-sampling region counts around n_regions."""
    for i in range(n_images):
        rgb, gt = synthetic_mosaic(h, w, n_regions, seed=seed + i)
        gts = [gt]
        for g in range(1, n_gts):
            # coarser human-like variant: merge region g-1 into region g
            gtv = gt.copy()
            a, b = (g - 1) % n_regions, g % n_regions
            gtv[gtv == a] = b
            gts.append(gtv)
        yield f"synth{i:04d}", rgb, gts
