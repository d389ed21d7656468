"""JAX SLIC superpixels (SURVEY.md C10) — TPU-native local k-means.

Semantics follow cv2.ximgproc SuperpixelSLIC (slic.hpp:64-161): grid-seeded
centroids in (L, a, b, y, x) space, ``iterate(n)`` rounds of local
assignment + centroid update, compactness ``ruler`` balancing color vs
spatial distance with the cell size s as the spatial normalizer.

TPU formulation: the classic "each centroid scans a 2s x 2s window" is
scatter-heavy, and the gather-based "each pixel tests its 9 neighbor-cell
centroids" turns out gather-bound on TPU (measured 674 ms/batch-8). The
production assignment is instead a MASKED DENSE score matmul on the MXU:

    z = [L, a, b, sqrt(w) y, sqrt(w) x]         (w = (ruler/s)^2)
    scores = ||c||^2 - 2 z @ C^T                (one (N, S) MXU matmul)
    scores = +inf outside the pixel's 3x3 neighbor cells (fused mask from
             iota arithmetic — the same candidate set as classic SLIC)
    label  = argmin_s scores                    (ties -> lowest cell id)

which is argmin-identical to the 9-candidate rule (the mask admits exactly
those centroids; the dropped per-pixel ||z||^2 is constant across s). The
update step is a segment-sum scatter-mean (XLA-native). Labels are flat
grid-cell ids in [0, gh*gw). Connectivity enforcement — inherently
sequential flood fill in the reference (slic.hpp enforceLabelConnectivity) —
ships as a host post-pass (``enforce_connectivity``), applied outside jit;
see SURVEY.md §7.4 (2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def grid_shape(h: int, w: int, n_superpixels: int) -> Tuple[int, int, float]:
    """Choose the seed grid (gh, gw) and cell size s for a target count."""
    s = math.sqrt(h * w / n_superpixels)
    gh = max(1, round(h / s))
    gw = max(1, round(w / s))
    return gh, gw, s


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def slic(
    lab: jnp.ndarray,
    n_superpixels: int,
    ruler: float = 10.0,
    n_iter: int = 10,
    min_size_frac: float = 0.0,  # reserved; connectivity handled on host
) -> jnp.ndarray:
    """(H, W, 3) Lab image -> (H, W) int32 superpixel labels in [0, gh*gw).

    vmap over a leading batch axis for batched execution.
    """
    h, w, _ = lab.shape
    gh, gw, s = grid_shape(h, w, n_superpixels)
    n_sp = gh * gw

    yy = jnp.arange(h, dtype=jnp.float32).reshape(-1, 1)
    xx = jnp.arange(w, dtype=jnp.float32).reshape(1, -1)
    yb = jnp.broadcast_to(yy, (h, w))
    xb = jnp.broadcast_to(xx, (h, w))
    # 5-D pixel features: (H, W, 5) = [L, a, b, y, x]
    px = jnp.concatenate([lab.astype(jnp.float32), yb[..., None], xb[..., None]], -1)
    flat = px.reshape(-1, 5)

    # initial centroids at cell centers
    cy = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * (h / gh)
    cx = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * (w / gw)
    cyg, cxg = jnp.meshgrid(cy, cx, indexing="ij")
    iy = jnp.clip(cyg.astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(cxg.astype(jnp.int32), 0, w - 1)
    init_color = lab[iy, ix].reshape(n_sp, 3)
    centroids = jnp.concatenate(
        [init_color, cyg.reshape(-1, 1), cxg.reshape(-1, 1)], axis=-1
    )  # (S, 5)

    # each pixel's home grid cell
    cell_y = jnp.clip((yb * (gh / h)).astype(jnp.int32), 0, gh - 1)
    cell_x = jnp.clip((xb * (gw / w)).astype(jnp.int32), 0, gw - 1)

    spatial_w = (ruler / s) ** 2
    sw = float(np.sqrt(spatial_w)) if spatial_w > 0 else 0.0

    # spatially-weighted pixel features for the dense score matmul
    z = jnp.concatenate([flat[:, :3], sw * flat[:, 3:]], axis=1)  # (N, 5)
    # per-centroid grid coordinates (static)
    gy = jnp.arange(n_sp, dtype=jnp.int32) // gw  # (S,)
    gx = jnp.arange(n_sp, dtype=jnp.int32) % gw
    py = cell_y.reshape(-1, 1)  # (N, 1)
    px = cell_x.reshape(-1, 1)
    # 3x3 neighbor-cell mask, identical candidate set to classic SLIC
    neighbor = (jnp.abs(gy[None, :] - py) <= 1) & (jnp.abs(gx[None, :] - px) <= 1)
    big = jnp.float32(3.4e38)

    # TPU default-precision f32 dots round inputs to bf16; SLIC score gaps
    # between adjacent candidates sit at the same magnitude as that error
    # (measured: default-precision labels agree only 0.76 with exact f32).
    # This path is the CPU/fallback route, so exactness beats MXU passes.
    hi = jax.lax.Precision.HIGHEST

    def assign(centroids):
        cs = jnp.concatenate([centroids[:, :3], sw * centroids[:, 3:]], axis=1)
        scores = jnp.sum(cs * cs, axis=1) - 2.0 * jnp.dot(
            z, cs.T, preferred_element_type=jnp.float32, precision=hi
        )  # (N, S) — one MXU matmul; ||z||^2 constant across s, dropped
        scores = jnp.where(neighbor, scores, big)
        return jnp.argmin(scores, axis=1)

    def body(_, centroids):
        labels = assign(centroids)
        # one-hot matmul instead of segment_sum: TPU scatters lower to
        # sort-based updates; (S, N) @ (N, 5) rides the MXU instead
        onehot = jax.nn.one_hot(labels, n_sp, dtype=jnp.float32)  # (N, S)
        sums = jnp.dot(
            onehot.T, flat, preferred_element_type=jnp.float32, precision=hi
        )
        cnts = jnp.sum(onehot, axis=0)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        return jnp.where(cnts[:, None] > 0, new, centroids)

    centroids = lax.fori_loop(0, n_iter, body, centroids)
    return assign(centroids).reshape(h, w).astype(jnp.int32)


def enforce_connectivity(labels: np.ndarray, min_size: int | None = None) -> np.ndarray:
    """Host post-pass mirroring SuperpixelSLIC::enforceLabelConnectivity:
    split disconnected fragments of a label, absorb fragments smaller than
    min_size (default: cell area / 4) into their largest adjacent component.

    Returns contiguous int32 labels.
    """
    from scipy import ndimage

    h, w = labels.shape
    n_in = int(labels.max()) + 1
    if min_size is None:
        min_size = max(1, (h * w) // n_in // 4)

    # connected components per label value (4-connectivity, SLIC convention)
    comp = np.full((h, w), -1, np.int32)
    n_comp = 0
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for v in range(n_in):
        mask = labels == v
        if not mask.any():
            continue
        cc, n = ndimage.label(mask, structure=structure)
        comp[mask] = cc[mask] + n_comp - 1
        n_comp += n

    sizes = np.bincount(comp.reshape(-1), minlength=n_comp)

    # absorb small components into the most-adjacent large neighbor, looping
    # because absorption can chain (tiny fragment rings)
    out = comp.copy()
    for _ in range(4):
        sizes = np.bincount(out.reshape(-1))
        small = np.flatnonzero(sizes < min_size)
        if small.size == 0:
            break
        small_set = np.zeros(sizes.size, bool)
        small_set[small] = True
        # horizontal + vertical neighbor pairs with differing components
        pairs = []
        a, b = out[:, :-1].reshape(-1), out[:, 1:].reshape(-1)
        m = a != b
        pairs.append(np.stack([a[m], b[m]], 1))
        a, b = out[:-1, :].reshape(-1), out[1:, :].reshape(-1)
        m = a != b
        pairs.append(np.stack([a[m], b[m]], 1))
        pr = np.concatenate(pairs)
        pr = np.concatenate([pr, pr[:, ::-1]])  # symmetric
        # for each small comp, count adjacency to each neighbor; pick argmax
        m = small_set[pr[:, 0]]
        pr = pr[m]
        if pr.size == 0:
            break
        key = pr[:, 0].astype(np.int64) * sizes.size + pr[:, 1]
        uk, cnt = np.unique(key, return_counts=True)
        order = np.argsort(-cnt, kind="stable")
        uk, cnt = uk[order], cnt[order]
        src = (uk // sizes.size).astype(np.int32)
        dst = (uk % sizes.size).astype(np.int32)
        # first occurrence per src = neighbor with max shared boundary
        first = np.unique(src, return_index=True)[1]
        mapping = np.arange(sizes.size, dtype=np.int32)
        mapping[src[first]] = dst[first]
        out = mapping[out]

    # relabel contiguous
    _, out = np.unique(out, return_inverse=True)
    return out.reshape(h, w).astype(np.int32)
