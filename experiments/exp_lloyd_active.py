"""How much Lloyd work could bound-based block skipping save? (TPU)

The v3 fused Lloyd is at the HBM floor, so the only remaining lever is to
NOT stream parts of x. A Hamerly/Elkan-style block skip needs, per lane
block, the guarantee that no pixel's assignment can change this iteration.
This experiment measures the ceiling of that idea on the real config1
features:

  * per iteration: fraction of pixels whose label changes (oracle skip rate)
  * per iteration: fraction of 4096-lane blocks containing ANY change
    (what per-block skipping could actually avoid streaming, with a
    perfect bound)
  * the same with a realistic margin bound: a block must be processed if
    block_min_margin < 2 * max_shift * block_max_norm + shift_sq_term
    (margin = second_best_score - best_score from the last processed pass)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lloyd_active.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.kmeans import (
    _assign_scores,
    maximin_init,
)
from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
from gabor_color_image_segmentation_tpu.ops.bank import make_bank


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    from gabor_color_image_segmentation_tpu.data import synthetic_mosaic

    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0] for i in range(16)]
    )
    feats = jax.jit(lambda b: compute_features(b, cfg, bank))(jnp.asarray(imgs))
    bsz, h, w, d = feats.shape
    flat = feats.reshape(bsz, h * w, d)
    fence(flat)

    K, N_ITER, DT = 5, 25, jnp.bfloat16
    BLOCK = 4096
    n = h * w
    nb = -(-n // BLOCK)
    n_pad = nb * BLOCK

    @jax.jit
    def trace(x):
        def per_image(f):
            f = f.astype(DT)
            c0 = maximin_init(f, K).astype(jnp.float32)

            def step(c):
                scores = _assign_scores(f, c, DT)
                labels = jnp.argmin(scores, axis=1)
                s_sorted = jnp.sort(scores, axis=1)
                margin = s_sorted[:, 1] - s_sorted[:, 0]  # (N,)
                onehot = jax.nn.one_hot(labels, K, dtype=DT)
                counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
                sums = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
                new = sums / jnp.maximum(counts, 1.0)[:, None]
                new = jnp.where(counts[:, None] > 0, new, c)
                return labels, margin, new

            def body(c, _):
                labels, margin, new = step(c)
                shift = jnp.sum((new - c) ** 2, axis=1)  # (K,)
                return new, (labels, margin, shift)

            _, (labels_t, margin_t, shift_t) = jax.lax.scan(
                body, c0, None, length=N_ITER
            )
            return labels_t, margin_t, shift_t  # (T, N), (T, N), (T, K)

        return jax.vmap(per_image)(x)

    labels_t, margin_t, shift_t = trace(flat)
    fence(labels_t.astype(jnp.float32))
    labels_t = np.asarray(labels_t)  # (B, T, N)
    margin_t = np.asarray(margin_t, np.float32)
    shift_t = np.asarray(shift_t, np.float32)

    # block-pad the pixel axis
    def to_blocks(a):  # (B, T, N) -> (B, T, nb, BLOCK)
        pad = np.zeros((bsz, N_ITER, n_pad - n), a.dtype)
        return np.concatenate([a, pad], axis=2).reshape(bsz, N_ITER, nb, BLOCK)

    # pixel norms for the realistic bound (normalized features: ~sqrt(D))
    xsq = np.asarray(
        jnp.sum(jnp.square(flat.astype(jnp.float32)), axis=2)
    )  # (B, N)
    xnorm_b = to_blocks(xsq[:, None, :].repeat(N_ITER, 1)).max(axis=3) ** 0.5

    chg = (labels_t[:, 1:] != labels_t[:, :-1])  # (B, T-1, N)
    chg_blocks = to_blocks(
        np.concatenate([np.ones_like(labels_t[:, :1], bool), chg], axis=1)
    ).any(axis=3)
    m_blocks = to_blocks(margin_t).min(axis=3)  # (B, T, nb) min margin

    print(f"B={bsz} N={n} nb={nb} block={BLOCK}")
    print("iter  %px-changed  %blk-oracle  %blk-margin-bound")
    for t in range(1, N_ITER):
        pct_px = chg[:, t - 1].mean() * 100
        pct_blk = chg_blocks[:, t].mean() * 100
        # realistic bound using margins from iteration t-1 and shift at t-1:
        # |score_j(t) - score_j(t-1)| <= |csq_j(t)-csq_j(t-1)| + 2|x||dc_j|
        # conservative: margin must exceed 2*(max_j |dc_j|)*(2*xnorm) + csq
        max_shift = np.sqrt(shift_t[:, t - 1].max(axis=1))  # (B,)
        active = m_blocks[:, t - 1] < (
            4.0 * max_shift[:, None] * xnorm_b[:, t - 1]
        )
        pct_bound = active.mean() * 100
        print(
            f"{t:4d}  {pct_px:10.3f}  {pct_blk:10.2f}  {pct_bound:12.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
