"""Prototype: coarse-grid EM warmup for config2 (GMM) + iteration counts.

STATUS (2026-08-17, TPU, 8 synthetic eval images): NEGATIVE RESULT — kept
as the engineering record. (1) Full-res EM hits the 30-iteration cap on
7/8 images even at tol=1e-3 (the cap binds, not the tol: the
full-covariance log-likelihood keeps creeping). (2) Warm-starting from
params converged on the 4x4-pooled buffer does NOT cut full-res
iterations (28-30 of 30 still run) and lands 3/8 images in DIFFERENT
basins (A-vs-B label agreement 0.54-0.99). The EM surface is flat along
many directions, so any schedule change moves the endpoint; "parity" for
the GMM therefore means "golden mirrors the exact production schedule",
and speedups must come from cheaper passes or a shorter mirrored
schedule (quality-validated), not from a multigrid warmup.

Questions this answers (TPU, 8 synthetic eval images, config2 features):
  1. how many EM iterations the production tol=1e-3 loop actually burns
     per image at full resolution (the 30-iteration cap is the ceiling,
     not the typical cost)
  2. the same count when EM warm-starts from params converged on the
     4x4-pooled buffer (pooled kmeans init + pooled EM to tol), and the
     end-label agreement between the two schedules
  3. wall-clock of both schedules (fenced, loop-amortized)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_multigrid.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gabor_color_image_segmentation_tpu.models.gmm_pallas as gp
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    _pool_xt,
    kmeans_fused_t_xt,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import (
    assemble_features_t,
)
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)
from gabor_color_image_segmentation_tpu.utils.labels import align_labels

B = 8
TOL = 1e-3
REG = 1e-4
NIT = 30


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def em_loop(xt, params0, k, d, n, block, max_iter, tol, interpret):
    """gmm_fused_t_xt's freezing tol loop, returning per-image iter counts."""
    b = xt.shape[0]

    def em(params):
        a, bias, const = gp._params_to_kernel_inputs(*params, d, xt.shape[1], k)
        labels, ll, msums, covs = gp._em_pass(
            xt, a, bias, const, k, block, n, interpret, d
        )
        new = gp._moments_to_params(msums, covs, d, n, k, REG)
        return new, ll / n

    def freeze(go_b, new, old):
        mask = go_b.reshape((b,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    def cond(c):
        return jnp.any(c[3])

    def body(c):
        i, params, prev_ll, go_b, iters = c
        new, ll = em(params)
        params = tuple(freeze(go_b, n_, o_) for n_, o_ in zip(new, params))
        ll = jnp.where(go_b, ll, prev_ll)
        iters = iters + go_b.astype(jnp.int32)
        go_b = go_b & (i + 1 < max_iter) & (jnp.abs(ll - prev_ll) >= tol)
        return i + 1, params, ll, go_b, iters

    ll0 = jnp.full((b,), -jnp.inf, jnp.float32)
    go0 = jnp.full((b,), max_iter > 0)
    _, params, _, _, iters = lax.while_loop(
        cond, body, (jnp.int32(0), params0, ll0, go0,
                     jnp.zeros((b,), jnp.int32))
    )
    return params, iters


def init_params(xt, k, d, n, kmeans_iters):
    init_labels, _ = kmeans_fused_t_xt(xt, k, d, n, kmeans_iters)
    b, _, n_pad = xt.shape
    lab_pad = jnp.zeros((b, n_pad), jnp.int32).at[:, :n].set(init_labels)
    lab_pad = lab_pad.at[:, n:].set(-1)
    msums0, covs0 = gp._init_moments(xt, lab_pad, k, d)
    return gp._moments_to_params(msums0, covs0, d, n, k, REG)


def final_labels(xt, params, k, d, n, block, interpret):
    a, bias, const = gp._params_to_kernel_inputs(*params, d, xt.shape[1], k)
    labels, _, _, _ = gp._em_pass(xt, a, bias, const, k, block, n, interpret)
    return labels[:, :n]


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config2").replace(dtype="bfloat16")
    cc = cfg.cluster
    k = cc.k
    bank = make_bank(cfg.bank)
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(B)]
    )
    rgb = jnp.asarray(imgs)
    h, w = rgb.shape[1:3]
    n = h * w
    interpret = jax.default_backend() != "tpu"

    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    ec = jax.jit(
        lambda l: gabor_energies_fused(l, bank, jnp.bfloat16,
                                       channel_major=True)
    )(lab)
    e = ec.shape[1]
    d = e + 3
    dp, n_pad, _ = xt_geometry(n, d, jnp.bfloat16)
    xt = jax.jit(
        lambda ec_, l: assemble_features_t(ec_, l, cc, dp, n_pad)
    )(ec, lab)
    fence(xt)
    block = _block_for_t(n, dp, 2)

    # --- schedule A: production (full-res kmeans init + full-res EM) ------
    @jax.jit
    def schedA(xt_):
        p0 = init_params(xt_, k, d, n, 10)
        p, iters = em_loop(xt_, p0, k, d, n, block, NIT, TOL, interpret)
        return final_labels(xt_, p, k, d, n, block, interpret), iters

    la, it_a = schedA(xt)
    fence(la)
    t0 = time.perf_counter()
    la, it_a = schedA(xt)
    fence(la)
    ta = time.perf_counter() - t0
    print(f"A full-res: iters {np.asarray(it_a)} wall {ta*1e3:.1f} ms "
          f"(incl ~31 ms fence)", flush=True)

    # --- schedule B: 4x4-pooled kmeans init + pooled EM + full-res EM -----
    @jax.jit
    def schedB(xt_):
        xp2, m2, _ = _pool_xt(xt_, d, h, w)
        xp4, m4, block4 = _pool_xt(xp2, d, h // 2, w // 2)
        p0 = init_params(xp4, k, d, m4, 10)
        pc, it_c = em_loop(xp4, p0, k, d, m4, block4, NIT, TOL, interpret)
        pf, it_f = em_loop(xt_, pc, k, d, n, block, NIT, TOL, interpret)
        return (final_labels(xt_, pf, k, d, n, block, interpret), it_c, it_f)

    lb, it_c, it_f = schedB(xt)
    fence(lb)
    t0 = time.perf_counter()
    lb, it_c, it_f = schedB(xt)
    fence(lb)
    tb = time.perf_counter() - t0
    print(f"B pooled warmup: coarse iters {np.asarray(it_c)} full iters "
          f"{np.asarray(it_f)} wall {tb*1e3:.1f} ms", flush=True)

    la, lb = np.asarray(la), np.asarray(lb)
    for i in range(B):
        ag = (align_labels(lb[i], la[i]) == la[i]).mean()
        print(f"img {i}: A-vs-B label agreement {ag:.4f}", flush=True)


if __name__ == "__main__":
    main()
