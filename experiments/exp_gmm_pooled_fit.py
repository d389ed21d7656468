"""Schedule probe: EM fitted on the 2x2-pooled grid, labels from a full-res
final E-step — quality (PRI/F) on the 20-image synthetic test split vs the
full-resolution schedule.

Rationale: the full-res EM burns its 30-iteration cap (exp_gmm_multigrid
NEGATIVE RESULT) at ~1.45 ms/pass bf16, so the only remaining 2x lever is
cheaper passes. Fitting the mixture on exact 2x2 block means (1/4 the
pixels; same pooling the accepted multigrid Lloyd uses) cuts every EM pass
4x, and the per-pixel labels still come from a full-resolution E-step
under the fitted model. A golden mirror is exact by construction
(pool2x2_np -> f64 EM -> full-res predict). Adopt ONLY if PRI holds.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_pooled_fit.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gabor_color_image_segmentation_tpu.models.gmm_pallas as gp
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.eval import load_split
from gabor_color_image_segmentation_tpu.metrics import pri_np
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    _pool_xt,
    kmeans_fused_t_xt,
    xt_geometry,
)
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import assemble_features_t
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

TOL = 1e-3
REG = 1e-4
NIT = 30


def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def em_loop(xt, params0, k, d, n, block, max_iter, tol, interpret):
    b = xt.shape[0]

    def em(params):
        a, bias, const = gp._params_to_kernel_inputs(*params, d, xt.shape[1], k)
        _, ll, msums, covs = gp._em_pass(
            xt, a, bias, const, k, block, n, interpret, d
        )
        return gp._moments_to_params(msums, covs, d, n, k, REG), ll / n

    def freeze(go_b, new, old):
        mask = go_b.reshape((b,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    def body(c):
        i, params, prev_ll, go_b = c
        new, ll = em(params)
        params = tuple(freeze(go_b, n_, o_) for n_, o_ in zip(new, params))
        ll = jnp.where(go_b, ll, prev_ll)
        go_b = go_b & (i + 1 < max_iter) & (jnp.abs(ll - prev_ll) >= tol)
        return i + 1, params, ll, go_b

    ll0 = jnp.full((b,), -jnp.inf, jnp.float32)
    go0 = jnp.full((b,), max_iter > 0)
    _, params, _, _ = lax.while_loop(
        lambda c: jnp.any(c[3]), body, (jnp.int32(0), params0, ll0, go0)
    )
    return params


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
    data = load_split("test", limit=20)
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def build(rgb):
        lab = _color_transform(rgb, cfg.color_space)
        ec = gabor_energies_fused(lab, bank, jnp.bfloat16, channel_major=True)
        e = ec.shape[1]
        h, w = rgb.shape[1:3]
        dp, n_pad, _ = xt_geometry(h * w, e + 3, jnp.bfloat16)
        return assemble_features_t(ec, lab, cc, dp, n_pad)

    h, w = 321, 481
    n = h * w
    d = 39
    dp0, n_pad0, _ = xt_geometry(n, d, jnp.bfloat16)
    block = _block_for_t(n, dp0, 2)

    @jax.jit
    def sched_full(xt_):
        p0 = init_params(xt_, k, d, n, 10)
        p = em_loop(xt_, p0, k, d, n, block, NIT, TOL, interpret)
        return final_labels(xt_, p, k, d, n, block, interpret)

    @jax.jit
    def sched_pooled(xt_):
        xp, m, block_p = _pool_xt(xt_, d, h, w)
        p0 = init_params(xp, k, d, m, 10)
        p = em_loop(xp, p0, k, d, m, block_p, NIT, TOL, interpret)
        return final_labels(xt_, p, k, d, n, block, interpret)

    @jax.jit
    def sched_pooled2(xt_):
        xp, m, _ = _pool_xt(xt_, d, h, w)
        xp2, m2, block_p2 = _pool_xt(xp, d, h // 2, w // 2)
        p0 = init_params(xp2, k, d, m2, 10)
        p = em_loop(xp2, p0, k, d, m2, block_p2, NIT, TOL, interpret)
        return final_labels(xt_, p, k, d, n, block, interpret)

    pris = {"full": [], "pooled": [], "pooled2": []}
    tload = {"full": 0.0, "pooled": 0.0, "pooled2": 0.0}
    for idx, item in enumerate(data):
        _, rgb, gt_list = item  # (image_id, rgb, [gts])
        xt = build(jnp.asarray(rgb)[None])
        fence(xt)
        for name, fn in (("full", sched_full), ("pooled", sched_pooled),
                         ("pooled2", sched_pooled2)):
            t0 = time.perf_counter()
            lab = fn(xt)
            lab_np = np.asarray(lab).reshape(h, w)
            tload[name] += time.perf_counter() - t0
            pris[name].append(pri_np(lab_np, gt_list))
    for name in ("full", "pooled", "pooled2"):
        print(
            f"{name}: mean PRI {np.mean(pris[name]):.4f} "
            f"(total wall {tload[name]:.1f} s incl compile)",
            flush=True,
        )


if __name__ == "__main__":
    main()
