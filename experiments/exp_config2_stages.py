"""config2 (GMM) stage split at HEAD — where do the ~20 ms/batch-8 go?
(VERDICT r3 next-round task 7: split the remaining budget, then cut it.)

Production chain (models/pipeline.py::_segment_batch_transposed, gmm):
    fused features (channel-major)  ->  xt assembly + pooled fit_xp
    -> kmeans init (10 it, pooled)  ->  EM tol-loop on the 4x4 grid
    -> 1 full-res refine pass       ->  full-res label-only pass
with per-iteration O(k D^3) XLA glue (Cholesky + triangular solve +
moments->params) between EM passes.

This probe times each stage standalone at config2 geometry (B=8, 321x481,
D=39, k=5) plus the e2e, and counts the EM iterations the tol rule
actually runs. The suspected sink is the GLUE: the tol while_loop body
issues a (40, 39, 39) Cholesky + solve_triangular + dozens of small XLA
ops per iteration — if glue * n_iters rivals the pooled EM passes, the
lever is fusing/cheapening the glue, not the passes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_config2_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.benchmark import build_batch
from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.models.pipeline import (
    _color_transform,
    segment_batch,
)
from gabor_color_image_segmentation_tpu.ops.bank import make_bank

LOOP = 20
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=3, loop=LOOP):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / loop
    print(f"{name:44s} {ms:8.3f} ms/op", flush=True)
    return ms


def loop_jit(fn, loop=LOOP):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, loop, body, jnp.float32(0))
    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = preset("config2").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    batch = jnp.asarray(build_batch(cfg, cfg.batch_size))
    fence(batch.astype(jnp.float32))
    b, h, w, _ = batch.shape
    n = h * w
    k, d = cfg.cluster.k, bank.n_kernels * 3 + 3
    dtype = jnp.bfloat16

    from gabor_color_image_segmentation_tpu.models.gmm import gmm_fit_levels
    from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
        _em_pass,
        _init_moments,
        _moments_to_params,
        _params_to_kernel_inputs,
    )
    from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
        _affine_params,
        build_color4,
    )
    from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
        _block_for_t,
        kmeans_fused_t_xt,
        xt_geometry,
    )
    from gabor_color_image_segmentation_tpu.ops.features import (
        _pool2x2_cm,
        assemble_features_t,
        assemble_xp_from_affine,
    )
    from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
        gabor_energies_fused,
    )

    # ---- e2e + features + assembly --------------------------------------
    timeit("e2e segment_batch", loop_jit(
        lambda i, r: jnp.sum(
            segment_batch(r + i.astype(r.dtype), cfg, bank, False)[0]
        )
    ), batch)

    @jax.jit
    def feats_cm(r):
        color = _color_transform(r, cfg.color_space)
        return color, gabor_energies_fused(color, bank, dtype,
                                           channel_major=True)

    timeit("features (fused, channel-major)", loop_jit(
        lambda i, r: jnp.sum(
            feats_cm(r + i.astype(r.dtype))[1].astype(jnp.float32)
        )
    ), batch)

    color, energies_cm = feats_cm(batch)
    fence(color)
    fence(energies_cm)
    dp, n_pad, _ = xt_geometry(n, d, dtype)
    hp, wp, lv = gmm_fit_levels(h, w, cfg.cluster.gmm_fit_pool)
    m = hp * wp

    @jax.jit
    def assemble(energies_cm, color):
        xt = assemble_features_t(energies_cm, color, cfg.cluster, dp, n_pad)
        xc4 = build_color4(color, dtype)
        aff = _affine_params(energies_cm, xc4, cfg.cluster, 1e-6)
        pe_l, pc_l = energies_cm, xc4
        for _ in range(lv):
            pe_l, pc_l = _pool2x2_cm(pe_l), _pool2x2_cm(pc_l)
        _, mp_pad, _ = xt_geometry(m, d, dtype)
        fit_xp = assemble_xp_from_affine(pe_l, pc_l, aff[0], aff[1], dp,
                                         mp_pad, dtype)
        return xt, fit_xp

    timeit("assembly (xt + pooled fit_xp)", loop_jit(
        lambda i, e, c: jnp.sum(
            assemble(e, c + i.astype(c.dtype))[0].astype(jnp.float32)
        )
    ), energies_cm, color)

    xt, fit_xp = assemble(energies_cm, color)
    fence(xt)
    fence(fit_xp)
    block = _block_for_t(n, dp, 2)
    block_f = _block_for_t(m, dp, 2)

    # ---- solver sub-stages ----------------------------------------------
    timeit("kmeans init on pooled buffer (10 it)", loop_jit(
        lambda i, xp: jnp.sum(
            kmeans_fused_t_xt(xp + (i % 2).astype(xp.dtype) * 0, k, d, m,
                              10)[1]
        )
    ), fit_xp)

    init_labels, _ = jax.jit(
        lambda xp: kmeans_fused_t_xt(xp, k, d, m, 10)
    )(fit_xp)
    lab_pad = jnp.zeros((b, fit_xp.shape[2]), jnp.int32).at[:, :m].set(
        init_labels
    ).at[:, m:].set(-1)
    msums0, covs0 = jax.jit(
        lambda xp, l: _init_moments(xp, l, k, d)
    )(fit_xp, lab_pad)
    params0 = jax.jit(
        lambda ms, cv: _moments_to_params(ms, cv, d, m, k,
                                          cfg.cluster.gmm_reg_covar)
    )(msums0, covs0)
    fence(params0)

    # glue alone: moments -> params -> kernel inputs round trip
    def glue(i, ms, cv):
        p = _moments_to_params(ms + i * 0.0, cv, d, m, k,
                               cfg.cluster.gmm_reg_covar)
        a, bias, const = _params_to_kernel_inputs(*p, d, dp, k)
        return jnp.sum(a) + jnp.sum(bias) + jnp.sum(const)

    timeit("glue (moments->params->chol->inputs)", loop_jit(glue),
           msums0, covs0)

    # one pooled EM pass (kernel only, fixed inputs)
    a0, bias0, const0 = jax.jit(
        lambda p: _params_to_kernel_inputs(*p, d, dp, k)
    )(params0)
    fence(a0)

    timeit("pooled EM pass (kernel, 1/16 data)", loop_jit(
        lambda i, xp, a, bs, cn: jnp.sum(
            _em_pass(xp, a + i * 0.0, bs, cn, k, block_f, m, False, d)[2]
        )
    ), fit_xp, a0, bias0, const0)

    timeit("full-res EM pass (kernel, moments)", loop_jit(
        lambda i, x, a, bs, cn: jnp.sum(
            _em_pass(x, a + i * 0.0, bs, cn, k, block, n, False, d)[2]
        )
    ), xt, a0, bias0, const0)

    timeit("full-res label-only pass", loop_jit(
        lambda i, x, a, bs, cn: jnp.sum(
            _em_pass(x, a + i * 0.0, bs, cn, k, block, n, False, d,
                     moments=False)[0]
        )
    ), xt, a0, bias0, const0)

    # ---- how many EM iterations does the tol loop actually run? ---------
    @jax.jit
    def em_ll_trace(xp, p0):
        def body(carry, _):
            params = carry
            a, bias, const = _params_to_kernel_inputs(*params, d, dp, k)
            _, ll, ms, cv = _em_pass(xp, a, bias, const, k, block_f, m,
                                     False, d)
            new = _moments_to_params(ms, cv, d, m, k,
                                     cfg.cluster.gmm_reg_covar)
            return new, ll / m
        _, lls = lax.scan(body, p0, None, length=cfg.cluster.n_iter)
        return lls  # (n_iter, B)

    lls = np.asarray(em_ll_trace(fit_xp, params0))
    deltas = np.abs(np.diff(lls, axis=0))
    iters_run = 1 + (deltas >= cfg.cluster.gmm_tol).cumprod(0).sum(0)
    print(f"tol-loop iterations per image (cap {cfg.cluster.n_iter}): "
          f"{iters_run.tolist()}", flush=True)
    print(f"mean {iters_run.mean():.1f}, max {iters_run.max()}", flush=True)


if __name__ == "__main__":
    main()
