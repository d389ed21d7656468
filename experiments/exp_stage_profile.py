"""Stage-level profile of config2 (GMM) and config3 (graph) on the real TPU.

Measures, each fenced by a scalar checksum readback:
  config2: features / kmeans-init / one E-step / one M-step / full gmm_fit,
           plus an E-step variant using precision-Cholesky matmuls
           (sklearn's own formulation) instead of big triangular solves.
  config3: slic / superpixel means / affinity / eigh / subspace eigensolver
           / full graph stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_stage_profile.py
"""

import time

import jax
import jax.numpy as jnp

from gabor_color_image_segmentation_tpu.config import preset


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best*1e3:8.1f} ms", flush=True)
    return best


def features_for(cfg, batch_size):
    from gabor_color_image_segmentation_tpu.models.pipeline import compute_features
    from gabor_color_image_segmentation_tpu.ops.bank import make_bank

    bank = make_bank(cfg.bank)
    key = jax.random.PRNGKey(0)
    h, w = cfg.image_hw

    @jax.jit
    def mk():
        rgb = jax.random.uniform(key, (batch_size, h, w, 3), jnp.float32)
        return compute_features(rgb, cfg, bank), rgb

    feats, rgb = mk()
    fence(feats)
    return feats, rgb, bank


def main():
    # ---------------- config2: GMM ----------------
    cfg2 = preset("config2").replace(dtype="bfloat16")
    b = cfg2.batch_size
    feats, _, _ = features_for(cfg2, b)
    bb, h, w, d = feats.shape
    flat = feats.reshape(bb, h * w, d).astype(jnp.float32)
    print(f"config2 features: {feats.shape} D={d}", flush=True)

    from gabor_color_image_segmentation_tpu.models import gmm as G
    from gabor_color_image_segmentation_tpu.models.kmeans import kmeans

    K, N_ITER = cfg2.cluster.k, cfg2.cluster.n_iter

    @jax.jit
    def init_params(flat):
        def per(x):
            lbl, _ = kmeans(x, K, 10)
            resp0 = jax.nn.one_hot(lbl, K, dtype=jnp.float32)
            return G._m_step(x, resp0, 1e-4)

        return jax.vmap(per)(flat)

    params = init_params(flat)
    fence(params.means)
    timeit("c2 kmeans init (10 it) + m-step", init_params, flat)

    @jax.jit
    def e_step(flat, params):
        return jax.vmap(G._e_step)(flat, params)[0]

    timeit("c2 one E-step (tri-solve)", e_step, flat, params)

    # E-step via precision-Cholesky matmul (sklearn _compute_precision_cholesky)
    @jax.jit
    def e_step_prec(flat, params):
        def per(x, p):
            n, d_ = x.shape

            def pc(cov):
                chol = jnp.linalg.cholesky(cov)
                return (
                    jax.scipy.linalg.solve_triangular(
                        chol, jnp.eye(d_), lower=True
                    ).T,
                    -jnp.sum(jnp.log(jnp.diagonal(chol))),
                )

            prec_chol, neg_logdet = jax.vmap(pc)(p.covs)  # (k,D,D), (k,)
            # y_j = (x - mu_j) @ prec_chol_j ; fold k into one matmul
            pc_flat = jnp.concatenate(
                [prec_chol[j] for j in range(K)], axis=1
            )  # (D, k*D)
            y = jnp.dot(x, pc_flat, preferred_element_type=jnp.float32).reshape(
                n, K, d_
            )
            mu_y = jnp.einsum("kd,kde->ke", p.means, prec_chol)  # (k, D)
            diff = y - mu_y[None]
            maha = jnp.sum(diff * diff, axis=2)  # (N, k)
            lp = -0.5 * (d_ * G._LOG2PI + maha) + neg_logdet[None]
            w_lp = lp + jnp.log(p.weights)
            norm = jax.scipy.special.logsumexp(w_lp, axis=1, keepdims=True)
            return w_lp - norm

        return jax.vmap(per)(flat, params)

    timeit("c2 one E-step (prec-chol mm)", e_step_prec, flat, params)

    # parity of the two E-step forms
    a = e_step(flat, params)
    bb_ = e_step_prec(flat, params)
    err = float(jnp.max(jnp.abs(a - bb_)))
    print(f"c2 E-step forms max abs diff: {err:.2e}", flush=True)

    @jax.jit
    def m_step(flat, resp):
        return jax.vmap(lambda x, r: G._m_step(x, r, 1e-4))(flat, resp)

    resp = jnp.exp(a)
    fence(resp)
    timeit("c2 one M-step", m_step, flat, resp)

    @jax.jit
    def full_fit(flat):
        return jax.vmap(lambda x: G.gmm_fit(x, K, N_ITER)[0])(flat)

    timeit(f"c2 full gmm_fit ({N_ITER} it)", full_fit, flat, reps=2)

    # ---------------- config3: graph ----------------
    cfg3 = preset("config3").replace(dtype="bfloat16")
    feats3, rgb3, _ = features_for(cfg3, cfg3.batch_size)
    b3, h3, w3, d3 = feats3.shape
    print(f"config3 features: {feats3.shape}", flush=True)

    from gabor_color_image_segmentation_tpu.models.graph import (
        affinity_matrix,
        smallest_eigvecs_subspace,
        spectral_labels,
        superpixel_means,
    )
    from gabor_color_image_segmentation_tpu.models.slic import grid_shape, slic
    from gabor_color_image_segmentation_tpu.ops.color import rgb_to_lab

    g = cfg3.graph
    lab3 = jax.jit(rgb_to_lab)(jax.random.uniform(jax.random.PRNGKey(1), (b3, h3, w3, 3)))
    fence(lab3)

    @jax.jit
    def run_slic(lab):
        return jax.vmap(lambda l: slic(l, g.n_superpixels, g.slic_compactness, g.slic_iters))(lab)

    sp = run_slic(lab3)
    fence(sp.astype(jnp.float32))
    timeit("c3 slic (10 it)", run_slic, lab3)

    gh, gw, _ = grid_shape(h3, w3, g.n_superpixels)
    n_sp = gh * gw
    print(f"c3 n_sp = {n_sp}", flush=True)

    @jax.jit
    def means_aff(feats, sp):
        def per(f, s):
            fm, cnts = superpixel_means(f.reshape(-1, d3), s.reshape(-1), n_sp)
            return affinity_matrix(fm, g.affinity_sigma, cnts)

        return jax.vmap(per)(feats, sp)

    aff = means_aff(feats3, sp)
    fence(aff)
    timeit("c3 superpixel means + affinity", means_aff, feats3, sp)

    @jax.jit
    def eig_eigh(aff):
        def per(wm):
            deg = jnp.sum(wm, axis=1)
            dis = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
            l_sym = jnp.eye(n_sp) - dis[:, None] * wm * dis[None, :]
            _, evecs = jnp.linalg.eigh(l_sym)
            return evecs[:, : g.n_regions]

        return jax.vmap(per)(aff)

    timeit("c3 eigh embedding", eig_eigh, aff)

    @jax.jit
    def eig_sub(aff):
        def per(wm):
            deg = jnp.sum(wm, axis=1)
            dis = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
            l_sym = jnp.eye(n_sp) - dis[:, None] * wm * dis[None, :]
            return smallest_eigvecs_subspace(l_sym, g.n_regions)

        return jax.vmap(per)(aff)

    timeit("c3 subspace embedding (80 it)", eig_sub, aff)

    @jax.jit
    def spec_eigh(aff):
        return jax.vmap(lambda wm: spectral_labels(wm, g.n_regions, eig_method="eigh"))(aff)

    @jax.jit
    def spec_sub(aff):
        return jax.vmap(lambda wm: spectral_labels(wm, g.n_regions, eig_method="subspace"))(aff)

    le = spec_eigh(aff)
    ls = spec_sub(aff)
    fence(le.astype(jnp.float32))
    fence(ls.astype(jnp.float32))
    timeit("c3 spectral_labels eigh", spec_eigh, aff)
    timeit("c3 spectral_labels subspace", spec_sub, aff)

    # label agreement between the two eigensolvers (ARI per image, host)
    import numpy as np
    from sklearn.metrics import adjusted_rand_score

    le_np, ls_np = np.asarray(le), np.asarray(ls)
    aris = [adjusted_rand_score(le_np[i], ls_np[i]) for i in range(b3)]
    print(f"c3 eigh-vs-subspace label ARI per image: {np.round(aris, 4)}", flush=True)


if __name__ == "__main__":
    main()
