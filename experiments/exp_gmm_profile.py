"""GMM EM inner-op profile on TPU (config2 shapes: batch 8, N=154401, D=39).

Times per-component-loop covariance vs stacked-matmul covariance, tri-solve
E-step vs precision-Cholesky-matmul E-step, over a full 30-iteration fit.
Each timing loops the op ITERS times inside one jit (fori_loop + checksum)
to amortize the ~31 ms fence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_profile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N, D, K = 8, 154401, 39, 5
LOOP = 10


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3 - 31.0) / LOOP
    print(f"{name:40s} {best*1e3:7.1f} ms total -> ~{per:5.2f} ms/op real",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk():
        x = jax.random.normal(key, (B, N, D), jnp.float32)
        resp = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(1), (B, N, K)), axis=-1
        )
        return x, resp

    x, resp = mk()
    fence(x)

    from gabor_color_image_segmentation_tpu.models.gmm import (
        GMMParams,
        _e_step,
        _m_step,
    )

    @jax.jit
    def params_of(x, resp):
        return jax.vmap(lambda a, r: _m_step(a, r, 1e-4))(x, resp)

    params = params_of(x, resp)
    fence(params.means)

    def loop(fn):
        @jax.jit
        def run(x, resp, params):
            def body(i, acc):
                out = fn(x, resp, params, i)
                return acc + out
            return lax.fori_loop(0, LOOP, body, jnp.float32(0))
        return run

    # a. current per-component covariance loop (inside _m_step)
    timeit("a. m-step (current, cov loop)", loop(
        lambda x, resp, params, i: jnp.sum(
            jax.vmap(lambda a, r: _m_step(a, r + i * 1e-9, 1e-4).covs)(x, resp)
        )
    ), x, resp, params)

    # b. stacked covariance: one (D, N) @ (N, K*D) matmul per image
    def m_step_stacked(a, r, reg):
        nk = jnp.sum(r, axis=0) + 1e-6
        means = jnp.dot(r.T, a, preferred_element_type=jnp.float32) / nk[:, None]
        rx = (r[:, :, None] * a[:, None, :]).reshape(N, K * D)  # (N, K*D)
        exx = jnp.dot(a.T, rx, preferred_element_type=jnp.float32)  # (D, K*D)
        exx = exx.reshape(D, K, D).transpose(1, 0, 2) / nk[:, None, None]
        covs = exx - means[:, :, None] * means[:, None, :]
        covs = covs + reg * jnp.eye(D)
        return covs

    timeit("b. m-step (stacked cov matmul)", loop(
        lambda x, resp, params, i: jnp.sum(
            jax.vmap(lambda a, r: m_step_stacked(a, r + i * 1e-9, 1e-4))(x, resp)
        )
    ), x, resp, params)

    # c. current E-step (tri-solve against (D, N))
    timeit("c. e-step (tri-solve)", loop(
        lambda x, resp, params, i: jnp.sum(
            jax.vmap(lambda a, p: _e_step(a + i * 1e-9, p)[0])(x, params)
        )
    ), x, resp, params)

    # d. E-step via precision Cholesky: y = x @ prec_chol (matmul, k folded)
    def e_step_prec(a, p):
        def pc(cov):
            chol = jnp.linalg.cholesky(cov)
            inv = jax.scipy.linalg.solve_triangular(
                chol, jnp.eye(D), lower=True
            )
            return inv.T, -jnp.sum(jnp.log(jnp.diagonal(chol)))

        prec, neg_logdet = jax.vmap(pc)(p.covs)  # (K, D, D)
        pc_flat = prec.transpose(1, 0, 2).reshape(D, K * D)
        y = jnp.dot(a, pc_flat, preferred_element_type=jnp.float32).reshape(
            N, K, D
        )
        mu_y = jnp.einsum("kd,kde->ke", p.means, prec)
        diff = y - mu_y[None]
        maha = jnp.sum(diff * diff, axis=2)
        lp = -0.5 * (D * 1.8378770664093453 + maha) + neg_logdet[None]
        w = lp + jnp.log(p.weights)
        return w - jax.scipy.special.logsumexp(w, axis=1, keepdims=True)

    timeit("d. e-step (prec-chol matmul)", loop(
        lambda x, resp, params, i: jnp.sum(
            jax.vmap(lambda a, p: e_step_prec(a + i * 1e-9, p))(x, params)
        )
    ), x, resp, params)

    # parity d vs c
    lc = jax.vmap(lambda a, p: _e_step(a, p)[0])(x, params)
    ld = jax.vmap(e_step_prec)(x, params)
    print("e-step parity max|diff|:", float(jnp.max(jnp.abs(lc - ld))), flush=True)


if __name__ == "__main__":
    main()
