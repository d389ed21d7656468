"""config2 glue cost, measured with NON-FOLDABLE salts (exp_config2_stages'
`x + i*0.0` salts constant-folded — XLA hoisted the whole probed stage out
of the timing loop, which is why its stage rows summed to ~7 of 19.3 ms).

Times, at config2 geometry (B=8, k=5, D=39, pooled m=9600):
  - jnp.linalg.cholesky on (B, k, D, D)
  - solve_triangular(chol, I) on the same
  - the full glue (moments -> params -> chol -> kernel inputs)
  - one pooled fused EM pass (kernel only)
  - kmeans init (10 it) on the pooled buffer
Salt: covs * (1 + i * 1e-12) — changes the value stream, not the math.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_gmm_glue.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from gabor_color_image_segmentation_tpu.utils.jit_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from gabor_color_image_segmentation_tpu.models.gmm_pallas import (
    _em_pass,
    _moments_to_params,
    _params_to_kernel_inputs,
)
from gabor_color_image_segmentation_tpu.models.kmeans_pallas import (
    _block_for_t,
    kmeans_fused_t_xt,
)

B, K, D, DP = 8, 5, 39, 48
M = 9600  # pooled 80x120
LOOP = 50
FENCE_MS = 31.0


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - FENCE_MS) / LOOP
    print(f"{name:44s} {ms:8.3f} ms/op", flush=True)
    return ms


def loop_jit(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (B, K, D, D), jnp.float32)
    covs = jnp.einsum("bkij,bklj->bkil", a, a) + 10.0 * jnp.eye(D)
    fence(covs)
    covs_dp = jnp.zeros((B, K, DP, DP)).at[:, :, :D, :D].set(covs)
    msums = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, 8, DP)))
    msums = msums.at[:, :K, D].set(1000.0)
    fence(msums)

    def salt(x, i):
        return x * (1.0 + i.astype(jnp.float32) * 1e-12)

    timeit("cholesky (B,k,39,39)", loop_jit(
        lambda i, c: jnp.sum(jnp.linalg.cholesky(salt(c, i)))
    ), covs)

    def chol_solve(i, c):
        ch = jnp.linalg.cholesky(salt(c, i))
        eye = jnp.broadcast_to(jnp.eye(D), (B, K, D, D))
        pt = jax.scipy.linalg.solve_triangular(ch, eye, lower=True)
        return jnp.sum(pt)

    timeit("cholesky + tri-solve", loop_jit(chol_solve), covs)

    def glue(i, ms, cv):
        p = _moments_to_params(salt(ms, i), cv, D, M, K, 1e-4)
        aa, bias, const = _params_to_kernel_inputs(*p, D, DP, K)
        return jnp.sum(aa) + jnp.sum(bias) + jnp.sum(const)

    timeit("full glue (moments->inputs)", loop_jit(glue), msums, covs_dp)

    # pooled EM pass with a salted xt (prevents hoisting)
    dtype = jnp.bfloat16
    block = _block_for_t(M, DP, 2)
    m_pad = -(-M // block) * block
    xt = jnp.zeros((B, DP, m_pad), dtype)
    xt = xt.at[:, :D, :M].set(
        jax.random.normal(jax.random.PRNGKey(2), (B, D, M), jnp.float32)
        .astype(dtype)
    )
    xt = xt.at[:, D, :M].set(1.0)
    fence(xt)
    p0 = _moments_to_params(msums, covs_dp, D, M, K, 1e-4)
    a0, b0, c0 = jax.jit(
        lambda p: _params_to_kernel_inputs(*p, D, DP, K)
    )(p0)
    fence(a0)

    timeit("pooled EM pass (salted xt)", loop_jit(
        lambda i, x, aa, bb, cc: jnp.sum(
            _em_pass(x + i.astype(x.dtype) * jnp.bfloat16(1e-8),
                     aa, bb, cc, K, block, M, False, D)[2]
        )
    ), xt, a0, b0, c0)

    timeit("kmeans init 10it (salted xp)", loop_jit(
        lambda i, x: jnp.sum(
            kmeans_fused_t_xt(
                x + i.astype(x.dtype) * jnp.bfloat16(1e-8), K, D, M, 10
            )[1]
        )
    ), xt)


if __name__ == "__main__":
    main()
