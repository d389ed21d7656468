"""Profile the k-means Lloyd loop stage-by-stage on the real TPU.

Hypothesis to test (BASELINE.md says kmeans bf16 = 113 ms/batch-16 with an
"HBM floor ~73 ms"): both Lloyd matmuls pad k=5 to 128 MXU lanes, so the
loop may be MXU-bound (padded-lane FLOPs), HBM-bound, or jointly bound.
Measures, each fenced by a scalar checksum readback (block_until_ready does
not block on this tunneled platform — CLAUDE.md):

  a. full kmeans (current production path)
  b. assignment-only loop  (argmin matmul, no update)
  c. update-only loop      (one-hot matmul, fixed labels)
  d. update via masked VPU-style sums (jnp.where per cluster, no matmul)
  e. maximin init alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_kmeans_profile.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

B, N, D, K, ITERS = 16, 154401, 243, 5, 25
DTYPE = jnp.bfloat16


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1e3:8.1f} ms")
    return best


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_x():
        return jax.random.normal(key, (B, N, D), jnp.float32).astype(DTYPE)

    x = make_x()
    fence(x)

    from gabor_color_image_segmentation_tpu.models.kmeans import (
        _assign_scores,
        kmeans,
        maximin_init,
    )

    # a. full kmeans (vmapped over batch)
    @jax.jit
    def full(x):
        return jax.vmap(lambda f: kmeans(f, K, ITERS, DTYPE)[0])(x)

    timeit("a. full kmeans", full, x)

    # e. maximin init alone
    @jax.jit
    def init_only(x):
        return jax.vmap(lambda f: maximin_init(f, K))(x)

    timeit("e. maximin init", init_only, x)

    # b. assignment-only loop: 25 argmin matmuls, no center update
    @jax.jit
    def assign_only(x):
        def per_image(f):
            c0 = f[:K].astype(jnp.float32)

            def body(i, carry):
                acc, c = carry
                labels = jnp.argmin(_assign_scores(f, c, DTYPE), axis=1)
                # fold labels back into centers so the loop isn't DCE'd
                c = c + (jnp.sum(labels) % 2).astype(c.dtype) * 1e-6
                return acc + jnp.sum(labels), c

            acc, _ = lax.fori_loop(0, ITERS, body, (jnp.int32(0), c0))
            return acc

        return jax.vmap(per_image)(x)

    timeit("b. assignment-only loop", assign_only, x)

    # c. update-only loop: 25 one-hot matmuls with fixed labels
    @jax.jit
    def update_only(x):
        def per_image(f):
            labels = (jnp.arange(N) % K).astype(jnp.int32)

            def body(i, acc):
                onehot = jax.nn.one_hot(labels + (i % 2), K, dtype=DTYPE)
                sums = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
                return acc + jnp.sum(sums)

            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        return jax.vmap(per_image)(x)

    timeit("c. update-only (onehot mm)", update_only, x)

    # d. update-only via masked sums (VPU-shaped, no matmul)
    @jax.jit
    def update_masked(x):
        def per_image(f):
            labels = (jnp.arange(N) % K).astype(jnp.int32)

            def body(i, acc):
                lab = labels + (i % 2)
                sums = jnp.stack(
                    [
                        jnp.sum(
                            jnp.where((lab == c)[:, None], f, 0).astype(jnp.float32),
                            axis=0,
                        )
                        for c in range(K)
                    ]
                )
                return acc + jnp.sum(sums)

            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        return jax.vmap(per_image)(x)

    timeit("d. update-only (masked VPU)", update_masked, x)

    # f. single fused-read reference: one pass reading x once per iter,
    #    assignment matmul + masked-sum update in the same iteration body
    @jax.jit
    def fused_xla(x):
        def per_image(f):
            c0 = f[:K].astype(jnp.float32)

            def body(i, c):
                scores = _assign_scores(f, c, DTYPE)
                labels = jnp.argmin(scores, axis=1)
                sums = jnp.stack(
                    [
                        jnp.sum(
                            jnp.where((labels == j)[:, None], f, 0).astype(
                                jnp.float32
                            ),
                            axis=0,
                        )
                        for j in range(K)
                    ]
                )
                counts = jnp.stack(
                    [jnp.sum(labels == j).astype(jnp.float32) for j in range(K)]
                )
                new = sums / jnp.maximum(counts, 1.0)[:, None]
                return jnp.where(counts[:, None] > 0, new, c)

            c = lax.fori_loop(0, ITERS, body, c0)
            return jnp.argmin(_assign_scores(f, c, DTYPE), axis=1)

        return jax.vmap(per_image)(x)

    timeit("f. fused XLA (mm + masked)", fused_xla, x)


if __name__ == "__main__":
    main()
