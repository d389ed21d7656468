"""Small-table lookup as a Pallas kernel (TPU) — XLA's dynamic gather of a
few-hundred-entry table costs ~9 ms for a batch of label maps (measured:
``regions[superpixel_labels]`` in the n-cut stage); a one-hot matmul against
the VMEM-resident table does the same in ~1 ms.

    out[b, n] = table[b, idx[b, n]]

Used by models/graph.py to broadcast per-superpixel region ids back to
pixels. Falls back to the plain gather off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 16384  # lanes per grid step (128-multiple)


def _lookup_kernel(idx_ref, table_ref, out_ref, *, s_pad: int):
    idx = idx_ref[0].reshape(1, -1)  # (1, block) int32
    table = table_ref[0]  # (1, s_pad) f32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (s_pad, idx.shape[1]), 0) == idx
    ).astype(jnp.bfloat16)  # (s_pad, block), exact 0/1
    # (1, s_pad) @ (s_pad, block): table values are small non-negative ints,
    # exactly representable in bf16/f32 — the product is an exact select
    vals = jax.lax.dot_general(
        table.astype(jnp.bfloat16), onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, block)
    out_ref[0, 0] = vals.astype(jnp.int32).reshape(8, -1)


@jax.jit
def _lookup_tpu(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    b, n = idx.shape
    s = table.shape[1]
    s_pad = max(128, -(-s // 128) * 128)
    n_pad = -(-n // _BLOCK) * _BLOCK
    nb = n_pad // _BLOCK
    idx_p = (
        jnp.zeros((b, n_pad), jnp.int32)
        .at[:, :n]
        .set(idx)
        .reshape(b, nb, 8, _BLOCK // 8)
    )
    table_p = jnp.zeros((b, 1, s_pad), jnp.float32).at[:, 0, :s].set(
        table.astype(jnp.float32)
    )
    kernel = functools.partial(_lookup_kernel, s_pad=s_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 8, _BLOCK // 8), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, _BLOCK // 8),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, 8, _BLOCK // 8), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(idx_p, table_p)
    return out.reshape(b, n_pad)[:, :n]


def table_lookup(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """(B, N) int32 indices + (B, S) small-non-negative-int table -> (B, N).

    Requires table values exactly representable in bf16 (fine for region
    ids). Plain gather off-TPU."""
    if jax.default_backend() == "tpu":
        return _lookup_tpu(idx, table)
    return jax.vmap(lambda i, t: t[i])(idx, table).astype(jnp.int32)


def table_lookup_int(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Exact lookup for int32 table values up to 2^24: splits the table into
    256-sized digits (each bf16-exact) and recombines — two kernel matvecs.

    Used where the table holds pixel-index-scale values (e.g. per-label root
    component ids in the SLIC connectivity pass), which overflow bf16's
    integer range."""
    if jax.default_backend() != "tpu":
        return jax.vmap(lambda i, t: t[i])(idx, table).astype(jnp.int32)
    hi = _lookup_tpu(idx, table // 65536)
    mid = _lookup_tpu(idx, (table // 256) % 256)
    lo = _lookup_tpu(idx, table % 256)
    return hi * 65536 + mid * 256 + lo
