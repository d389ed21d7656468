"""SLIC connectivity enforcement as ONE whole-image Pallas VMEM kernel.

``enforce_connectivity_device`` (models/slic.py) is semantically right but
XLA-hostile on fragmented inputs: real SLIC label maps at config3 scale
carry 10k-25k connected components per image (measured, synthetic eval), so
its three fixpoint loops round-trip every (B, H, W) intermediate through
HBM ~100x and its component-size histogram is a 1.2M-update scatter-add
(TPU scatters lower to sort-based loops). Measured cost: 22.2 ms/batch-8 —
it alone regressed config3 from 51.9 to 26.3 MP/s.

This kernel runs the whole pass per image inside VMEM (a 481x321 int32
image is ~620 KB; every fixpoint step is VPU work on resident data):

1. Connected components: alternating H/V run-min prefix-doubling sweeps to
   a fixed point — the same algorithm and id convention as the XLA pass
   (component id = min flat index), bit-identical results.
2. Component-size test WITHOUT a histogram: a capped BFS subtree count.
   dist = BFS depth from each root inside its component (Jacobi steps to
   a fixpoint, capped at ``min_size``); parent = first neighbor (up,
   left, right, down) one step closer; v = Jacobi subtree sums saturated
   at ``min_size`` (again fixpoint-capped at ``min_size`` steps), so
   v[root] = min(#pixels within tree depth <= min_size, min_size). For a
   4-connected
   component, (v[root] >= min_size) == (true size >= min_size): if the
   true size is >= min_size, BFS layers 0..min_size-1 alone hold >=
   min_size pixels; if smaller, every pixel sits at depth < size <=
   min_size and is counted exactly. So the survivor set matches the XLA
   pass's counts-based rule exactly (for min_size <= its cap), with zero
   scatter.
3. Raster renumbering of survivors: in-VMEM prefix sums (W then H).
4. Seed propagation through components: run-max sweeps to a fixed point
   (same as XLA).
5. Small-fragment adoption: the identical Jacobi update (first kept
   neighbor in up, left, right, down priority), to a fixed point.

Only steps 2-3 differ *internally* from the XLA pass; their outputs
(survivor set, new ids) are equal, so the kernel's labels match
``enforce_connectivity_device`` bit-for-bit — pinned by
tests/test_slic.py. Used by models/graph.py on TPU; the XLA pass remains
the CPU/parity route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # plain int: jnp constants created at module scope would be
# closure-captured by the kernel, which pallas_call rejects

# adoption/parent priority: up, left, right, down (cv2-shaped, matches
# models/slic.py::enforce_connectivity_device)
_PRIO = ((-1, 0), (0, -1), (0, 1), (1, 0))

# Jacobi steps chained per while_loop iteration in the BFS/adoption
# fixpoint loops. Each loop iteration costs a scalar-core sync + an any()
# convergence reduce; the updates are monotone and idempotent at the
# fixpoint, so chaining over-steps by at most UNROLL-1 no-op applications
# while dividing the sync count — outputs are bit-identical (pinned by
# tests/test_slic.py). Module global so the sweep experiment can retune.
# Depth sweep (exp_conn_unroll.py, TPU 2026-08-20): STANDALONE the kernel
# reads 8 -> 20.35, 16 -> 17.47, 32 -> 25.90 ms/op batch-8 (bit-equal),
# but at the official e2e methodology unroll=16 measured NEUTRAL
# (config3 63.26 vs 63.85 MP/s — inside tunnel jitter), so 8 stays: the
# standalone salted-loop harness over-weights the sync overhead the
# chaining removes. Same lesson as the w3 SLIC plan: only loop-amortized
# e2e numbers decide kernel defaults.
_BFS_UNROLL = 8


def _shift2(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """out[y, x] = in[y + dy, x + dx]; ``fill`` outside (static dy/dx).

    Same convention as models/slic.py::_shift2d, built from concatenates
    (Mosaic-friendly; no pad/dynamic-slice).
    """
    h, w = x.shape
    if dy:
        f = jnp.full((abs(dy), w), fill, x.dtype)
        x = (
            jnp.concatenate([x[dy:], f], axis=0)
            if dy > 0
            else jnp.concatenate([f, x[:dy]], axis=0)
        )
    if dx:
        f = jnp.full((h, abs(dx)), fill, x.dtype)
        x = (
            jnp.concatenate([x[:, dx:], f], axis=1)
            if dx > 0
            else jnp.concatenate([f, x[:, :dx]], axis=1)
        )
    return x


def _shift1(x: jnp.ndarray, k: int, axis: int, fill) -> jnp.ndarray:
    """out[i] = in[i - k] along ``axis`` (models/slic.py::_shift1d)."""
    return _shift2(x, -k if axis == 0 else 0, -k if axis == 1 else 0, fill)


def _ok_chains(keys: jnp.ndarray) -> dict:
    """Per (axis, direction): the run-membership mask sequence of the
    prefix-doubling sweep. ok_0 = same-key-neighbor; ok_{j+1} = ok_j &
    shift(ok_j, d*2^j). These depend only on ``keys`` — both fixpoint
    loops below (CC and seed propagation) sweep with FIXED keys, so the
    whole chain is loop-invariant and computed once (it was ~2/5 of every
    sweep step). int32 masks for Mosaic shifts."""
    chains = {}
    for axis in (1, 0):
        n = keys.shape[axis]
        for direction in (1, -1):
            same = (
                _shift1(keys, direction, axis, -1) == keys
            ).astype(jnp.int32)
            chain = []
            ok, k = same, 1
            while k < n:
                chain.append(ok)
                ok = ok * _shift1(ok, direction * k, axis, 0)
                k *= 2
            chains[(axis, direction)] = chain
    return chains


def _run_extreme(
    vals: jnp.ndarray, chains: dict, axis: int, mode: str
) -> jnp.ndarray:
    """Min/max of ``vals`` over maximal equal-keys runs along ``axis``
    (prefix doubling; the models/slic.py::_run_extreme algorithm verbatim,
    with the key-derived masks supplied precomputed by ``_ok_chains``)."""
    n = vals.shape[axis]
    if mode == "min":
        fill, combine = _BIG, jnp.minimum
    else:
        fill, combine = -_BIG, jnp.maximum
    out = vals
    for direction in (1, -1):
        v = vals
        k = 1
        for ok in chains[(axis, direction)]:
            sv = _shift1(v, direction * k, axis, fill)
            v = jnp.where(ok != 0, combine(v, sv), v)
            k *= 2
        assert k >= n
        out = combine(out, v)
    return out


def _pass_extreme(vals, chains, mode):
    v = _run_extreme(vals, chains, axis=1, mode=mode)
    return _run_extreme(v, chains, axis=0, mode=mode)


def _prefix_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix sum along ``axis`` by shift doubling."""
    n = x.shape[axis]
    k = 1
    while k < n:
        x = x + _shift1(x, k, axis, 0)
        k *= 2
    return x


def _enforce_kernel(
    lab_ref, out_ref, *, h: int, w: int, min_size: int, s_max: int
):
    labels = lab_ref[0]  # (H, W) int32
    row = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iota = row * w + col

    # ---- 1. connected components (run-min fixpoint; ids = min flat index)
    lab_chains = _ok_chains(labels)

    def cc_body(state):
        comp, _ = state
        new = _pass_extreme(comp, lab_chains, "min")
        return new, jnp.any(new != comp)

    comp, _ = lax.while_loop(
        lambda s: s[1],
        cc_body,
        (_pass_extreme(iota, lab_chains, "min"), True),
    )

    # ---- 2. capped BFS subtree count (see module docstring). Both BFS
    # loops run to their FIXPOINT with a min_size iteration cap instead of
    # a fixed min_size iterations: once an update changes nothing, every
    # further iteration is a no-op, so early exit is bit-exact — and SLIC
    # blobs/fragments converge in ~their diameter (~20-30 steps), not 100
    # (measured ~2x on the whole kernel). The int16 variant of these loops
    # (2 elts/word on the VPU) is a dead end on this toolchain: Mosaic
    # can't relayout i1 masks between the (8,128) and (16,128) worlds and
    # fails to legalize arith.minsi on packed i16 vectors (2026-08-18).
    root = comp == iota
    dist0 = jnp.where(root, 0, _BIG)

    # comp is fixed from here on, so the four same-component neighbor masks
    # are loop-invariant: hoist them out of both BFS fixpoint bodies (they
    # were a shift + compare per direction per iteration)
    samec = tuple(_shift2(comp, dy, dx, -1) == comp for dy, dx in _PRIO)

    def dist_cond(state):
        _, changed, t = state
        return jnp.logical_and(changed, t < min_size)

    def dist_body(state):
        dist, _, t = state
        nd = dist
        for _ in range(_BFS_UNROLL):
            prev = nd
            for i, (dy, dx) in enumerate(_PRIO):
                cand = jnp.where(
                    samec[i], _shift2(prev, dy, dx, _BIG), _BIG
                )
                # cand <= _BIG always, so min(cand, _BIG) was a no-op
                nd = jnp.minimum(nd, cand + 1)
        return nd, jnp.any(nd != dist), t + _BFS_UNROLL

    dist, _, _ = lax.while_loop(
        dist_cond, dist_body, (dist0, True, jnp.int32(0))
    )

    # parent = first same-component _PRIO neighbor exactly one BFS step
    # closer (the component check is load-bearing: depths are only
    # comparable within a component — a foreign root's dist 0 across the
    # border would otherwise capture dist-1 pixels)
    pcode = jnp.full((h, w), 4, jnp.int32)
    for i, (dy, dx) in enumerate(_PRIO):
        nb = _shift2(dist, dy, dx, _BIG)
        take = (
            (pcode == 4) & (~root) & samec[i] & (dist < _BIG)
            & (nb == dist - 1)
        )
        pcode = jnp.where(take, i, pcode)

    # Subtree sums SATURATE at min_size: the survivor test only asks
    # v >= min_size, and clipping is decision-exact — a clipped child is
    # itself >= min_size, so its parent's sum still clears the threshold,
    # and nothing below min_size ever clips. Saturation makes large
    # components' values stabilize, so the fixpoint early exit fires for
    # them too (unsaturated sums would keep growing for tree-depth
    # iterations).
    # child masks are pcode-only — also loop-invariant
    childmask = tuple(pcode == i for i in range(4))

    def sum_cond(state):
        _, changed, t = state
        return jnp.logical_and(changed, t < min_size)

    def sum_body(state):
        v, _, t = state
        acc = v
        for _ in range(_BFS_UNROLL):
            prev = acc
            acc = jnp.ones((h, w), jnp.int32)
            for i, (dy, dx) in enumerate(_PRIO):
                acc = acc + _shift2(
                    jnp.where(childmask[i], prev, 0), -dy, -dx, 0
                )
            acc = jnp.minimum(acc, min_size)
        return acc, jnp.any(acc != v), t + _BFS_UNROLL

    v, _, _ = lax.while_loop(
        sum_cond, sum_body, (jnp.ones((h, w), jnp.int32), True, jnp.int32(0))
    )

    # ---- 3. survivors + raster renumbering (prefix sums, no scatter)
    survives = root & (v >= min_size)
    s_i = survives.astype(jnp.int32)
    row_ps = _prefix_sum(s_i, axis=1)  # inclusive within row
    # row totals, kept full-width: Mosaic rejects concat/shift chains on
    # (H, 1) columns (lane-offset layout mismatch), and row_ps is
    # non-decreasing so the row max IS the row total
    tot = jnp.broadcast_to(jnp.max(row_ps, axis=1, keepdims=True), (h, w))
    col_ps = _prefix_sum(tot, axis=0)  # inclusive over rows, full width
    newid = row_ps + (col_ps - tot) - 1  # overall inclusive - 1
    survives = survives & (newid < s_max)
    seed = jnp.where(survives, newid, -1)

    # ---- 4. propagate each root's new id through its component
    comp_chains = _ok_chains(comp)

    def prop_body(state):
        val, _ = state
        new = _pass_extreme(val, comp_chains, "max")
        return new, jnp.any(new != val)

    lab, _ = lax.while_loop(
        lambda s: s[1],
        prop_body,
        (_pass_extreme(seed, comp_chains, "max"), True),
    )

    # ---- 5. adoption of absorbed fragments (Jacobi, kept-neighbor
    # priority up,left,right,down — identical to the XLA pass). Guarded at
    # h + w steps: any absorbed pixel is within that L1 distance of a kept
    # one when any survivor exists (the XLA pass would spin forever in the
    # all-absorbed degenerate case; here leftovers clamp to id 0).
    kept0 = (lab >= 0).astype(jnp.int32)

    def ad_cond(state):
        _, kept, t = state
        return jnp.logical_and(jnp.any(kept == 0), t < h + w)

    def ad_body(state):
        lab, kept, t = state
        for _ in range(_BFS_UNROLL):
            cand = lab
            have = jnp.zeros((h, w), jnp.int32)
            # reverse priority so the first-listed neighbor wins the where
            for dy, dx in ((1, 0), (0, 1), (0, -1), (-1, 0)):
                nl = _shift2(lab, dy, dx, 0)
                nk = _shift2(kept, dy, dx, 0)
                cand = jnp.where(nk != 0, nl, cand)
                have = jnp.maximum(have, nk)
            adopt = (kept == 0) & (have != 0)
            lab = jnp.where(adopt, cand, lab)
            kept = jnp.maximum(kept, adopt.astype(jnp.int32))
        return lab, kept, t + _BFS_UNROLL

    lab, _, _ = lax.while_loop(ad_cond, ad_body, (lab, kept0, jnp.int32(0)))
    out_ref[0] = jnp.maximum(lab, 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def enforce_connectivity_fused(
    labels: jnp.ndarray,
    n_sp: int,
    min_size: int | None = None,
    s_max: int | None = None,
) -> jnp.ndarray:
    """(B, H, W) int32 SLIC labels -> 4-connected superpixels in [0, s_max).

    Bit-identical to models/slic.py::enforce_connectivity_device (pinned by
    tests), one whole-image VMEM grid step per image. Requires
    min_size <= its own BFS cap by construction (min_size IS the cap).
    """
    b, h, w = labels.shape
    n = h * w
    if min_size is None:
        min_size = max(1, n // n_sp // 4)
    if s_max is None:
        s_max = n_sp

    kernel = functools.partial(
        _enforce_kernel, h=h, w=w, min_size=min_size, s_max=s_max
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the unrolled prefix-doubling chains keep ~35 (H, W) i32
            # temporaries live across the fixpoint bodies — well past the
            # 16 MB default scoped-vmem stack, comfortably inside the
            # chip's 128 MiB VMEM (same treatment as the Lloyd kernels).
            # 110 MB admits config4's pooled 4K grid (540x960 measured
            # 104.96 MB — the _ok_chains masks dominate: 2 axes x 2 dirs x
            # ~10 prefix-doubling steps of (H, W) i32); the cap is an
            # allowance, not an allocation, so small shapes are unaffected.
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(labels.astype(jnp.int32))
