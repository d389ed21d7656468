"""Per-pass decomposition of the CHW solver + Pallas-vs-matmul 2x2 pooling.

Times, at config1 batch-16 bf16 scale:
  - one full-res _lloyd_chw_pass (kernel only, prebuilt weights)
  - one pooled-res _lloyd_chw_pass
  - one full-res pass INCLUDING the per-iteration center math
    (center_inputs: _expand_diag etc.) — the while-loop body cost
  - one maximin pass at pooled res
  - matmul pooling (_pool2x2_cm) vs the strided-VPU Pallas pool kernel

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_chw_passes.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gabor_color_image_segmentation_tpu.config import preset
from gabor_color_image_segmentation_tpu.data import synthetic_mosaic
from gabor_color_image_segmentation_tpu.models.kmeans_chw import (
    _HB,
    _affine_params,
    _expand_diag,
    _lloyd_chw_pass,
    _maximin_chw_pass,
    build_color4,
)
from gabor_color_image_segmentation_tpu.models.pipeline import _color_transform
from gabor_color_image_segmentation_tpu.ops.bank import make_bank
from gabor_color_image_segmentation_tpu.ops.features import _pool2x2_cm
from gabor_color_image_segmentation_tpu.ops.fused_pallas import (
    gabor_energies_fused,
)

LOOP = 6
FENCE_MS = 31.0
K = 5


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} ~{(best*1e3-FENCE_MS)/LOOP:7.2f} ms/op real", flush=True)


def loop(fn):
    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return lax.fori_loop(0, LOOP, body, jnp.float32(0))
    return run


def perturb(x, i, scale=1e-6):
    return x * (1.0 + i.astype(jnp.float32) * scale).astype(x.dtype)


# --- strided-VPU Pallas 2x2 pool kernel ------------------------------------


def _pool_kernel(x_ref, o_ref, *, cb, hb, w):
    # Mosaic supports only 2-D strided slices: merge (CB, HB) -> CB*HB
    # leading rows first (free), pair adjacent sublanes, then lanes.
    x = x_ref[0].reshape(cb * hb, w)
    ev = jax.lax.slice(x, (0, 0), (cb * hb, w), (2, 1))
    od = jax.lax.slice(x, (1, 0), (cb * hb, w), (2, 1))
    v = ev + od  # (CB*HB/2, W)
    rows = cb * hb // 2
    le = jax.lax.slice(v, (0, 0), (rows, w), (1, 2))
    lo = jax.lax.slice(v, (0, 1), (rows, w), (1, 2))
    o = (le + lo).astype(jnp.float32) * 0.25
    o_ref[0] = o.reshape(cb, hb // 2, w // 2).astype(o_ref.dtype)


@jax.jit
def pool2x2_pallas(x):
    b, c, h, w = x.shape
    hb = 16
    nb = h // hb  # drops the odd trailing row exactly like h//2 semantics?
    h2, w2 = h // 2, w // 2
    # grid over full HB blocks; trailing odd rows (h % 2) are dropped by
    # h//2 semantics; blocks cover 2*ceil? keep simple: require h even rows
    # handled below by slicing input to 2*(h//2)
    xe = x[:, :, : 2 * h2, : 2 * w2]
    nb = -(-(2 * h2) // hb)
    kernel = functools.partial(_pool_kernel, cb=c, hb=hb, w=2 * w2)
    # pad rows to a multiple of hb by replicating (values unused past h2*2)
    pad = nb * hb - 2 * h2
    if pad:
        xe = jnp.concatenate([xe, xe[:, :, -pad:, :]], axis=2)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, c, hb, 2 * w2), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hb // 2, w2), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, nb * hb // 2, w2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xe)
    return out[:, :, :h2, :]


def main():
    cfg = preset("config1").replace(dtype="bfloat16")
    bank = make_bank(cfg.bank)
    cc = cfg.cluster
    imgs = np.stack(
        [synthetic_mosaic(321, 481, n_regions=5, seed=100 + i)[0]
         for i in range(16)]
    )
    rgb = jnp.asarray(imgs)
    lab = jax.jit(lambda r: _color_transform(r, "lab"))(rgb)
    xe = jax.jit(
        lambda l: gabor_energies_fused(l, bank, jnp.bfloat16, channel_major=True)
    )(lab)
    xc4 = jax.jit(lambda c: build_color4(c, jnp.bfloat16))(lab)
    a, b_aff = jax.jit(lambda e, c: _affine_params(e, c, cc, 1e-6))(xe, xc4)
    fence(xe), fence(xc4), fence(a)
    b, e, h, w = xe.shape
    d = e + 3
    f32 = jnp.float32
    hb = _HB
    mm = xe.dtype

    # pooled twins
    pe = jax.jit(_pool2x2_cm)(xe)
    pc = jax.jit(_pool2x2_cm)(xc4)
    fence(pe), fence(pc)

    # NOTE: a strided-VPU pallas pool kernel was tried here and is
    # unlowersble: Mosaic rejects 3-D gathers AND >1 strides in 2-D slices
    # ('vector.extract_strided_slice' strides confined to [1, 2)). Pooling
    # must ride matmuls; the cheap place is inside the energies kernel via
    # pre-pooled smoothing Toeplitz matrices (P @ S applied to mag).

    # prebuilt center inputs (fixed arbitrary centers)
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.standard_normal((b, K, d)), f32)
    u = c0 - b_aff[:, None, :]
    wc = a[:, None, :] * u
    offs_v = jnp.sum(u * u, axis=2)
    wck = jnp.zeros((b, K, d + 1), f32).at[:, :, :d].set(wc)
    wce_x = _expand_diag(wck[:, :, :e], hb).astype(mm)
    wcc_x = _expand_diag(wck[:, :, e:], hb).astype(mm)
    offs = jnp.zeros((b, 8, 128), f32).at[:, :K, 0].set(offs_v)
    fence(wce_x)

    timeit("lloyd pass FULL res (kernel only)", loop(
        lambda i, x_, c4, we, wcx, of: jnp.sum(
            _lloyd_chw_pass(perturb(x_, i), c4, we, wcx, of, K, hb, False)[0]
            .astype(f32)
        )
    ), xe, xc4, wce_x, wcc_x, offs)

    timeit("lloyd pass POOLED res (kernel only)", loop(
        lambda i, x_, c4, we, wcx, of: jnp.sum(
            _lloyd_chw_pass(perturb(x_, i), c4, we, wcx, of, K, hb, False)[0]
            .astype(f32)
        )
    ), pe, pc, wce_x, wcc_x, offs)

    def full_iter(i, x_, c4, cen):
        cen = perturb(cen, i)
        u_ = cen - b_aff[:, None, :]
        wc_ = a[:, None, :] * u_
        of_v = jnp.sum(u_ * u_, axis=2)
        wk = jnp.zeros((b, K, d + 1), f32).at[:, :, :d].set(wc_)
        we = _expand_diag(wk[:, :, :e], hb).astype(mm)
        wcx = _expand_diag(wk[:, :, e:], hb).astype(mm)
        of = jnp.zeros((b, 8, 128), f32).at[:, :K, 0].set(of_v)
        labels, se, sc = _lloyd_chw_pass(x_, c4, we, wcx, of, K, hb, False)
        return jnp.sum(labels.astype(f32)) + jnp.sum(se) + jnp.sum(sc)

    timeit("lloyd FULL iter (incl. center math)", loop(full_iter), xe, xc4, c0)
    timeit("lloyd POOLED iter (incl. center math)", loop(full_iter), pe, pc, c0)

    # maximin pass, pooled res
    a2 = jnp.concatenate([a * a, jnp.zeros((b, 1), f32)], axis=1)
    a2e_x = _expand_diag(a2[:, None, :e], hb).astype(mm)
    a2c_x = _expand_diag(a2[:, None, e:], hb).astype(mm)
    wpe = a2[:, :e] * c0[:, 0, :e]
    wpc = a2[:, e:] * jnp.concatenate(
        [c0[:, 0, e:], jnp.ones((b, 1), f32)], axis=1
    )
    csq = jnp.zeros((b, 8, 128), f32)
    wp_x = _expand_diag(wpe[:, None, :], hb).astype(mm)
    wpc_x = _expand_diag(wpc[:, None, :], hb).astype(mm)
    dmin = jnp.zeros((b, pe.shape[2], pe.shape[3]), f32)
    fence(wp_x)

    timeit("maximin pass POOLED (kernel only)", loop(
        lambda i, x_, c4: jnp.sum(
            _maximin_chw_pass(
                perturb(x_, i), c4, wp_x, wpc_x, a2e_x, a2c_x, csq, dmin,
                True, hb, False,
            )[0]
        )
    ), pe, pc)

    timeit("pool2x2 matmul (energies+color)", loop(
        lambda i, x_, c4: jnp.sum(_pool2x2_cm(perturb(x_, i)).astype(f32))
        + jnp.sum(_pool2x2_cm(perturb(c4, i)).astype(f32))
    ), xe, xc4)



if __name__ == "__main__":
    main()
