"""Pallas TPU kernels for gaussian tile compositing (forward + custom VJP).

This is the TPU replacement for the CUDA `diff-gaussian-rasterization`
per-tile loops.  Instead of a sequential front-to-back loop with early
termination (a warp pattern), compositing is reformulated as dense linear
algebra so it runs on the MXU:

    alpha[p, k]  = min(o_k * exp(-0.5 d^T conic d), 0.99)        (VPU)
    lg = log1p(-alpha)
    S_excl = lg @ U_strict          # exclusive prefix-sum over k  (MXU)
    w = alpha * exp(S_excl)         # per-gaussian compositing weight
    color[c, p] = sum_k color[c, k] * w[p, k]                     (MXU)
    alpha_out[p] = 1 - exp(sum_k lg[p, k])

The backward pass recomputes alpha from the inputs (no (K, P) residuals in
HBM) and reduces cotangents with the same triangular-matmul trick — the
suffix sum that the CUDA kernel accumulates back-to-front is one matmul
against the strict *lower* triangle.

Layouts are chosen for the (sublane, lane) = (8, 128) tiling:
  * per-tile gaussian parameters are packed as (9, K) = N_ROWS param rows
    (ux, uy, conic a/b/c, rgb, opacity) x K lanes — Mosaic pads the sublane
    dim internally, so padding to 16 ourselves would only add HBM traffic;
  * the alpha matrix lives as (P, K): P = tile^2 pixel sublanes, K lanes.

Per-tile VMEM at K=512, tile=16 (P=256): ~2.5 MB forward, ~4 MB backward —
comfortably inside the 16 MB budget, so the whole composite never touches
HBM between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CUTOFF = 1.0 / 255.0
ALPHA_CAP = 0.99
NEG_INF = -1e30

# packed parameter row indices (9 rows exactly — padding the sublane dim to
# a "nice" 16 measured ~8 ms/step of pure concat/slice HBM traffic in the
# autodiff path; Mosaic pads sublanes internally for free)
ROW_UX, ROW_UY = 0, 1
ROW_CA, ROW_CB, ROW_CC = 2, 3, 4
ROW_R, ROW_G, ROW_B = 5, 6, 7
ROW_OPAC = 8
N_ROWS = 9


def _pixel_grid(tile: int, grid_w: int, t):
    """(P, 1) pixel-center x and y for tile index t (a traced scalar)."""
    ty = t // grid_w
    tx = t % grid_w
    P = tile * tile
    # generate directly in (P, 1) — Mosaic cannot reshape (t, t) -> (P, 1)
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = p_ids // tile
    px = p_ids % tile
    x = (tx * tile + px).astype(jnp.float32) + 0.5
    y = (ty * tile + py).astype(jnp.float32) + 0.5
    return x, y


def _alpha_matrix(packed, tile: int, grid_w: int, K: int, tid):
    """Recompute the (P, K) effective alpha matrix for one tile.

    Validity needs no separate mask: the XLA-side packer zeroes the opacity
    row beyond each tile's count, which zeroes alpha exactly.
    `tid` is pl.program_id(0), hoisted by the caller (program_id cannot be
    read inside a pl.when branch in interpret mode)."""
    x, y = _pixel_grid(tile, grid_w, tid)            # (P, 1)

    ux = packed[ROW_UX : ROW_UX + 1, :]              # (1, K)
    uy = packed[ROW_UY : ROW_UY + 1, :]
    ca = packed[ROW_CA : ROW_CA + 1, :]
    cb = packed[ROW_CB : ROW_CB + 1, :]
    cc = packed[ROW_CC : ROW_CC + 1, :]
    o = packed[ROW_OPAC : ROW_OPAC + 1, :]

    dx = x - ux                                       # (P, K)
    dy = y - uy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    power = jnp.minimum(power, 0.0)                   # PSD quadform safety

    a_full = o * jnp.exp(power)
    capped = a_full > ALPHA_CAP
    a = jnp.where(capped, ALPHA_CAP, a_full)
    cut = a < ALPHA_CUTOFF
    a = jnp.where(cut, 0.0, a)
    grad_ok = jnp.logical_not(jnp.logical_or(capped, cut))
    return a, a_full, grad_ok, dx, dy


K_SMALL = 128   # smallest occupancy level: K^2 matmul work drops 16x

_BLOCK = 128    # prefix/suffix matmul block (one lane tile)

# Triangular prefix/suffix matmuls with bf16 operands (f32 accumulation).
# MXU bf16 rate is 4x f32 on v5e; bf16 lg loses ~0.4% relative per term.
# Default: ON for the TPU backend — measured before the flip (round 5):
# full-size bench 75.0 it/s @512^2 with floors green, e2e selfrecon
# 33.53 dB vs 33.4 dB f32 (E2E_BF16_512 vs E2E_TIMING_512).  OFF elsewhere
# so the CPU interpret-mode tests compare f32 math exactly.
# OMFS4D_COMPOSITE_BF16=0/1 forces either way.
import os

_BF16_ENV = os.environ.get("OMFS4D_COMPOSITE_BF16", "")


def _bf16_matmul() -> bool:
    if _BF16_ENV in ("0", "1"):
        return _BF16_ENV == "1"
    return jax.default_backend() == "tpu"


def _mm(x):
    return x.astype(jnp.bfloat16) if _bf16_matmul() else x


def _strict_upper(b: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return _mm((row < col).astype(jnp.float32))


def _excl_prefix(lg: jnp.ndarray, k: int) -> jnp.ndarray:
    """s_excl[p, j] = sum_{i<j} lg[p, i] as blocked triangular matmuls.

    A single (k, k) triangular matmul is O(P k^2) MXU FLOPs — at K=512 it
    dominates the composite (the full-occupancy silhouette tiles).  Blocking
    at B=128 with a running (P, 1) carry is O(P k B): 4x fewer FLOPs at
    K=512, exact same f32 math modulo sum reassociation."""
    if k <= _BLOCK or k % _BLOCK:
        return jnp.dot(_mm(lg), _strict_upper(k),
                       preferred_element_type=jnp.float32)
    P = lg.shape[0]
    nb = k // _BLOCK
    u = _strict_upper(_BLOCK)
    base = jnp.zeros((P, 1), jnp.float32)
    outs = []
    for b in range(nb):
        blk = lg[:, b * _BLOCK:(b + 1) * _BLOCK]
        outs.append(
            jnp.dot(_mm(blk), u, preferred_element_type=jnp.float32) + base)
        if b + 1 < nb:
            base = base + jnp.sum(blk, axis=1, keepdims=True)
    return jnp.concatenate(outs, axis=1)


def _suffix_sum(m: jnp.ndarray, k: int) -> jnp.ndarray:
    """suffix[p, j] = sum_{i>j} m[p, i] — blocked, scanned from the right."""
    def tri(blk, b):
        return jax.lax.dot_general(
            _mm(blk), _strict_upper(b),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if k <= _BLOCK or k % _BLOCK:
        return tri(m, k)
    P = m.shape[0]
    nb = k // _BLOCK
    tail = jnp.zeros((P, 1), jnp.float32)
    outs: list = [None] * nb
    for b in reversed(range(nb)):
        blk = m[:, b * _BLOCK:(b + 1) * _BLOCK]
        outs[b] = tri(blk, _BLOCK) + tail
        if b > 0:
            tail = tail + jnp.sum(blk, axis=1, keepdims=True)
    return jnp.concatenate(outs, axis=1)


def _k_levels(K: int) -> list[int]:
    """Occupancy fast-path levels below K.  Per-tile lists are
    count-contiguous, so a tile whose count fits a level runs the
    composite at that K.  One level (K_SMALL) measured best on chip: a
    denser ladder's extra branches cost more than the mid-occupancy
    savings (the K^2 matmul is MXU-cheap; the per-level dispatch is not).
    """
    return [K_SMALL] if K > K_SMALL else []


def _fwd_body(packed, color_out_ref, alpha_out_ref, tile, grid_w, k, tid):
    """Forward composite over the first `k` list entries of one tile."""
    P = tile * tile
    a, _, _, _, _ = _alpha_matrix(packed, tile, grid_w, k, tid)
    lg = jnp.log1p(-a)                                # (P, k)

    # exclusive prefix sum over k via blocked triangular matmuls: the MXU is
    # otherwise idle here and measures faster than a log-step lane cumsum
    s_excl = _excl_prefix(lg, k)

    w = a * jnp.exp(s_excl)                           # (P, k)
    colors = packed[ROW_R : ROW_B + 1, :]             # (3, k)
    out = jax.lax.dot_general(
        colors, w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (3, P)
    color_out_ref[0] = out
    s_total = jnp.sum(lg, axis=1, keepdims=True)      # (P, 1)
    alpha_out_ref[0] = (1.0 - jnp.exp(s_total)).reshape(1, P)


def _fwd_kernel(base_ref, packed_ref, color_out_ref, alpha_out_ref,
                *, tile: int, grid_w: int, K: int):
    packed = packed_ref[0]                            # (N_ROWS, K)
    P = tile * tile
    # `base` offsets the global tile id: sharded callers composite a
    # contiguous slab of tiles starting at axis_index * local_T
    tid = pl.program_id(0) + base_ref[0]

    opac_row = packed[ROW_OPAC : ROW_OPAC + 1, :]
    # background tiles (no live gaussian) skip all MXU work; lists are
    # count-contiguous, so "nothing live beyond level l" <=> count <= l
    empty = jnp.max(opac_row) <= 0.0

    @pl.when(empty)
    def _():
        color_out_ref[0] = jnp.zeros((3, P), jnp.float32)
        alpha_out_ref[0] = jnp.zeros((1, P), jnp.float32)

    not_prev = jnp.logical_not(empty)
    for lvl in _k_levels(K):
        fits = jnp.max(opac_row[:, lvl:]) <= 0.0

        @pl.when(not_prev & fits)
        def _(lvl=lvl):
            _fwd_body(packed[:, :lvl], color_out_ref, alpha_out_ref,
                      tile, grid_w, lvl, tid)

        not_prev = not_prev & jnp.logical_not(fits)

    @pl.when(not_prev)
    def _():
        _fwd_body(packed, color_out_ref, alpha_out_ref,
                  tile, grid_w, K, tid)


def _bwd_body(packed, dcol_ref, dalpha_ref, dpacked_ref,
              tile, grid_w, k, K, tid):
    """Backward composite over the first `k` list entries; columns beyond
    k receive zero cotangents."""
    P = tile * tile
    a, a_full, grad_ok, dx, dy = _alpha_matrix(packed, tile, grid_w, k, tid)
    one_minus = jnp.maximum(1.0 - a, 1e-6)
    lg = jnp.log(one_minus)

    s_excl = _excl_prefix(lg, k)
    t_excl = jnp.exp(s_excl)
    w = a * t_excl                                    # (P, K)

    dcol = dcol_ref[0]                                # (3, P)
    dalpha = dalpha_ref[0]                            # (1, P)
    colors = packed[ROW_R : ROW_B + 1, :]             # (3, K)

    # dcolor[c, k] = sum_p dcol[c, p] w[p, k]
    dcolors = jnp.dot(dcol, w, preferred_element_type=jnp.float32)  # (3, K)

    # dw[p, k] = sum_c dcol[c, p] colors[c, k]
    dw = jax.lax.dot_general(
        dcol, colors,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (P, K)

    # suffix[p, k] = sum_{j > k} dw[p, j] w[p, j]
    suffix = _suffix_sum(dw * w, k)

    s_total = jnp.sum(lg, axis=1, keepdims=True)      # (P, 1)
    t_total = jnp.exp(s_total)
    dA = dalpha.reshape(P, 1)                          # (P, 1)

    da = dw * t_excl - suffix / one_minus + dA * t_total / one_minus
    da = jnp.where(grad_ok, da, 0.0)

    o = packed[ROW_OPAC : ROW_OPAC + 1, :]            # (1, K)
    e = a_full / jnp.maximum(o, 1e-12)                # exp(power)
    do = jnp.sum(da * e, axis=0, keepdims=True)       # (1, K)
    dq = da * a_full                                   # (P, K)

    ca = packed[ROW_CA : ROW_CA + 1, :]
    cb = packed[ROW_CB : ROW_CB + 1, :]
    cc = packed[ROW_CC : ROW_CC + 1, :]
    dux = jnp.sum(dq * (ca * dx + cb * dy), axis=0, keepdims=True)
    duy = jnp.sum(dq * (cc * dy + cb * dx), axis=0, keepdims=True)
    dca = jnp.sum(dq * (-0.5 * dx * dx), axis=0, keepdims=True)
    dcb = jnp.sum(dq * (-dx * dy), axis=0, keepdims=True)
    dcc = jnp.sum(dq * (-0.5 * dy * dy), axis=0, keepdims=True)

    dp = jnp.concatenate(
        [dux, duy, dca, dcb, dcc, dcolors, do], axis=0)
    if k == K:
        dpacked_ref[0] = dp
    else:
        dpacked_ref[0] = jnp.concatenate(
            [dp, jnp.zeros((N_ROWS, K - k), jnp.float32)], axis=1)


def _bwd_kernel(base_ref, packed_ref, dcol_ref, dalpha_ref, dpacked_ref,
                *, tile: int, grid_w: int, K: int):
    packed = packed_ref[0]                            # (N_ROWS, K)
    tid = pl.program_id(0) + base_ref[0]

    opac_row = packed[ROW_OPAC : ROW_OPAC + 1, :]
    empty = jnp.max(opac_row) <= 0.0

    @pl.when(empty)
    def _():
        dpacked_ref[0] = jnp.zeros((N_ROWS, K), jnp.float32)

    not_prev = jnp.logical_not(empty)
    for lvl in _k_levels(K):
        fits = jnp.max(opac_row[:, lvl:]) <= 0.0

        @pl.when(not_prev & fits)
        def _(lvl=lvl):
            _bwd_body(packed[:, :lvl], dcol_ref, dalpha_ref, dpacked_ref,
                      tile, grid_w, lvl, K, tid)

        not_prev = not_prev & jnp.logical_not(fits)

    @pl.when(not_prev)
    def _():
        _bwd_body(packed, dcol_ref, dalpha_ref, dpacked_ref,
                  tile, grid_w, K, K, tid)


def _call_fwd(packed, base, tile: int, grid_w: int, interpret: bool):
    T, _, K = packed.shape
    P = tile * tile
    grid = (T,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tile=tile, grid_w=grid_w, K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N_ROWS, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(base, packed)


def _call_bwd(packed, base, dcol, dalpha, tile: int, grid_w: int, interpret: bool):
    T, _, K = packed.shape
    P = tile * tile
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tile=tile, grid_w=grid_w, K=K),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N_ROWS, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_ROWS, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N_ROWS, K), jnp.float32),
        interpret=interpret,
    )(base, packed, dcol, dalpha)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles(packed, base, tile: int, grid_w: int, interpret: bool):
    """(T, 9, K) packed params (+ (1,) int32 global-tile-id base) ->
    ((T, 3, P), (T, 1, P))."""
    return _call_fwd(packed, base, tile, grid_w, interpret)


def _composite_fwd(packed, base, tile, grid_w, interpret):
    out = _call_fwd(packed, base, tile, grid_w, interpret)
    return out, (packed, base)


def _composite_bwd(tile, grid_w, interpret, res, cot):
    packed, base = res
    dcol, dalpha = cot
    dpacked = _call_bwd(packed, base, dcol, dalpha, tile, grid_w, interpret)
    # int operands take a float0 cotangent
    dbase = np.zeros(base.shape, jax.dtypes.float0)
    return (dpacked, dbase)


composite_tiles.defvjp(_composite_fwd, _composite_bwd)

def _zero_base():
    return jnp.zeros((1,), jnp.int32)


def _gather_packed(params9, lists):
    """(N, 9) table + (T, K) per-tile indices -> (T, 9, K) packed params.

    One plain XLA row gather; XLA derives its transpose as ONE row
    scatter-add into the (N, 9) table.  Tried and REVERTED (round 4): a
    custom VJP doing 9 component-wise 1-D scatter-adds measured 2.6 ms vs
    4.4 ms for the row scatter in a chained MICRObenchmark, but in the full
    train-step graph it HALVED throughput (58 -> 32 it/s on chip) — the
    in-graph row scatter overlaps with the Pallas bwd kernel's compute,
    while the 9 separate scatters serialize.  Chained isolation benches do
    not see cross-op overlap; only bench.py verdicts count for this op."""
    return jnp.swapaxes(params9[lists], 1, 2)


def _pack_lists(uv, conic, colors, opacity, lists, counts):
    """Gather the (T, 9, K) packed per-tile parameter table.

    Validity is baked into the opacity row: entries past the per-tile count
    get 0, making their alpha exactly 0 in-kernel (no SMEM counts needed)."""
    K = lists.shape[1]
    params9 = jnp.concatenate(
        [uv, conic, colors, opacity[:, None]], axis=1)   # (N, 9)
    packed = _gather_packed(params9, lists)               # (T, 9, K)
    k_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    opac_row = jnp.where(k_valid, packed[:, ROW_OPAC, :], 0.0)
    return jnp.concatenate(
        [packed[:, :ROW_OPAC, :], opac_row[:, None, :]], axis=1)


def composite_lists_pallas(uv, conic, colors, opacity, lists, counts,
                           tile: int, grid_w: int, tile_base=None,
                           interpret: bool | None = None):
    """Pallas composite over an arbitrary contiguous tile slab.

    Drop-in for `composite_tiles_xla` (same ((T, P, 3), (T, P)) outputs) so
    the sharded render paths (parallel.shard) can run the MXU kernel per
    shard: `tile_base` is the slab's first GLOBAL tile id (traced; e.g.
    axis_index * local_T inside shard_map), defaulting to 0."""
    packed = _pack_lists(uv, conic, colors, opacity, lists, counts)
    base = (_zero_base() if tile_base is None
            else jnp.asarray(tile_base, jnp.int32).reshape(1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    col, alp = composite_tiles(packed, base, tile, grid_w, interpret)
    return jnp.swapaxes(col, 1, 2), alp[:, 0, :]


def composite_pallas(uv, conic, colors, opacity, binning, width, height, tile=16):
    """Drop-in replacement for composite_reference on TPU.

    The per-tile parameter gather stays in XLA (its transpose is the
    scatter-add the CUDA backward does with atomics); the Pallas kernel does
    the math-dense compositing.
    """
    grid_w = (width + tile - 1) // tile
    grid_h = (height + tile - 1) // tile
    num_tiles = grid_w * grid_h
    packed = _pack_lists(uv, conic, colors, opacity,
                         binning.tile_lists, binning.tile_counts)

    interpret = jax.default_backend() != "tpu"
    col, alp = composite_tiles(packed, _zero_base(), tile, grid_w, interpret)

    img = col.reshape(grid_h, grid_w, 3, tile, tile)
    img = img.transpose(0, 3, 1, 4, 2).reshape(grid_h * tile, grid_w * tile, 3)
    alpha = alp.reshape(grid_h, grid_w, tile, tile)
    alpha = alpha.transpose(0, 2, 1, 3).reshape(grid_h * tile, grid_w * tile)
    return img[:height, :width], alpha[:height, :width]
