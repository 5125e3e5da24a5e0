"""Decompose the Pallas composite backward cost on chip (perf wave 3).

Times ablated variants of the backward kernel to attribute the measured
~9 ms: triangular matmuls vs (P, K) elementwise chains vs memory traffic,
plus a bf16-matmul variant to see what explicit low-precision buys.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from omfs4d.render.pallas_kernels import (
    ALPHA_CAP, ALPHA_CUTOFF, N_ROWS, ROW_CA, ROW_CB, ROW_CC, ROW_OPAC,
    ROW_R, ROW_B, _alpha_matrix, _call_bwd, _call_fwd,
)

T, K, TILE = 1024, 512, 16
GRID_W = 32
P = TILE * TILE


def timed(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<44s} {dt:8.3f} ms", flush=True)
    return dt


def make_variant_kernel(mode: str):
    """mode: matmuls | elementwise | copy | bf16_matmuls | full_bf16"""

    def body(packed_ref, dcol_ref, dalpha_ref, dpacked_ref):
        packed = packed_ref[0]
        tid = pl.program_id(0)
        a, a_full, grad_ok, dx, dy = _alpha_matrix(packed, TILE, GRID_W, K, tid)
        one_minus = jnp.maximum(1.0 - a, 1e-6)
        lg = jnp.log(one_minus)
        dcol = dcol_ref[0]
        dalpha = dalpha_ref[0]
        colors = packed[ROW_R: ROW_B + 1, :]

        if mode == "copy":
            dpacked_ref[0] = packed * 2.0
            return

        mm_dtype = jnp.bfloat16 if mode in ("bf16_matmuls", "full_bf16") else jnp.float32
        row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        u_strict = (row < col).astype(mm_dtype)

        if mode in ("matmuls", "bf16_matmuls"):
            s_excl = jnp.dot(lg.astype(mm_dtype), u_strict,
                             preferred_element_type=jnp.float32)
            t_excl = jnp.exp(s_excl)
            w = a * t_excl
            dw = jax.lax.dot_general(
                dcol.astype(mm_dtype), colors.astype(mm_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = (dw * w).astype(mm_dtype)
            suffix = jax.lax.dot_general(
                m, u_strict,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dcolors = jnp.dot(dcol.astype(mm_dtype), w.astype(mm_dtype),
                              preferred_element_type=jnp.float32)
            out = jnp.concatenate(
                [jnp.sum(suffix, axis=0, keepdims=True),
                 jnp.zeros((N_ROWS - 4, K), jnp.float32),
                 dcolors], axis=0)
            dpacked_ref[0] = out
            return

        if mode == "elementwise":
            # fake t_excl/suffix with cheap broadcasts; keep all elementwise
            # gradient chains
            t_excl = one_minus
            suffix = a * 0.5
            dw = a + 0.1
            dA = dalpha.reshape(P, 1)
            t_total = jnp.exp(jnp.sum(lg, axis=1, keepdims=True))
            da = dw * t_excl - suffix / one_minus + dA * t_total / one_minus
            da = jnp.where(grad_ok, da, 0.0)
            o = packed[ROW_OPAC: ROW_OPAC + 1, :]
            e = a_full / jnp.maximum(o, 1e-12)
            do = jnp.sum(da * e, axis=0, keepdims=True)
            dq = da * a_full
            ca = packed[ROW_CA: ROW_CA + 1, :]
            cb = packed[ROW_CB: ROW_CB + 1, :]
            cc = packed[ROW_CC: ROW_CC + 1, :]
            dux = jnp.sum(dq * (ca * dx + cb * dy), axis=0, keepdims=True)
            duy = jnp.sum(dq * (cc * dy + cb * dx), axis=0, keepdims=True)
            dca = jnp.sum(dq * (-0.5 * dx * dx), axis=0, keepdims=True)
            dcb = jnp.sum(dq * (-dx * dy), axis=0, keepdims=True)
            dcc = jnp.sum(dq * (-0.5 * dy * dy), axis=0, keepdims=True)
            dpacked_ref[0] = jnp.concatenate(
                [dux, duy, dca, dcb, dcc,
                 jnp.zeros((3, K), jnp.float32), do], axis=0)
            return

        # full_bf16: complete backward with bf16 matmul operands
        s_excl = jnp.dot(lg.astype(mm_dtype), u_strict,
                         preferred_element_type=jnp.float32)
        t_excl = jnp.exp(s_excl)
        w = a * t_excl
        dw = jax.lax.dot_general(
            dcol.astype(mm_dtype), colors.astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = (dw * w).astype(mm_dtype)
        suffix = jax.lax.dot_general(
            m, u_strict,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dcolors = jnp.dot(dcol.astype(mm_dtype), w.astype(mm_dtype),
                          preferred_element_type=jnp.float32)
        s_total = jnp.sum(lg, axis=1, keepdims=True)
        t_total = jnp.exp(s_total)
        dA = dalpha.reshape(P, 1)
        da = dw * t_excl - suffix / one_minus + dA * t_total / one_minus
        da = jnp.where(grad_ok, da, 0.0)
        o = packed[ROW_OPAC: ROW_OPAC + 1, :]
        e = a_full / jnp.maximum(o, 1e-12)
        do = jnp.sum(da * e, axis=0, keepdims=True)
        dq = da * a_full
        ca = packed[ROW_CA: ROW_CA + 1, :]
        cb = packed[ROW_CB: ROW_CB + 1, :]
        cc = packed[ROW_CC: ROW_CC + 1, :]
        dux = jnp.sum(dq * (ca * dx + cb * dy), axis=0, keepdims=True)
        duy = jnp.sum(dq * (cc * dy + cb * dx), axis=0, keepdims=True)
        dca = jnp.sum(dq * (-0.5 * dx * dx), axis=0, keepdims=True)
        dcb = jnp.sum(dq * (-dx * dy), axis=0, keepdims=True)
        dcc = jnp.sum(dq * (-0.5 * dy * dy), axis=0, keepdims=True)
        dpacked_ref[0] = jnp.concatenate(
            [dux, duy, dca, dcb, dcc, dcolors, do], axis=0)

    def call(packed, dcol, dalpha):
        return pl.pallas_call(
            body,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, N_ROWS, K), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, P), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N_ROWS, K), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N_ROWS, K), jnp.float32),
        )(packed, dcol, dalpha)

    return jax.jit(call)


def main():
    rng = np.random.default_rng(0)
    packed = np.zeros((T, N_ROWS, K), np.float32)
    packed[:, 0] = rng.uniform(0, 512, (T, K))       # ux
    packed[:, 1] = rng.uniform(0, 512, (T, K))       # uy
    packed[:, 2] = rng.uniform(0.01, 0.3, (T, K))    # ca
    packed[:, 3] = rng.uniform(-0.05, 0.05, (T, K))  # cb
    packed[:, 4] = rng.uniform(0.01, 0.3, (T, K))    # cc
    packed[:, 5:8] = rng.uniform(0, 1, (T, 3, K))
    packed[:, 8] = rng.uniform(0, 0.9, (T, K))       # opacity (all "live")
    packed = jnp.asarray(packed)
    dcol = jnp.asarray(rng.normal(0, 1, (T, 3, P)), jnp.float32)
    dalpha = jnp.asarray(rng.normal(0, 1, (T, 1, P)), jnp.float32)

    print(f"T={T} K={K} P={P} (all tiles at full occupancy)", flush=True)
    fwd = jax.jit(lambda p: _call_fwd(p, jnp.zeros((1,), jnp.int32), TILE, GRID_W, False))
    timed(fwd, packed, label="fwd (current)")
    bwd = jax.jit(lambda p, dc, da: _call_bwd(p, jnp.zeros((1,), jnp.int32), dc, da, TILE, GRID_W, False))
    timed(bwd, packed, dcol, dalpha, label="bwd (current)")

    for mode in ("copy", "elementwise", "matmuls", "bf16_matmuls",
                 "full_bf16"):
        try:
            fn = make_variant_kernel(mode)
            timed(fn, packed, dcol, dalpha, label=f"bwd variant: {mode}")
        except Exception as e:  # noqa: BLE001
            print(f"bwd variant {mode} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # sort cost in isolation (binning's dominant op)
    n_pairs = 131_072 * 16
    keys = jnp.asarray(rng.integers(0, 2**31, n_pairs), jnp.int32)
    payload = jnp.arange(n_pairs, dtype=jnp.int32)
    sort_fn = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    timed(sort_fn, keys, payload, label=f"lax.sort {n_pairs/1e6:.1f}M pairs")
    half = n_pairs // 2
    sort_h = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    timed(sort_h, keys[:half], payload[:half],
          label=f"lax.sort {half/1e6:.1f}M pairs")
    qtr = n_pairs // 4
    timed(sort_h, keys[:qtr], payload[:qtr],
          label=f"lax.sort {qtr/1e6:.1f}M pairs")
    # segmented: 32 independent sorts of n/32 (the bucketed alternative)
    seg = jnp.reshape(keys, (32, n_pairs // 32))
    segv = jnp.reshape(payload, (32, n_pairs // 32))
    seg_fn = jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=1, num_keys=1))
    timed(seg_fn, seg, segv, label="lax.sort 32 x 65k (segmented)")
    seg2 = jnp.reshape(keys, (1024, n_pairs // 1024))
    segv2 = jnp.reshape(payload, (1024, n_pairs // 1024))
    timed(seg_fn, seg2, segv2, label="lax.sort 1024 x 2048 (per-tile-ish)")
    # gaussian-level sort (131k)
    gk = keys[:131_072]
    gv = payload[:131_072]
    timed(sort_h, gk, gv, label="lax.sort 131k (gaussian-level)")


if __name__ == "__main__":
    main()
