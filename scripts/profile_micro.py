"""Sub-piece timings for the two dominant train-step costs (binning,
composite bwd) — decides where the next perf wave goes.

Pieces are timed with their inputs pre-staged on device so each number is
one op's cost, not a chain.  Run on the real chip.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from omfs4d.render.rasterize import bin_gaussians
from omfs4d.render.pallas_kernels import (
    _call_bwd,
    _call_fwd,
    composite_pallas,
)


def timed(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<46s} {dt:8.3f} ms", flush=True)
    return dt


def main(size=512, capacity=131_072, alive=65_536, max_per_tile=512,
         tile=16):
    W = H = size
    grid_w = grid_h = (size + tile - 1) // tile
    num_tiles = grid_w * grid_h
    rng = np.random.default_rng(0)
    N = capacity

    # synthetic projected gaussians matching bench.py's distribution:
    # `alive` real ones spread over the image, the rest culled
    uv = rng.uniform(0, size, (N, 2)).astype(np.float32)
    radius = np.abs(rng.normal(8.0, 6.0, (N,))).astype(np.float32) + 1.0
    depth = rng.uniform(0.1, 2.0, (N,)).astype(np.float32)
    in_front = np.zeros((N,), bool)
    in_front[:alive] = True
    opac = np.where(in_front, 0.7, 0.0).astype(np.float32)
    conic = np.stack([1.0 / radius**2, np.zeros_like(radius),
                      1.0 / radius**2], axis=1).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    proj = {
        "uv": jnp.asarray(uv),
        "radius": jnp.asarray(radius),
        "depth": jnp.asarray(depth),
        "in_front": jnp.asarray(in_front),
        "conic": jnp.asarray(conic),
    }
    opacity = jnp.asarray(opac)

    # ── binning sub-pieces ───────────────────────────────────
    print(f"== binning (N={N}, alive={alive}, tiles={num_tiles}) ==")
    bin_full = jax.jit(lambda p, o: bin_gaussians(
        p, o, W, H, tile, max_per_tile))
    binning = bin_full(proj, opacity)
    timed(bin_full, proj, opacity, label="bin_gaussians FULL (two-class)")

    bin_uni = jax.jit(lambda p, o: bin_gaussians(
        p, o, W, H, tile, max_per_tile, two_class_min_n=1 << 30))
    timed(bin_uni, proj, opacity, label="bin_gaussians uniform-16 window")

    m = max(1024, int(round(N * 0.125)))
    topk = jax.jit(lambda r: jax.lax.top_k(r, m))
    timed(topk, proj["radius"], label=f"top_k(N, m={m}) alone")

    # pair expansion + sort + lists, isolated at the two-class pair count
    n_pairs_s = N * 4
    n_pairs_l = m * 16
    n_pairs = n_pairs_s + n_pairs_l
    keys = jnp.asarray(
        rng.integers(0, np.int32(2**31 - 1), (n_pairs,)), jnp.int32)
    payload = jnp.asarray(rng.integers(0, N, (n_pairs,)), jnp.int32)
    sort2 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    timed(sort2, keys, payload, label=f"lax.sort key+payload ({n_pairs} pairs)")

    sort1 = jax.jit(lambda k: jax.lax.sort(k))
    timed(sort1, keys, label=f"lax.sort key only   ({n_pairs} pairs)")

    keys_u = jnp.asarray(
        rng.integers(0, np.int32(2**31 - 1), (N * 16,)), jnp.int32)
    pay_u = jnp.asarray(rng.integers(0, N, (N * 16,)), jnp.int32)
    timed(sort2, keys_u, pay_u, label=f"lax.sort key+payload ({N*16} pairs)")

    s_key, s_idx = sort2(keys, payload)

    def lists_only(sk, si):
        s_tile = sk >> 20
        starts = jnp.searchsorted(
            s_tile, jnp.arange(num_tiles + 1, dtype=s_tile.dtype),
            side="left").astype(jnp.int32)
        counts_raw = starts[1:] - starts[:-1]
        pos = starts[:-1, None] + jnp.arange(max_per_tile,
                                             dtype=jnp.int32)[None, :]
        valid = (jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
                 < counts_raw[:, None])
        return jnp.where(valid, si[jnp.clip(pos, 0, n_pairs - 1)], 0)

    timed(jax.jit(lists_only), s_key, s_idx,
          label="searchsorted + tile_lists gather")

    # ── composite sub-pieces ─────────────────────────────────
    print(f"== composite (T={num_tiles}, K={max_per_tile}) ==")
    T = num_tiles
    K = max_per_tile
    P = tile * tile

    comp = jax.jit(lambda u, c, col, o, b: composite_pallas(
        u, c, col, o, b, W, H, tile))
    cols_j = jnp.asarray(colors)
    timed(comp, proj["uv"], conic, cols_j, opacity, binning,
          label="composite_pallas fwd (incl. pack)")

    def pack_only(u, c, col, o, b):
        params9 = jnp.concatenate([u, c, col, o[:, None]], axis=1)
        g9 = params9[b.tile_lists]
        k_valid = (jnp.arange(K, dtype=jnp.int32)[None, :]
                   < b.tile_counts[:, None])
        g9 = jnp.concatenate(
            [g9[..., :8], jnp.where(k_valid, g9[..., 8], 0.0)[..., None]],
            axis=-1)
        return jnp.swapaxes(g9, 1, 2)

    pack_j = jax.jit(pack_only)
    packed = pack_j(proj["uv"], conic, cols_j, opacity, binning)
    timed(pack_j, proj["uv"], conic, cols_j, opacity, binning,
          label="packing (concat+gather+swap) only")

    fwd_k = jax.jit(lambda p: _call_fwd(p, tile, grid_w, False))
    timed(fwd_k, packed, label="fwd pallas kernel only")

    dcol = jnp.ones((T, 3, P), jnp.float32)
    dalpha = jnp.ones((T, 1, P), jnp.float32)
    bwd_k = jax.jit(lambda p, dc, da: _call_bwd(p, dc, da, tile, grid_w,
                                                False))
    timed(bwd_k, packed, dcol, dalpha, label="bwd pallas kernel only")

    def unpack_grad(dpacked, b):
        # the packing transpose: scatter-add back to (N, 9)
        dg9 = jnp.swapaxes(dpacked, 1, 2)                  # (T, K, 9)
        return jnp.zeros((N, 9), jnp.float32).at[b.tile_lists].add(dg9)

    dpacked = bwd_k(packed, dcol, dalpha)
    timed(jax.jit(unpack_grad), dpacked, binning,
          label="scatter-add unpack (gather transpose)")

    full_grad = jax.jit(jax.grad(
        lambda u, c, col, o: jnp.sum(
            composite_pallas(u, c, col, o, binning, W, H, tile)[0]),
        argnums=(0, 1, 2, 3)))
    timed(full_grad, proj["uv"], conic, cols_j, opacity,
          label="composite fwd+bwd via autodiff (whole)")


if __name__ == "__main__":
    main()
