"""Sub-piece timings for the train-step costs (binning, composite) with
CHAINED data dependencies: each iteration's input depends on the previous
iteration's output, so executions cannot overlap and the average is a true
per-op latency.  (Repeated independent calls measured nonsense on the
tunneled chip — dispatch pipelining hid the device time.)
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
from omfs4d.render.pallas_kernels import _call_bwd, _call_fwd, composite_pallas


def make_scene(size, capacity, alive, max_per_tile, tile=16, seed=0):
    """Shared synthetic-scene setup (proj dict, colors, opacity, binning).

    One construction for every sub-benchmark so max_per_tile/alive always
    match across comparisons (they are printed with each section header)."""
    rng = np.random.default_rng(seed)
    N = capacity
    uv = rng.uniform(0, size, (N, 2)).astype(np.float32)
    radius = np.abs(rng.normal(8.0, 6.0, (N,))).astype(np.float32) + 1.0
    depth = rng.uniform(0.1, 2.0, (N,)).astype(np.float32)
    in_front = np.zeros((N,), bool)
    in_front[:alive] = True
    opac = np.where(in_front, 0.7, 0.0).astype(np.float32)
    conic = np.stack([1.0 / radius**2, np.zeros_like(radius),
                      1.0 / radius**2], axis=1).astype(np.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    proj = {
        "uv": jnp.asarray(uv),
        "radius": jnp.asarray(radius),
        "depth": jnp.asarray(depth),
        "in_front": jnp.asarray(in_front),
        "conic": jnp.asarray(conic),
    }
    opacity = jnp.asarray(opac)
    binning = jax.jit(lambda p, o: bin_gaussians(
        p, o, size, size, tile, max_per_tile))(proj, opacity)
    return proj, colors, opacity, binning, rng


def timed_chain(step, x0, n=30, label=""):
    """step: x -> x (same structure).  Chained: no overlap possible."""
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<46s} {dt:8.3f} ms", flush=True)
    return dt


def main(size=512, capacity=131_072, alive=65_536, max_per_tile=512,
         tile=16):
    W = H = size
    grid_w = (size + tile - 1) // tile
    num_tiles = grid_w * grid_w
    N = capacity
    proj, colors, opacity, binning, rng = make_scene(
        size, capacity, alive, max_per_tile, tile)
    conic = proj["conic"]

    print(f"== binning (N={N}, alive={alive}, tiles={num_tiles}, "
          f"K={max_per_tile}) ==")

    def chain_bin(two_class_min_n):
        @jax.jit
        def step(p):
            b = bin_gaussians(p, opacity, W, H, tile, max_per_tile,
                              two_class_min_n=two_class_min_n)
            # fold a scalar of the output back into the input
            eps = (b.tile_counts.sum() % 7).astype(jnp.float32) * 1e-12
            return {**p, "uv": p["uv"] + eps}
        return step

    timed_chain(chain_bin(4096), proj, label="bin_gaussians two-class")
    timed_chain(chain_bin(1 << 30), proj, label="bin_gaussians uniform-16")

    m = max(1024, int(round(N * 0.125)))

    @jax.jit
    def chain_topk(r):
        vals, _ = jax.lax.top_k(r, m)
        return r + vals[0] * 1e-12
    timed_chain(chain_topk, proj["radius"], label=f"top_k(N, m={m})")

    for n_pairs in (N * 4 + m * 16, N * 16):
        keys = jnp.asarray(
            rng.integers(0, np.int32(2**31 - 1), (n_pairs,)), jnp.int32)
        payload = jnp.asarray(rng.integers(0, N, (n_pairs,)), jnp.int32)

        @jax.jit
        def chain_sort(kv):
            k, v = kv
            sk, sv = jax.lax.sort((k, v), num_keys=1)
            return (sk ^ v, sv)        # depends on output, same distribution
        timed_chain(chain_sort, (keys, payload),
                    label=f"lax.sort key+payload ({n_pairs} pairs)")

    print(f"== composite (T={num_tiles}, K={max_per_tile}) ==")
    T, K = binning.tile_lists.shape
    P = tile * tile

    @jax.jit
    def chain_fwd(u):
        img, alpha = composite_pallas(u, conic, colors, opacity, binning,
                                      W, H, tile)
        return u + img[0, 0, 0] * 1e-12
    timed_chain(chain_fwd, proj["uv"], label="composite fwd (incl. pack)")

    def pack(u):
        params9 = jnp.concatenate([u, conic, colors, opacity[:, None]],
                                  axis=1)
        g9 = params9[binning.tile_lists]
        k_valid = (jnp.arange(K, dtype=jnp.int32)[None, :]
                   < binning.tile_counts[:, None])
        g9 = jnp.concatenate(
            [g9[..., :8], jnp.where(k_valid, g9[..., 8], 0.0)[..., None]],
            axis=-1)
        return jnp.swapaxes(g9, 1, 2)

    @jax.jit
    def chain_pack(u):
        # fold a reduction of the FULL packed output back into the chain —
        # consuming only one element lets XLA's slice-of-gather shrink the
        # (T, 9, K) gather to a near-trivial computation
        return u + jnp.sum(pack(u)) * 1e-12
    timed_chain(chain_pack, proj["uv"], label="packing (concat+gather+swap)")

    packed0 = jax.jit(pack)(proj["uv"])
    base0 = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def chain_fwd_kernel(p):
        col, alp = _call_fwd(p, base0, tile, grid_w, False)
        return p + col[0, 0, 0] * 1e-12
    timed_chain(chain_fwd_kernel, packed0, label="fwd pallas kernel only")

    dcol = jnp.ones((T, 3, P), jnp.float32)
    dalpha = jnp.ones((T, 1, P), jnp.float32)

    @jax.jit
    def chain_bwd_kernel(p):
        dp = _call_bwd(p, base0, dcol, dalpha, tile, grid_w, False)
        return p + dp[0, 0, 0] * 1e-12
    timed_chain(chain_bwd_kernel, packed0, label="bwd pallas kernel only")

    @jax.jit
    def chain_scatter(dp):
        dg9 = jnp.swapaxes(dp, 1, 2)
        out = jnp.zeros((N, 9), jnp.float32).at[binning.tile_lists].add(dg9)
        return dp + out[0, 0] * 1e-12
    dpacked0 = jax.jit(
        lambda p: _call_bwd(p, base0, dcol, dalpha, tile, grid_w, False))(packed0)
    timed_chain(chain_scatter, dpacked0, label="scatter-add unpack")

    grad_fn = jax.grad(
        lambda u: jnp.sum(
            composite_pallas(u, conic, colors, opacity, binning,
                             W, H, tile)[0]))

    @jax.jit
    def chain_grad(u):
        return u + grad_fn(u) * 1e-12
    timed_chain(chain_grad, proj["uv"], label="composite fwd+bwd (full VJP)")


def grad_map_ab(size=512, capacity=131_072, alive=65_536, max_per_tile=512,
                tile=16):
    """A/B the structured gather transpose vs the generic scatter-add."""
    W = H = size
    grid_w = (size + tile - 1) // tile
    rng = np.random.default_rng(0)
    N = capacity
    uv = rng.uniform(0, size, (N, 2)).astype(np.float32)
    radius = np.abs(rng.normal(8.0, 6.0, (N,))).astype(np.float32) + 1.0
    conic = np.stack([1.0 / radius**2, np.zeros_like(radius),
                      1.0 / radius**2], axis=1).astype(np.float32)
    in_front = np.zeros((N,), bool)
    in_front[:alive] = True
    opac = jnp.asarray(np.where(in_front, 0.7, 0.0).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    proj = {
        "uv": jnp.asarray(uv),
        "radius": jnp.asarray(radius),
        "depth": jnp.asarray(rng.uniform(0.1, 2.0, (N,)).astype(np.float32)),
        "in_front": jnp.asarray(in_front),
        "conic": jnp.asarray(conic),
    }

    for gmap in (False, True):
        @jax.jit
        def chain_bin(p, gmap=gmap):
            b = bin_gaussians(p, opac, W, H, tile, max_per_tile,
                              build_grad_map=gmap)
            eps = (b.tile_counts.sum() % 7).astype(jnp.float32) * 1e-12
            return {**p, "uv": p["uv"] + eps}
        timed_chain(chain_bin, proj, label=f"bin_gaussians grad_map={gmap}")

    for gmap in (False, True):
        binning = jax.jit(lambda p, o: bin_gaussians(
            p, o, W, H, tile, max_per_tile, build_grad_map=gmap))(proj, opac)
        grad_fn = jax.grad(
            lambda u: jnp.sum(
                composite_pallas(u, conic, colors, opac, binning,
                                 W, H, tile)[0]))

        @jax.jit
        def chain_grad(u, grad_fn=grad_fn):
            return u + grad_fn(u) * 1e-12
        timed_chain(chain_grad, proj["uv"],
                    label=f"composite VJP grad_map={gmap}")

    # pieces of the map path
    binning = jax.jit(lambda p, o: bin_gaussians(
        p, o, W, H, tile, max_per_tile, build_grad_map=True))(proj, opac)
    gm = binning.grad_map
    T, K = binning.tile_lists.shape
    n_pairs = N * 4 + gm["pair_pos_large"].shape[0] * 16
    slot = jnp.asarray(rng.integers(-1, T * K, (n_pairs,)), jnp.int32)
    perm = jnp.asarray(rng.permutation(n_pairs).astype(np.int32))

    @jax.jit
    def chain_invperm(s):
        out = jnp.zeros((n_pairs,), jnp.int32).at[perm].set(
            s, unique_indices=True)
        return s ^ out
    timed_chain(chain_invperm, slot, label="1:1 inverse-perm scatter")

    dflat = jnp.asarray(rng.uniform(0, 1, (T * K, 9)).astype(np.float32))

    @jax.jit
    def chain_takesum(df):
        def take_sum(pos):
            okm = pos >= 0
            v = df[jnp.clip(pos, 0)]
            return jnp.where(okm[..., None], v, 0.0).sum(axis=1)
        d = take_sum(gm["pair_pos_small"])
        d = d.at[gm["large_sel"]].add(take_sum(gm["pair_pos_large"]),
                                      unique_indices=True)
        return df + d[0] * 1e-12
    timed_chain(chain_takesum, dflat, label="bwd take_sum (window gathers)")


def pack_ab(size=512, capacity=131_072, alive=65_536, max_per_tile=256,
            tile=16):
    """A/B alternative formulations of the pack gather + its scatter-add
    transpose (the dominant VJP cost): row-gather of a fused (N, 9) table
    vs 9 component-wise 1-D gathers vs one flattened 1-D gather."""
    W = H = size
    grid_w = (size + tile - 1) // tile
    N = capacity
    proj, colors, opac, binning, rng = make_scene(
        size, capacity, alive, max_per_tile, tile)
    idx = binning.tile_lists
    T, K = idx.shape
    k_valid = (jnp.arange(K, dtype=jnp.int32)[None, :]
               < binning.tile_counts[:, None])
    print(f"== pack A/B (T={T}, K={K}, N={N}) ==")

    def pack_row(u):
        params9 = jnp.concatenate(
            [u, proj["conic"], colors, opac[:, None]], axis=1)
        g9 = params9[idx]
        g9 = jnp.concatenate(
            [g9[..., :8], jnp.where(k_valid, g9[..., 8], 0.0)[..., None]],
            axis=-1)
        return jnp.swapaxes(g9, 1, 2)                     # (T, 9, K)

    def pack_comp(u):
        comps = [u[:, 0], u[:, 1], proj["conic"][:, 0], proj["conic"][:, 1],
                 proj["conic"][:, 2], colors[:, 0], colors[:, 1],
                 colors[:, 2], opac]
        g = [c[idx] for c in comps]                       # 9 x (T, K)
        g[8] = jnp.where(k_valid, g[8], 0.0)
        return jnp.stack(g, axis=1)                       # (T, 9, K)

    def pack_flat(u):
        params9 = jnp.concatenate(
            [u, proj["conic"], colors, opac[:, None]], axis=1)
        flat = params9.T.reshape(-1)                      # comp-major (9*N,)
        pos = (jnp.arange(9, dtype=jnp.int32)[None, :, None] * N
               + idx[:, None, :])                         # (T, 9, K)
        g = flat[pos]
        return g.at[:, 8, :].set(jnp.where(k_valid, g[:, 8, :], 0.0))

    for name, fn in (("row-gather (current)", pack_row),
                     ("9 component gathers", pack_comp),
                     ("flattened comp-major gather", pack_flat)):
        @jax.jit
        def chain_f(u, fn=fn):
            # sum over the FULL output keeps the whole gather live (a
            # one-element consumer lets XLA shrink it via slice-of-gather)
            return u + jnp.sum(fn(u)) * 1e-12
        try:
            timed_chain(chain_f, proj["uv"], label=f"pack fwd: {name}")
        except Exception as e:  # noqa: BLE001
            print(f"pack fwd: {name} FAILED: {type(e).__name__}")

        g = jax.grad(lambda u, fn=fn: jnp.sum(fn(u) ** 2))

        @jax.jit
        def chain_g(u, g=g):
            return u + g(u) * 1e-12
        try:
            timed_chain(chain_g, proj["uv"], label=f"pack VJP: {name}")
        except Exception as e:  # noqa: BLE001
            print(f"pack VJP: {name} FAILED: {type(e).__name__}")

    # full composite VJP with each pack (end-to-end effect)
    from omfs4d.render.pallas_kernels import composite_tiles

    for name, fn in (("row-gather (current)", pack_row),
                     ("9 component gathers", pack_comp)):
        def loss(u, fn=fn):
            col, alp = composite_tiles(fn(u), jnp.zeros((1,), jnp.int32),
                                       tile, grid_w, False)
            return jnp.sum(col)

        gfull = jax.grad(loss)

        @jax.jit
        def chain_full(u, gfull=gfull):
            return u + gfull(u) * 1e-12
        try:
            timed_chain(chain_full, proj["uv"],
                        label=f"composite full VJP: {name}")
        except Exception as e:  # noqa: BLE001
            print(f"composite full VJP: {name} FAILED: {type(e).__name__}")


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "ab":
        grad_map_ab()
    elif len(_s.argv) > 1 and _s.argv[1] == "pack":
        pack_ab()
    else:
        main()
