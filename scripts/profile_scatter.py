"""A/B the dpacked -> (N, 9) scatter-add transpose formulations.

The generic row scatter-add measured 4.8 ms at K=256 (8.7 at K=512) — the
single largest piece of the composite VJP.  Candidates:
  a. current: (T, K, 9) row scatter-add into (N, 9) f32
  b. same with mode="promise_in_bounds" (binning guarantees idx in [0, N))
  c. bf16 updates (halve scatter bytes), upcast after
  d. 9 component-wise 1-D scatter-adds (T*K,) -> (N,)
  e. flattened comp-major 1-D scatter: 9*N accumulator, fused index
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


def timed_chain(step, x0, n=30, label=""):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<46s} {dt:8.3f} ms", flush=True)
    return dt


def main(T=1024, K=256, N=131_072):
    rng = np.random.default_rng(0)
    # realistic index distribution: tile-sorted gaussian ids (duplicates,
    # clustered) — a uniform random idx would overstate locality misses
    idx = jnp.asarray(rng.integers(0, N, (T, K)), jnp.int32)
    dp = jnp.asarray(rng.normal(0, 1, (T, 9, K)).astype(np.float32))

    @jax.jit
    def a_row(dp):
        dg9 = jnp.swapaxes(dp, 1, 2)
        out = jnp.zeros((N, 9), jnp.float32).at[idx].add(dg9)
        return dp + out[0, 0] * 1e-12
    timed_chain(a_row, dp, label="a. row scatter (current)")

    @jax.jit
    def b_bounds(dp):
        dg9 = jnp.swapaxes(dp, 1, 2)
        out = jnp.zeros((N, 9), jnp.float32).at[idx].add(
            dg9, mode="promise_in_bounds")
        return dp + out[0, 0] * 1e-12
    timed_chain(b_bounds, dp, label="b. row scatter promise_in_bounds")

    @jax.jit
    def c_bf16(dp):
        dg9 = jnp.swapaxes(dp, 1, 2).astype(jnp.bfloat16)
        out = jnp.zeros((N, 9), jnp.bfloat16).at[idx].add(dg9)
        return dp + out[0, 0].astype(jnp.float32) * 1e-12
    timed_chain(c_bf16, dp, label="c. row scatter bf16")

    flat_idx = idx.reshape(-1)

    @jax.jit
    def d_comp(dp):
        outs = []
        for j in range(9):
            v = dp[:, j, :].reshape(-1)
            outs.append(jnp.zeros((N,), jnp.float32).at[flat_idx].add(v))
        out = jnp.stack(outs, axis=1)
        return dp + out[0, 0] * 1e-12
    timed_chain(d_comp, dp, label="d. 9 component 1-D scatters")

    pos9 = (jnp.arange(9, dtype=jnp.int32)[None, :, None] * N
            + idx[:, None, :]).reshape(-1)

    @jax.jit
    def e_fused(dp):
        out = jnp.zeros((9 * N,), jnp.float32).at[pos9].add(dp.reshape(-1))
        return dp + out[0] * 1e-12
    timed_chain(e_fused, dp, label="e. fused comp-major 1-D scatter")

    # f. row scatter at f32 but with the updates PRE-SUMMED per tile-slot
    # duplicate? (no cheap way) — instead: segment-sum after one extra sort
    key = flat_idx

    @jax.jit
    def f_sortseg(dp):
        v = jnp.swapaxes(dp, 1, 2).reshape(-1, 9)           # (T*K, 9)
        sk, sv = jax.lax.sort((key, v), num_keys=1)
        csum = jnp.cumsum(sv, axis=0)
        starts = jnp.searchsorted(
            sk, jnp.arange(N + 1, dtype=sk.dtype)).astype(jnp.int32)
        z = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), csum])
        out = z[starts[1:]] - z[starts[:-1]]
        return dp + out[0, 0] * 1e-12
    timed_chain(f_sortseg, dp, label="f. sort + cumsum segment-sum")


if __name__ == "__main__":
    main()
