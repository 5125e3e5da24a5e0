"""Per-step dispatch vs scan-chunked steady-state at bench shapes.

The trainer's real loop advances in 50-step lax.scan chunks between
host-action boundaries; bench.py's train_ips dispatches per step over the
tunnel.  This measures both (and the Pallas piece decomposition knobs via
env) so perf work optimizes the number that the pipeline actually sees.

    python scripts/profile_chunked.py            # real chip
    OMFS4D_COMPOSITE_BF16=0 python scripts/profile_chunked.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from omfs4d.core.config import TrainConfig
from omfs4d.io.synthetic import textured_gt_avatar
from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import FlameModel, flame_forward
from omfs4d.ops.camera import look_at_camera
from omfs4d.train.trainer import AvatarTrainer, float_fields


def main(size=512, capacity=131_072, target_alive=65_536, max_per_tile=256):
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=5143))
    W = H = size
    cam = look_at_camera(eye=(0, 0, 0.55), target=(0, 0, 0), fx=1.7 * W,
                         width=W, height=H)
    g0 = textured_gt_avatar(model, capacity=capacity)
    rng = np.random.default_rng(0)
    F = int(np.asarray(g0.alive).sum())
    reps = int(np.ceil(target_alive / F))
    idx = np.tile(np.arange(F), reps)[:target_alive]
    g = g0._replace(
        parent_face=jnp.asarray(np.asarray(g0.parent_face)[idx]),
        mu_local=jnp.asarray(np.asarray(g0.mu_local)[idx]
                             + rng.normal(0, 0.3, (target_alive, 3))
                             .astype(np.float32)),
        quat_local=jnp.asarray(np.asarray(g0.quat_local)[idx]),
        log_scale=jnp.asarray(np.asarray(g0.log_scale)[idx]
                              - np.log(reps ** 0.5)),
        opacity_logit=jnp.asarray(np.asarray(g0.opacity_logit)[idx] - 1.5),
        color=jnp.asarray(np.asarray(g0.color)[idx]),
        sh=jnp.asarray(np.asarray(g0.sh)[idx]),
        alive=jnp.ones(target_alive, bool),
    )
    n_pad = capacity - target_alive
    if n_pad:
        g = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]), g)

    cfg = TrainConfig(batch_frames=1, max_gaussians=capacity)
    tr = AvatarTrainer(np.asarray(model.faces), cfg, W, H,
                       max_per_tile=max_per_tile, use_pallas="always")
    state = tr.init_state(capacity=capacity)
    state = state._replace(gaussians=g,
                           opt_state=tr.optimizer.init(float_fields(g)))
    if cfg.compact_at_refit:
        state = tr.compact_to_alive(state)

    T = 4
    params = {"shape": jnp.zeros(300), "expr": jnp.zeros((T, 100)),
              "jaw_pose": jnp.asarray(rng.normal(0, 0.05, (T, 3)),
                                      jnp.float32)}
    verts = flame_forward(model, params)
    data = {
        "images": jnp.asarray(rng.integers(0, 255, (T, H, W, 3)), jnp.uint8),
        "verts": verts,
        "w2c": jnp.tile(cam.w2c[None], (T, 1, 1)),
        "fx": jnp.full((T,), cam.fx), "fy": jnp.full((T,), cam.fy),
        "cx": jnp.full((T,), cam.cx), "cy": jnp.full((T,), cam.cy),
    }

    # per-step dispatch
    idx0 = jnp.zeros((1,), jnp.int32)
    state, m = tr._step_fn(state, data, idx0)
    jax.block_until_ready(m["loss"])
    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        state, m = tr._step_fn(state, data, jnp.full((1,), i % T, jnp.int32))
    jax.block_until_ready(m["loss"])
    per_step = n / (time.perf_counter() - t0)
    print(f"per-step dispatch : {per_step:8.2f} it/s", flush=True)

    # 50-step scan chunks (the trainer's real loop)
    C = 50
    idxs = jnp.asarray(rng.integers(0, T, size=(C, 1)), jnp.int32)
    state, ms = tr._chunk_fn(state, data, idxs)
    jax.block_until_ready(ms["loss"])
    reps_n = 4
    t0 = time.perf_counter()
    for _ in range(reps_n):
        state, ms = tr._chunk_fn(state, data, idxs)
    jax.block_until_ready(ms["loss"])
    chunked = reps_n * C / (time.perf_counter() - t0)
    print(f"scan-chunked (C=50): {chunked:8.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
