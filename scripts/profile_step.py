"""Break down the 3DGS train step cost on the real chip (perf-wave tooling)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from omfs4d.core.config import TrainConfig
from omfs4d.io.synthetic import textured_gt_avatar
from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import FlameModel, flame_forward
from omfs4d.models.gaussians import bind_to_mesh, eval_colors
from omfs4d.ops.camera import look_at_camera, project_gaussians
from omfs4d.render.rasterize import bin_gaussians, composite_reference
from omfs4d.render.pallas_kernels import composite_pallas
from omfs4d.train.trainer import AvatarTrainer, float_fields
from omfs4d.train.losses import dssim_loss, l1_loss


def timed(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<42s} {dt:8.2f} ms")
    return dt


def main(size=512, capacity=131_072, target_alive=65_536, max_per_tile=512):
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
                             + rng.normal(0, 0.3, (target_alive, 3)).astype(np.float32)),
        quat_local=jnp.asarray(np.asarray(g0.quat_local)[idx]),
        log_scale=jnp.asarray(np.asarray(g0.log_scale)[idx] - np.log(reps ** 0.5)),
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

    params = {"shape": jnp.zeros(300), "expr": jnp.zeros((1, 100))}
    verts = flame_forward(model, params)[0]
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    means, rot, scales, opac, _ = bind_to_mesh(g, verts, model.faces)
    cam_pos = -cam.w2c[:3, :3].T @ cam.w2c[:3, 3]
    cols = eval_colors(g, means, cam_pos)

    # ── pieces ───────────────────────────────────────────────
    proj_fn = jax.jit(lambda m, r, s: project_gaussians(cam, m, r, s))
    proj = proj_fn(means, rot, scales)
    timed(proj_fn, means, rot, scales, label="projection (EWA)")

    bind_fn = jax.jit(lambda gg, v: bind_to_mesh(gg, v, model.faces))
    timed(bind_fn, g, verts, label="bind_to_mesh")

    bin_fn = jax.jit(lambda p, o: bin_gaussians(p, o, W, H, 16, max_per_tile))
    binning = bin_fn(proj, opac)
    timed(bin_fn, proj, opac, label="binning (sort + lists)")
    print(f"{'':<12s} pairs={proj['uv'].shape[0] * 16}, "
          f"counts: mean={float(binning.tile_counts.mean()):.0f} "
          f"max={int(binning.tile_counts.max())}")

    comp_fn = jax.jit(lambda u, c, col, o, b: composite_pallas(
        u, c, col, o, b, W, H, 16))
    timed(comp_fn, proj["uv"], proj["conic"], cols, opac, binning,
          label="composite fwd (pallas)")

    def comp_loss(u, c, col, o, b):
        img, alpha = composite_pallas(u, c, col, o, b, W, H, 16)
        return jnp.sum(img) + jnp.sum(alpha)
    comp_grad = jax.jit(jax.grad(comp_loss, argnums=(0, 1, 2, 3)))
    timed(comp_grad, proj["uv"], proj["conic"], cols, opac, binning,
          label="composite fwd+bwd (pallas)")

    ssim_fn = jax.jit(lambda a, b: dssim_loss(a, b))
    img0 = comp_fn(proj["uv"], proj["conic"], cols, opac, binning)[0]
    timed(ssim_fn, img0, gt, label="dssim fwd")
    ssim_g = jax.jit(jax.grad(lambda a, b: dssim_loss(a, b)))
    timed(ssim_g, img0, gt, label="dssim fwd+bwd")

    # ── full step ────────────────────────────────────────────
    cfg = TrainConfig(batch_frames=1, max_gaussians=capacity)
    trainer = AvatarTrainer(np.asarray(model.faces), cfg, W, H,
                            max_per_tile=max_per_tile, use_pallas="always")
    state = trainer.init_state(capacity=capacity)
    state = state._replace(gaussians=g,
                           opt_state=trainer.optimizer.init(float_fields(g)))
    T = 4
    p4 = {"shape": jnp.zeros(300), "expr": jnp.zeros((T, 100)),
          "jaw_pose": jnp.asarray(rng.normal(0, 0.05, (T, 3)), jnp.float32)}
    verts4 = flame_forward(model, p4)
    data = {
        "images": jnp.asarray(rng.integers(0, 255, (T, H, W, 3)), jnp.uint8),
        "verts": verts4,
        "w2c": jnp.tile(cam.w2c[None], (T, 1, 1)),
        "fx": jnp.full((T,), cam.fx), "fy": jnp.full((T,), cam.fy),
        "cx": jnp.full((T,), cam.cx), "cy": jnp.full((T,), cam.cy),
    }
    idx0 = jnp.zeros((1,), jnp.int32)
    step = lambda s: trainer._step_fn(s, data, idx0)[0]
    state2 = step(state)
    jax.block_until_ready(state2.step)
    t0 = time.perf_counter()
    n = 30
    s = state2
    for _ in range(n):
        s = step(s)
    jax.block_until_ready(s.step)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{'FULL train step':<42s} {dt:8.2f} ms   ({1e3 / dt:.2f} it/s)")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--capacity", type=int, default=131_072)
    ap.add_argument("--alive", type=int, default=65_536)
    ap.add_argument("--max-per-tile", type=int, default=512)
    a = ap.parse_args()
    main(a.size, a.capacity, a.alive, a.max_per_tile)
