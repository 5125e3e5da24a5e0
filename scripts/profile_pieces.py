"""Chained per-piece decomposition of the train step at the EXACT bench.py
shapes (textured avatar, 65k alive / 131k capacity, 512^2, K=256).

Every piece is timed with chained data dependencies (each iteration's input
depends on the previous output) so dispatch pipelining on the tunneled chip
cannot hide device time.  This is the measurement that drives the perf
waves — see BENCH_NOTES.md.
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

from omfs4d.core.config import TrainConfig
from omfs4d.io.synthetic import textured_gt_avatar
from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import FlameModel, flame_forward
from omfs4d.models.gaussians import bind_to_mesh, eval_colors
from omfs4d.ops.camera import look_at_camera, project_gaussians
from omfs4d.render.rasterize import bin_gaussians
from omfs4d.render.pallas_kernels import composite_pallas
from omfs4d.train.trainer import AvatarTrainer, float_fields
from omfs4d.train.losses import dssim_loss, l1_loss


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


def bench_scene(size=512, capacity=131_072, target_alive=65_536):
    """Same avatar construction as bench.py."""
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
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((1, 100))})[0]
    return model, cam, g, verts, rng


def main(size=512, capacity=131_072, target_alive=65_536, max_per_tile=256,
         tile=16):
    W = H = size
    model, cam, g, verts, rng = bench_scene(size, capacity, target_alive)
    faces = jnp.asarray(model.faces, jnp.int32)
    cam_pos = -cam.w2c[:3, :3].T @ cam.w2c[:3, 3]
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    # full train step baseline (bench.py's metric)
    cfg = TrainConfig(batch_frames=1, max_gaussians=capacity)
    trainer = AvatarTrainer(np.asarray(model.faces), cfg, W, H,
                            max_per_tile=max_per_tile, use_pallas="always")
    # the step donates its state buffers — give it a COPY so `g` survives
    # for the piece benchmarks below
    g_copy = jax.tree_util.tree_map(jnp.copy, g)
    state = trainer.init_state(capacity=capacity)
    state = state._replace(
        gaussians=g_copy,
        opt_state=trainer.optimizer.init(float_fields(g_copy)))
    data = {
        "images": jnp.asarray(
            rng.integers(0, 255, (2, H, W, 3)), jnp.uint8),
        "verts": jnp.stack([verts, verts]),
        "w2c": jnp.tile(cam.w2c[None], (2, 1, 1)),
        "fx": jnp.full((2,), cam.fx), "fy": jnp.full((2,), cam.fy),
        "cx": jnp.full((2,), cam.cx), "cy": jnp.full((2,), cam.cy),
    }

    def step_chain(st):
        st, m = trainer._step_fn(st, data, jnp.zeros((1,), jnp.int32))
        return st
    t_step = timed_chain(step_chain, state, n=40, label="FULL train step")
    print(f"  = {1e3 / t_step:.1f} it/s", flush=True)

    # ── bind + colors VJP ────────────────────────────────────
    def bind_loss(mu):
        gg = g._replace(mu_local=mu)
        means, rot, scales, opac, _ = bind_to_mesh(gg, verts, faces)
        cols = eval_colors(gg, means, cam_pos)
        return (jnp.sum(means) + jnp.sum(rot) + jnp.sum(scales)
                + jnp.sum(opac) + jnp.sum(cols))
    bind_g = jax.jit(jax.grad(bind_loss))
    timed_chain(lambda mu: mu + bind_g(mu) * 1e-12, g.mu_local,
                label="bind_to_mesh + eval_colors VJP")

    means, rot, scales, opac, _ = jax.jit(
        lambda gg: bind_to_mesh(gg, verts, faces))(g)
    cols = jax.jit(lambda gg, m: eval_colors(gg, m, cam_pos))(g, means)

    # ── projection VJP ───────────────────────────────────────
    def proj_loss(m):
        p = project_gaussians(cam, m, rot, scales)
        return jnp.sum(p["uv"]) + jnp.sum(p["conic"]) + jnp.sum(p["depth"])
    proj_g = jax.jit(jax.grad(proj_loss))
    timed_chain(lambda m: m + proj_g(m) * 1e-12, means,
                label="projection VJP")

    proj = jax.jit(lambda m: project_gaussians(cam, m, rot, scales))(means)

    # ── binning fwd (+ sub-pieces) ───────────────────────────
    @jax.jit
    def bin_chain(p):
        b = bin_gaussians(p, opac, W, H, tile, max_per_tile)
        eps = (b.tile_counts.sum() % 7).astype(jnp.float32) * 1e-12
        return {**p, "uv": p["uv"] + eps}
    timed_chain(bin_chain, dict(proj), label="binning fwd")

    n = capacity
    m_large = max(1024, int(round(n * 0.125)))

    @jax.jit
    def topk_chain(r):
        vals, _ = jax.lax.approx_max_k(r, m_large)
        return r + vals[0] * 1e-12
    timed_chain(topk_chain, proj["radius"],
                label=f"approx_max_k(N, m={m_large})")

    binning = jax.jit(lambda p, o: bin_gaussians(
        p, o, W, H, tile, max_per_tile))(proj, opac)
    n_tiles = ((W + tile - 1) // tile) * ((H + tile - 1) // tile)
    print(f"  (pairs sorted: small {n * 4}, large {m_large * 16}; "
          f"tiles {n_tiles}, K {max_per_tile})", flush=True)

    # ── composite full VJP (pallas + hybrid pack) ────────────
    grad_fn = jax.grad(
        lambda u: jnp.sum(
            composite_pallas(u, proj["conic"], cols, opac, binning,
                             W, H, tile)[0]))

    @jax.jit
    def comp_chain(u):
        return u + grad_fn(u) * 1e-12
    timed_chain(comp_chain, proj["uv"], label="composite full VJP")

    # ── dssim + l1 VJP ───────────────────────────────────────
    img0 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_img(x):
        return 0.8 * l1_loss(x, gt) + 0.2 * dssim_loss(x, gt)
    ssim_g = jax.jit(jax.grad(loss_img))
    timed_chain(lambda x: x + ssim_g(x) * 1e-3, img0,
                label="l1+dssim VJP")

    # ── optimizer update ─────────────────────────────────────
    fp0 = float_fields(g)
    opt_state = trainer.optimizer.init(fp0)

    @jax.jit
    def adam_chain(fp):
        grads = jax.tree_util.tree_map(lambda x: x * 1e-12, fp)
        updates, _ = trainer.optimizer.update(grads, opt_state, fp)
        import optax
        return optax.apply_updates(fp, updates)
    timed_chain(adam_chain, fp0, label="adam update (all params)")


if __name__ == "__main__":
    main()
