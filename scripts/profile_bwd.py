"""Isolate the composite-backward cost: pallas bwd kernel vs gather bwd."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from omfs4d.io.synthetic import textured_gt_avatar
from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import FlameModel, flame_forward
from omfs4d.models.gaussians import bind_to_mesh, eval_colors, gather_rows
from omfs4d.ops.camera import look_at_camera, project_gaussians
from omfs4d.render.rasterize import bin_gaussians
from omfs4d.render import pallas_kernels as pk


def timed(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<46s} {dt:8.2f} ms")
    return dt


def main(size=512, capacity=131_072, target_alive=65_536, max_per_tile=512):
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=5143))
    W = H = size
    tile = 16
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
    means, rot, scales, opac, _ = bind_to_mesh(g, verts, model.faces)
    cam_pos = -cam.w2c[:3, :3].T @ cam.w2c[:3, 3]
    cols = eval_colors(g, means, cam_pos)
    proj = jax.jit(lambda m, r, s: project_gaussians(cam, m, r, s))(means, rot, scales)
    binning = jax.jit(lambda p, o: bin_gaussians(p, o, W, H, tile, max_per_tile))(proj, opac)

    grid_w = (W + tile - 1) // tile
    T = ((W + tile - 1) // tile) * ((H + tile - 1) // tile)
    K = max_per_tile
    P = tile * tile

    # build packed exactly as composite_pallas does
    def build_packed(uv, conic, colors, opacity):
        params9 = jnp.concatenate([uv, conic, colors, opacity[:, None]], axis=1)
        g9 = gather_rows(params9, binning.tile_lists)
        k_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < binning.tile_counts[:, None]
        g9 = jnp.concatenate(
            [g9[..., :8], jnp.where(k_valid, g9[..., 8], 0.0)[..., None]], axis=-1)
        return jnp.concatenate([
            jnp.swapaxes(g9, 1, 2),
            jnp.zeros((T, pk.N_ROWS - 9, K), jnp.float32)], axis=1)

    build_jit = jax.jit(build_packed)
    packed = build_jit(proj["uv"], proj["conic"], cols, opac)
    timed(build_jit, proj["uv"], proj["conic"], cols, opac,
          label="pack (gather fwd + transpose)")

    fwd = jax.jit(lambda p: pk._call_fwd(p, jnp.zeros((1,), jnp.int32), tile, grid_w, False))
    col, alp = fwd(packed)
    timed(fwd, packed, label="pallas fwd kernel")

    bwd = jax.jit(lambda p, dc, da: pk._call_bwd(p, jnp.zeros((1,), jnp.int32), dc, da, tile, grid_w, False))
    dcol = jnp.ones_like(col)
    dalpha = jnp.ones_like(alp)
    timed(bwd, packed, dcol, dalpha, label="pallas bwd kernel")

    # gather_rows backward alone (via grad of sum through gather)
    def gsum(uv, conic, colors, opacity):
        return jnp.sum(build_packed(uv, conic, colors, opacity))
    ggrad = jax.jit(jax.grad(gsum, argnums=(0, 1, 2, 3)))
    timed(ggrad, proj["uv"], proj["conic"], cols, opac,
          label="pack fwd+bwd (gather segment-reduce)")

    # full composite grad (= what the train step pays)
    def closs(uv, conic, colors, opacity):
        img, alpha = pk.composite_pallas(uv, conic, colors, opacity, binning,
                                         W, H, tile)
        return jnp.sum(img) + jnp.sum(alpha)
    cgrad = jax.jit(jax.grad(closs, argnums=(0, 1, 2, 3)))
    timed(cgrad, proj["uv"], proj["conic"], cols, opac,
          label="composite fwd+bwd TOTAL")


if __name__ == "__main__":
    main()
