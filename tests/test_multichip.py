"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

N_DEV = len(jax.devices())


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple (virtual) devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(N_DEV, 4))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    img = jax.jit(fn)(*example_args)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple (virtual) devices")
def test_dp_gradients_match_single_device():
    """DP-sharded training step must equal the replicated step numerically."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.train.trainer import AvatarTrainer

    W = H = 32
    n = 2
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    cfg = TrainConfig(batch_frames=n, max_gaussians=1024)
    trainer = AvatarTrainer(np.asarray(model.faces), cfg, W, H,
                            max_per_tile=64, use_pallas="never")
    state = trainer.init_state(capacity=1024)

    rng = np.random.default_rng(0)
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((n, 100))})
    from omfs4d.ops.camera import look_at_camera
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=50.0,
                         width=W, height=H)
    data = {
        "images": jnp.asarray(rng.integers(0, 255, (n, H, W, 3)), jnp.uint8),
        "verts": verts,
        "w2c": jnp.tile(cam.w2c[None], (n, 1, 1)),
        "fx": jnp.full((n,), cam.fx), "fy": jnp.full((n,), cam.fy),
        "cx": jnp.full((n,), cam.cx), "cy": jnp.full((n,), cam.cy),
    }
    idx = jnp.arange(n, dtype=jnp.int32)

    # single-device result
    s1, m1 = jax.jit(trainer._train_step)(state, data, idx)

    # sharded result
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
    repl = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))
    data_sh = {k: jax.device_put(v, sh) for k, v in data.items()}
    state_r = jax.device_put(state, repl)
    s2, m2 = jax.jit(
        trainer._train_step,
        in_shardings=(repl, {k: sh for k in data}, repl),
        out_shardings=(repl, repl),
    )(state_r, data_sh, jax.device_put(idx, repl))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(s1.gaussians.color), np.asarray(s2.gaussians.color),
        atol=1e-4,
    )


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple (virtual) devices")
def test_tile_sharded_rasterize_matches_single():
    """Spatially sharded rendering must be pixel-identical to single-device."""
    from jax.sharding import Mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.render.rasterize import rasterize
    from omfs4d.parallel.shard import rasterize_tile_sharded
    from tests.test_rasterize import random_scene

    cam = look_at_camera(eye=(0, 0, -2.5), target=(0, 0, 0), fx=200.0,
                         width=64, height=64)
    means, rot, scales, opacity, colors = random_scene(80, seed=5)
    args = tuple(jnp.asarray(a) for a in (means, rot, scales, opacity, colors))

    img1, aux1 = rasterize(*args, cam, 64, 64, max_per_tile=128,
                           backend="never")

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("tile",))
    img2, aux2 = jax.jit(
        lambda *a: rasterize_tile_sharded(*a, cam, 64, 64, mesh=mesh,
                                          max_per_tile=128)
    )(*args)

    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux1["alpha"]),
                               np.asarray(aux2["alpha"]), atol=1e-5)


@pytest.mark.skipif(N_DEV < 4, reason="needs 4+ virtual devices")
def test_gaussian_sharded_rasterize_matches_single():
    """Depth-sliced gaussian-axis sharding must match single-device exactly
    (no per-tile overflow => identical ordering and compositing)."""
    from jax.sharding import Mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.render.rasterize import rasterize
    from omfs4d.parallel.shard import render_gaussian_sharded
    from tests.test_rasterize import random_scene

    cam = look_at_camera(eye=(0, 0, -2.5), target=(0, 0, 0), fx=200.0,
                         width=64, height=64)
    means, rot, scales, opacity, colors = random_scene(96, seed=11)
    args = tuple(jnp.asarray(a) for a in (means, rot, scales, opacity, colors))

    img1, aux1 = rasterize(*args, cam, 64, 64, max_per_tile=128,
                           backend="never")

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("gauss",))
    img2, aux2 = jax.jit(
        lambda *a: render_gaussian_sharded(*a, cam, 64, 64, mesh=mesh,
                                           max_per_tile=128)
    )(*args)

    assert int(aux2["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux1["alpha"]),
                               np.asarray(aux2["alpha"]), atol=2e-4)


@pytest.mark.skipif(N_DEV < 4, reason="needs 4+ virtual devices")
def test_gaussian_sharded_gradients_flow():
    """The depth-sliced sharded renderer is differentiable end-to-end
    (gradients ride through the all_to_all and the slice selection)."""
    from jax.sharding import Mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.parallel.shard import render_gaussian_sharded
    from tests.test_rasterize import random_scene

    cam = look_at_camera(eye=(0, 0, -2.5), target=(0, 0, 0), fx=150.0,
                         width=32, height=32)
    means, rot, scales, opacity, colors = random_scene(64, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("gauss",))

    def loss(c, o):
        img, _ = render_gaussian_sharded(
            jnp.asarray(means), jnp.asarray(rot), jnp.asarray(scales),
            o, c, cam, 32, 32, mesh=mesh, max_per_tile=64)
        return jnp.sum(img ** 2)

    gc, go = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.asarray(colors), jnp.asarray(opacity))
    assert np.isfinite(np.asarray(gc)).all() and np.abs(np.asarray(gc)).max() > 0
    assert np.isfinite(np.asarray(go)).all() and np.abs(np.asarray(go)).max() > 0


@pytest.mark.skipif(N_DEV < 4, reason="needs 4+ virtual devices")
def test_gaussian_sharded_training_matches_unsharded():
    """Model-parallel avatar training: loss AND per-gaussian gradients over
    a 4-way sharded cloud equal the single-device values."""
    from jax.sharding import Mesh
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.models.gaussians import bind_to_mesh, eval_colors
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.parallel.shard import avatar_loss_gaussian_sharded
    from omfs4d.render.rasterize import rasterize
    from omfs4d.train.trainer import float_fields, with_floats
    from omfs4d.io.synthetic import textured_gt_avatar

    S = 32
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    g = textured_gt_avatar(model, capacity=796)  # hull gives 796 faces
    cap4 = (g.capacity // 4) * 4
    g = jax.tree_util.tree_map(lambda a: a[:cap4], g)
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=1.6 * S,
                         width=S, height=S)
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((1, 100))})[0]
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (S, S, 3)), jnp.float32)

    # unsharded loss + grads
    def loss_single(fp):
        gg = with_floats(g, fp)
        means, rot, scales, opac, _ = bind_to_mesh(gg, verts, model.faces)
        cam_pos = -cam.w2c[:3, :3].T @ cam.w2c[:3, 3]
        cols = eval_colors(gg, means, cam_pos)
        img, aux = rasterize(means, rot, scales, opac, cols, cam, S, S,
                             max_per_tile=1024, backend="never")
        return jnp.mean(jnp.abs(img - gt)), aux["overflow"]

    (l1, ov), g1 = jax.value_and_grad(loss_single, has_aux=True)(float_fields(g))
    assert int(ov) == 0   # no K-cap overflow: sharded semantics then match

    # sharded loss + grads
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("gauss",))

    def loss_sharded(fp):
        gg = with_floats(g, fp)
        return avatar_loss_gaussian_sharded(
            gg, verts, model.faces, cam, gt, mesh=mesh, max_per_tile=1024)

    l2, g2 = jax.jit(jax.value_and_grad(loss_sharded))(float_fields(g))

    assert abs(float(l1) - float(l2)) < 1e-5, (float(l1), float(l2))
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = max(np.abs(a).max(), 1e-5)
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=5e-3,
                                   err_msg=f"grad mismatch: {k}")


def test_sharded_trainer_matches_replicated_curve():
    """Fully sharded training state (P('gauss') gaussians + Adam moments):
    N steps of ShardedAvatarTrainer track AvatarTrainer's replicated loss
    curve on the same frames, then per-shard densification grows the cloud
    and training continues finite (SURVEY.md §2.3 model-parallel path)."""
    from jax.sharding import Mesh
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.models.gaussians import init_gaussians_on_mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.parallel.sharded_trainer import ShardedAvatarTrainer
    from omfs4d.train.trainer import AvatarTrainer
    from omfs4d.io.synthetic import textured_gt_avatar
    from omfs4d.render.rasterize import render_avatar_frame

    S = 32
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=1.6 * S,
                         width=S, height=S)
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((1, 100))})
    gt_avatar = textured_gt_avatar(model)
    gt_img, _ = render_avatar_frame(gt_avatar, verts[0], model.faces, cam,
                                    S, S, backend="never", max_per_tile=512)
    images = (np.clip(np.asarray(gt_img), 0, 1) * 255).astype(np.uint8)[None]

    data = {
        "images": jnp.asarray(images),
        "verts": jnp.asarray(verts),
        "w2c": jnp.asarray(np.asarray(cam.w2c))[None],
        "fx": jnp.asarray([cam.fx]), "fy": jnp.asarray([cam.fy]),
        "cx": jnp.asarray([cam.cx]), "cy": jnp.asarray([cam.cy]),
    }

    cfg = TrainConfig(iterations=8, densify_interval=0, batch_frames=1,
                      opacity_reset_interval=0, max_gaussians=1024,
                      sh_degree=1)
    g0 = init_gaussians_on_mesh(np.asarray(model.faces), 1024, seed=0,
                                sh_degree=1)

    rep = AvatarTrainer(np.asarray(model.faces), cfg, S, S,
                        max_per_tile=512, use_pallas="never")
    rs = rep.init_state(capacity=1024)._replace(gaussians=g0)
    rs = rs._replace(opt_state=rep.optimizer.init(
        {k: getattr(g0, k) for k in ("mu_local", "quat_local", "log_scale",
                                     "opacity_logit", "color", "sh")}))

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("gauss",))
    sh_tr = ShardedAvatarTrainer(np.asarray(model.faces), cfg, S, S,
                                 mesh=mesh, max_per_tile=512)
    ss = sh_tr.init_state(gaussians=g0)

    rep_losses, sh_losses = [], []
    for it in range(8):
        idx = jnp.zeros((1,), jnp.int32)
        rs, rm = rep._step_fn(rs, data, idx)
        ss, sm = sh_tr.step(ss, data, 0)
        rep_losses.append(float(rm["loss"]))
        sh_losses.append(float(sm["loss"]))
    np.testing.assert_allclose(sh_losses, rep_losses, rtol=2e-2, atol=2e-3)
    assert rep_losses[-1] < rep_losses[0]          # both actually trained

    # sharded densification: per-shard clone into own dead slots
    ss = ss._replace(
        grad_accum=jnp.full(1024, 1.0), grad_count=jnp.full(1024, 1.0))
    alive_before = int(np.asarray(ss.gaussians.alive).sum())
    ss = sh_tr.densify(ss, jax.random.PRNGKey(1))
    alive_after = int(np.asarray(ss.gaussians.alive).sum())
    assert alive_after > alive_before
    ss, sm = sh_tr.step(ss, data, 0)
    assert np.isfinite(float(sm["loss"]))

    # the training state is genuinely sharded
    shard_dev = {d.id for d in ss.gaussians.mu_local.sharding.device_set}
    assert len(shard_dev) == 4


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple (virtual) devices")
def test_frame_dp_mesh_trainer_matches_unsharded():
    """AvatarTrainer(mesh=...) — the pipeline's parallel.n_data path — must
    produce the same loss curve as the unsharded trainer on the same frame
    batch (frame-DP via sharding constraints; XLA inserts the psum)."""
    from jax.sharding import Mesh
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.train.trainer import AvatarTrainer

    S, B = 32, 4
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=1.6 * S,
                         width=S, height=S)
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((B, 100))})
    rng = np.random.default_rng(3)
    data = {
        "images": jnp.asarray(rng.integers(0, 255, (B, S, S, 3)), jnp.uint8),
        "verts": verts,
        "w2c": jnp.tile(jnp.asarray(np.asarray(cam.w2c))[None], (B, 1, 1)),
        "fx": jnp.full((B,), cam.fx), "fy": jnp.full((B,), cam.fy),
        "cx": jnp.full((B,), cam.cx), "cy": jnp.full((B,), cam.cy),
    }
    cfg = TrainConfig(batch_frames=B, max_gaussians=1024, sh_degree=1,
                      densify_interval=0, opacity_reset_interval=0)

    plain = AvatarTrainer(np.asarray(model.faces), cfg, S, S,
                          max_per_tile=128, use_pallas="never")
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    dp = AvatarTrainer(np.asarray(model.faces), cfg, S, S,
                       max_per_tile=128, use_pallas="never", mesh=mesh)

    s_plain = plain.init_state(capacity=1024)
    s_dp = dp.init_state(capacity=1024)
    idx = jnp.arange(B, dtype=jnp.int32)
    for _ in range(4):
        s_plain, m_plain = plain._step_fn(s_plain, data, idx)
        s_dp, m_dp = dp._step_fn(s_dp, data, idx)
        assert abs(float(m_plain["loss"]) - float(m_dp["loss"])) < 1e-4, (
            float(m_plain["loss"]), float(m_dp["loss"]))
    np.testing.assert_allclose(np.asarray(s_dp.gaussians.color),
                               np.asarray(s_plain.gaussians.color), atol=1e-3)


@pytest.mark.skipif(N_DEV < 8, reason="needs 8 virtual devices")
def test_2d_data_gauss_sharded_trainer():
    """The (data x gauss) 2D mesh: each data row fits its own frame against
    the gaussian shards; the step's loss equals the replicated trainer's
    mean loss over the same frame batch, and FLAME co-optimization works
    through the shard_map transpose."""
    from jax.sharding import Mesh
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.models.gaussians import init_gaussians_on_mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.parallel.sharded_trainer import ShardedAvatarTrainer
    from omfs4d.train.trainer import AvatarTrainer
    from omfs4d.io.synthetic import textured_gt_avatar
    from omfs4d.render.rasterize import render_avatar_frame

    S, B = 32, 2
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=1.6 * S,
                         width=S, height=S)
    gt_params = {"shape": jnp.zeros(300), "expr": jnp.zeros((B, 100)),
                 "jaw_pose": jnp.zeros((B, 3)).at[1, 0].set(0.2)}
    verts = flame_forward(model, gt_params)
    gt_avatar = textured_gt_avatar(model)
    images = np.stack([
        (np.clip(np.asarray(render_avatar_frame(
            gt_avatar, verts[i], model.faces, cam, S, S, backend="never",
            max_per_tile=512)[0]), 0, 1) * 255).astype(np.uint8)
        for i in range(B)
    ])
    data = {
        "images": jnp.asarray(images),
        "verts": jnp.asarray(verts),
        "w2c": jnp.tile(jnp.asarray(np.asarray(cam.w2c))[None], (B, 1, 1)),
        "fx": jnp.full((B,), cam.fx), "fy": jnp.full((B,), cam.fy),
        "cx": jnp.full((B,), cam.cx), "cy": jnp.full((B,), cam.cy),
    }
    cfg = TrainConfig(batch_frames=B, max_gaussians=1024, sh_degree=1,
                      densify_interval=0, opacity_reset_interval=0)
    g0 = init_gaussians_on_mesh(np.asarray(model.faces), 1024, seed=0,
                                sh_degree=1)

    # replicated reference on the same 2-frame batch
    rep = AvatarTrainer(np.asarray(model.faces), cfg, S, S,
                        max_per_tile=512, use_pallas="never")
    rs = rep.init_state(capacity=1024)._replace(gaussians=g0)
    rs = rs._replace(opt_state=rep.optimizer.init(
        {k: getattr(g0, k) for k in ("mu_local", "quat_local", "log_scale",
                                     "opacity_logit", "color", "sh")}))

    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "gauss"))
    tr2d = ShardedAvatarTrainer(np.asarray(model.faces), cfg, S, S,
                                mesh=mesh2d, max_per_tile=512,
                                data_axis="data")
    ss = tr2d.init_state(gaussians=g0)

    idx = jnp.arange(B, dtype=jnp.int32)
    for _ in range(4):
        rs, rm = rep._step_fn(rs, data, idx)
        ss, sm = tr2d.step(ss, data, idx)
        assert abs(float(rm["loss"]) - float(sm["loss"])) < 3e-3, (
            float(rm["loss"]), float(sm["loss"]))

    # FLAME co-optimization on the 2D sharded path: a wrong jaw pose must
    # move toward GT through the shard_map transpose
    cfg_f = TrainConfig(batch_frames=B, max_gaussians=1024, sh_degree=1,
                        densify_interval=0, opacity_reset_interval=0,
                        optimize_flame=True, lr_flame_pose=2e-3)
    tr_f = ShardedAvatarTrainer(np.asarray(model.faces), cfg_f, S, S,
                                mesh=mesh2d, max_per_tile=512,
                                data_axis="data", flame_model=model)
    # g0's buffers were donated by the replicated step above — rebuild
    g0f = init_gaussians_on_mesh(np.asarray(model.faces), 1024, seed=0,
                                 sh_degree=1)
    wrong = {
        "shape": jnp.zeros(300), "expr": jnp.zeros((B, 100)),
        "rotation": jnp.zeros((B, 3)),
        "neck_pose": jnp.zeros((B, 3)),
        "jaw_pose": jnp.zeros((B, 3)).at[:, 0].set(0.3),
        "eyes_pose": jnp.zeros((B, 6)), "translation": jnp.zeros((B, 3)),
    }
    sf = tr_f.init_state(gaussians=g0f, flame_params=wrong)
    for _ in range(25):
        sf, mf = tr_f.step(sf, data, idx)
    jaw = np.asarray(sf.flame_params["jaw_pose"][:, 0])
    assert np.isfinite(float(mf["loss"]))
    assert (np.abs(jaw) < 0.3 - 1e-3).all(), jaw


def test_sharded_trainer_chunked_loop_matches_per_step():
    """ShardedAvatarTrainer.train advances in lax.scan chunks; the result
    must match per-step dispatch on the same host RNG stream."""
    from jax.sharding import Mesh
    from omfs4d.core.config import TrainConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel, flame_forward
    from omfs4d.models.gaussians import init_gaussians_on_mesh
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.parallel.sharded_trainer import ShardedAvatarTrainer

    S = 32
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=400, seed=0))
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=1.6 * S,
                         width=S, height=S)
    verts = flame_forward(model, {"shape": jnp.zeros(300),
                                  "expr": jnp.zeros((2, 100))})
    rng0 = np.random.default_rng(0)
    images = rng0.integers(0, 255, (2, S, S, 3)).astype(np.uint8)
    data = {
        "images": jnp.asarray(images),
        "verts": jnp.asarray(verts),
        "w2c": jnp.tile(jnp.asarray(np.asarray(cam.w2c))[None], (2, 1, 1)),
        "fx": jnp.full((2,), cam.fx), "fy": jnp.full((2,), cam.fy),
        "cx": jnp.full((2,), cam.cx), "cy": jnp.full((2,), cam.cy),
    }
    cfg = TrainConfig(iterations=60, densify_interval=0, batch_frames=1,
                      opacity_reset_interval=0, max_gaussians=512,
                      sh_degree=1)
    g0 = init_gaussians_on_mesh(np.asarray(model.faces), 512, seed=0,
                                sh_degree=1)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("gauss",))

    tr_a = ShardedAvatarTrainer(np.asarray(model.faces), cfg, S, S,
                                mesh=mesh, max_per_tile=256)
    sa = tr_a.train(data, iterations=60, state=tr_a.init_state(gaussians=g0),
                    rng_seed=5, log_every=100)

    tr_b = ShardedAvatarTrainer(np.asarray(model.faces), cfg, S, S,
                                mesh=mesh, max_per_tile=256)
    sb = tr_b.init_state(gaussians=g0)
    rng = np.random.default_rng(5)
    for _ in range(60):
        sb, _ = tr_b.step(sb, data, int(rng.integers(0, 2)))

    np.testing.assert_allclose(np.asarray(sa.gaussians.mu_local),
                               np.asarray(sb.gaussians.mu_local), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa.gaussians.color),
                               np.asarray(sb.gaussians.color), atol=1e-5)
    assert int(sa.step) == int(sb.step) == 60
