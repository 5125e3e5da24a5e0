"""Pallas compositing kernel vs the pure-JAX reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omfs4d.ops.camera import look_at_camera, project_gaussians
from omfs4d.render.rasterize import bin_gaussians, composite_reference
from omfs4d.render.pallas_kernels import composite_pallas
from tests.test_rasterize import random_scene


@pytest.fixture(scope="module")
def scene():
    cam = look_at_camera(eye=(0, 0, -2.5), target=(0, 0, 0), fx=150.0,
                         width=48, height=32)
    means, rot, scales, opacity, colors = random_scene(40, seed=7)
    proj = project_gaussians(cam, jnp.asarray(means), jnp.asarray(rot),
                             jnp.asarray(scales))
    binning = bin_gaussians(proj, jnp.asarray(opacity), 48, 32,
                            tile=16, max_per_tile=64)
    return proj, binning, jnp.asarray(opacity), jnp.asarray(colors)


def test_forward_matches_reference(scene):
    proj, binning, opacity, colors = scene
    img_p, alpha_p = composite_pallas(proj["uv"], proj["conic"], colors,
                                      opacity, binning, 48, 32, tile=16)
    img_r, alpha_r = composite_reference(proj["uv"], proj["conic"], colors,
                                         opacity, binning, 48, 32, tile=16)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_r),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match_reference(scene):
    proj, binning, opacity, colors = scene
    target = jnp.zeros((32, 48, 3))

    def loss(fn, uv, conic, cols, opac):
        img, alpha = fn(uv, conic, cols, opac, binning, 48, 32, tile=16)
        return jnp.sum((img - target) ** 2) + 0.3 * jnp.sum(alpha ** 2)

    args = (proj["uv"], proj["conic"], colors, opacity)
    g_p = jax.grad(lambda *a: loss(composite_pallas, *a), argnums=(0, 1, 2, 3))(*args)
    g_r = jax.grad(lambda *a: loss(composite_reference, *a), argnums=(0, 1, 2, 3))(*args)
    names = ["uv", "conic", "colors", "opacity"]
    for n, a, b in zip(names, g_p, g_r):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch for {n}")


def test_gradcheck_finite_difference(scene):
    """Spot-check the custom VJP against finite differences on opacity."""
    proj, binning, opacity, colors = scene

    def loss(opac):
        img, _ = composite_pallas(proj["uv"], proj["conic"], colors, opac,
                                  binning, 48, 32, tile=16)
        return jnp.sum(img * jnp.linspace(0, 1, 48)[None, :, None])

    g = np.asarray(jax.grad(loss)(opacity))
    rng = np.random.default_rng(0)
    for i in rng.choice(len(opacity), size=4, replace=False):
        eps = 1e-3
        op = np.asarray(opacity).copy()
        op[i] += eps
        lp = float(loss(jnp.asarray(op)))
        op[i] -= 2 * eps
        lm = float(loss(jnp.asarray(op)))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[i]) < 2e-2 * max(abs(fd), 1.0), (i, fd, g[i])


def test_bf16_matmul_path_close_to_f32(scene, monkeypatch):
    """The TPU default runs the triangular matmuls with bf16 operands
    (f32 accumulation); forced on under interpret mode it must stay within
    bf16 tolerance of the f32 reference (fwd + grads).  Guards the default
    flip (pallas_kernels._bf16_matmul)."""
    from omfs4d.render import pallas_kernels as pk

    proj, binning, opacity, colors = scene
    img_f, alpha_f = composite_pallas(proj["uv"], proj["conic"], colors,
                                      opacity, binning, 48, 32, tile=16)
    monkeypatch.setattr(pk, "_BF16_ENV", "1")
    assert pk._bf16_matmul()
    img_b, alpha_b = composite_pallas(proj["uv"], proj["conic"], colors,
                                      opacity, binning, 48, 32, tile=16)
    # bf16 has ~8 mantissa bits: per-term relative error ~4e-3
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_f),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(alpha_b), np.asarray(alpha_f),
                               atol=2e-2, rtol=2e-2)

    def loss(opac):
        img, _ = composite_pallas(proj["uv"], proj["conic"], colors, opac,
                                  binning, 48, 32, tile=16)
        return jnp.sum(img ** 2)

    g_b = np.asarray(jax.grad(loss)(opacity))
    monkeypatch.setattr(pk, "_BF16_ENV", "0")
    g_f = np.asarray(jax.grad(loss)(opacity))
    scale = max(np.abs(g_f).max(), 1e-6)
    np.testing.assert_allclose(g_b, g_f, atol=3e-2 * scale, rtol=3e-2)


@pytest.mark.slow
def test_two_level_k_paths_match_reference():
    """Mixed occupancy: dense tile (>128 entries, big-K path) + sparse tiles
    (small-K fast path) must both match the reference exactly."""
    cam = look_at_camera(eye=(0, 0, -2.5), target=(0, 0, 0), fx=150.0,
                         width=48, height=32)
    rng = np.random.default_rng(3)
    # 200 coincident gaussians in the center tile (dense) + 30 spread out
    n_dense, n_sparse = 200, 30
    means = np.concatenate([
        rng.normal(0, 0.01, (n_dense, 3)),
        rng.normal(0, 0.6, (n_sparse, 3)),
    ]).astype(np.float32)
    rot = np.tile(np.eye(3, dtype=np.float32), (n_dense + n_sparse, 1, 1))
    scales = np.full((n_dense + n_sparse, 3), 0.02, np.float32)
    opacity = rng.uniform(0.2, 0.8, n_dense + n_sparse).astype(np.float32)
    colors = rng.uniform(0, 1, (n_dense + n_sparse, 3)).astype(np.float32)

    proj = project_gaussians(cam, jnp.asarray(means), jnp.asarray(rot),
                             jnp.asarray(scales))
    binning = bin_gaussians(proj, jnp.asarray(opacity), 48, 32,
                            tile=16, max_per_tile=512)
    assert int(binning.tile_counts.max()) > 128     # exercises the big path
    assert int((binning.tile_counts < 128).sum()) > 0   # and the small path

    img_p, alpha_p = composite_pallas(proj["uv"], proj["conic"],
                                      jnp.asarray(colors), jnp.asarray(opacity),
                                      binning, 48, 32, tile=16)
    img_r, alpha_r = composite_reference(proj["uv"], proj["conic"],
                                         jnp.asarray(colors), jnp.asarray(opacity),
                                         binning, 48, 32, tile=16)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_r),
                               atol=1e-4, rtol=1e-4)

    def loss(fn, uv, conic, cols, opac):
        img, a = fn(uv, conic, cols, opac, binning, 48, 32, tile=16)
        return jnp.sum(img ** 2) + jnp.sum(a)

    gp = jax.grad(lambda *a: loss(composite_pallas, *a), argnums=(0, 1, 2, 3))(
        proj["uv"], proj["conic"], jnp.asarray(colors), jnp.asarray(opacity))
    gr = jax.grad(lambda *a: loss(composite_reference, *a), argnums=(0, 1, 2, 3))(
        proj["uv"], proj["conic"], jnp.asarray(colors), jnp.asarray(opacity))
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4 * scale, rtol=3e-3)

