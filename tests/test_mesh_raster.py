"""Differentiable mesh rasterizer: coverage, occlusion, geometry gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omfs4d.ops.camera import look_at_camera
from omfs4d.render.mesh_raster import rasterize_mesh

W = H = 64


@pytest.fixture(scope="module")
def cam():
    return look_at_camera(eye=(0, 0, -2.0), target=(0, 0, 0), fx=100.0,
                          width=W, height=H)


def _square(z, half=0.5, color=(1.0, 0.0, 0.0)):
    """Two triangles forming a square facing the camera at depth z."""
    verts = np.array([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = np.tile(np.asarray(color, np.float32), (2, 1))
    return verts, faces, colors


class TestMeshRaster:
    def test_coverage_inside_outside(self, cam):
        verts, faces, colors = _square(0.0)
        img, aux = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                                  jnp.asarray(colors), cam, W, H,
                                  background=jnp.zeros(3), sigma=0.5)
        img = np.asarray(img)
        # interior of the square is solid red (probe off the shared diagonal,
        # where soft coverage composites to ~0.75 — see module docstring);
        # far corner is background
        win = img[H // 2 - 8 : H // 2 + 8, W // 2 - 8 : W // 2 + 8]
        assert win[..., 0].max() > 0.95
        assert img[H // 2, W // 2, 0] > 0.7        # seam floor
        assert img[H // 2, W // 2, 1] < 0.05
        np.testing.assert_allclose(img[2, 2], [0, 0, 0], atol=1e-3)
        a = np.asarray(aux["alpha"])
        assert a[H // 2 - 6, W // 2 + 6] > 0.9 or a[H // 2 + 6, W // 2 - 6] > 0.9
        assert a[2, 2] < 1e-3

    def test_occlusion_front_wins(self, cam):
        v1, f1, c1 = _square(0.0, half=0.5, color=(1, 0, 0))    # nearer
        v2, f2, c2 = _square(0.5, half=0.8, color=(0, 1, 0))    # farther
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        colors = np.concatenate([c1, c2])
        img, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                                jnp.asarray(colors), cam, W, H,
                                background=jnp.zeros(3), sigma=0.5)
        probe = np.asarray(img)[H // 2 - 6, W // 2 + 6]
        probe2 = np.asarray(img)[H // 2 + 6, W // 2 - 6]
        best = probe if probe[0] > probe2[0] else probe2
        assert best[0] > 0.85 and best[1] < 0.15   # red occludes green

    def test_silhouette_gradient_to_vertices(self, cam):
        """Moving the square right should increase coverage right of the
        silhouette — the vertex-position gradient must be nonzero & finite."""
        verts, faces, colors = _square(0.0)

        def loss(v):
            img, _ = rasterize_mesh(v, jnp.asarray(faces),
                                    jnp.asarray(colors), cam, W, H,
                                    background=jnp.zeros(3), sigma=1.0)
            # mass in the right half of the image
            return jnp.sum(img[:, W // 2 :, 0])

        g = jax.grad(loss)(jnp.asarray(verts))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g[:, 0]).max() > 0     # x-translation changes the loss

        # finite-difference check on a rigid x shift
        eps = 1e-2
        lp = float(loss(jnp.asarray(verts) + jnp.array([eps, 0, 0])))
        lm = float(loss(jnp.asarray(verts) - jnp.array([eps, 0, 0])))
        fd = (lp - lm) / (2 * eps)
        analytic = float(g[:, 0].sum())
        assert abs(fd - analytic) < 0.15 * max(abs(fd), 1.0), (fd, analytic)

    def test_color_gradient(self, cam):
        verts, faces, colors = _square(0.0)

        def loss(c):
            img, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                                    c, cam, W, H, background=jnp.zeros(3))
            return jnp.mean((img - 0.5) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(colors)))
        assert np.isfinite(g).all() and np.abs(g).max() > 0

    def test_backface_still_covered(self, cam):
        """Winding must not create holes (orientation-corrected halfplanes)."""
        verts, faces, colors = _square(0.0)
        faces_flipped = faces[:, ::-1].copy()
        img, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces_flipped),
                                jnp.asarray(colors), cam, W, H,
                                background=jnp.zeros(3), sigma=0.5)
        win = np.asarray(img)[H // 2 - 8 : H // 2 + 8, W // 2 - 8 : W // 2 + 8]
        assert win[..., 0].max() > 0.95


@pytest.mark.slow
def test_tracker_mesh_photometric_backend(cam):
    """The mesh backend plugs into the tracker's photometric loss with
    finite gradients to pose and texture."""
    from omfs4d.core.config import TrackConfig
    from omfs4d.models.assets import synthetic_flame_asset
    from omfs4d.models.flame import FlameModel
    from omfs4d.track.fitter import FlameTracker

    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=500))
    tcam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=100.0,
                          width=W, height=H)
    cfg = TrackConfig(n_shape=10, n_expr=5, photometric=True,
                      photometric_backend="mesh")
    tr = FlameTracker(model, cfg, tcam, (W, H), use_pallas="never")
    p = tr.init_params(2)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, H, W, 3)), jnp.uint8)
    loss, grads = jax.value_and_grad(
        lambda q: tr._photometric_loss(q, frames, jnp.arange(2)))(p)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["translation"]).max()) > 0
    assert float(jnp.abs(grads["texture"]).max()) > 0


def test_softmax_aggregation_seam_free(cam):
    """softmax aggregation: interior shared edges render at full color."""
    verts, faces, colors = _square(0.0)
    img, aux = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                              jnp.asarray(colors), cam, W, H,
                              face_opacity=0.98,
                              background=jnp.zeros(3), sigma=0.5,
                              aggregation="softmax")
    img = np.asarray(img)
    # on the shared diagonal: union alpha = 1-(1-.49)(1-.49) ≈ 0.74 but the
    # foreground COLOR is pure red (partition of unity) — so red channel on
    # the seam is >= the union alpha, with no green/blue bleed
    assert img[H // 2, W // 2, 0] > 0.7
    assert img[H // 2, W // 2, 1] < 1e-3
    # interior off-seam: essentially solid
    win = img[H // 2 - 8 : H // 2 + 8, W // 2 - 8 : W // 2 + 8]
    assert win[..., 0].max() > 0.95

    # silhouette gradient flows in softmax mode too
    def loss(v):
        i, _ = rasterize_mesh(v, jnp.asarray(faces), jnp.asarray(colors),
                              cam, W, H, background=jnp.zeros(3),
                              sigma=1.0, aggregation="softmax")
        return jnp.sum(i[:, W // 2 :, 0])
    g = np.asarray(jax.grad(loss)(jnp.asarray(verts)))
    assert np.isfinite(g).all() and np.abs(g[:, 0]).max() > 0


def test_vertex_color_interpolation(cam):
    """Smooth shading: a left-red/right-blue vertex coloring must produce a
    horizontal gradient across the square."""
    verts = np.array([
        [-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    vcols = np.array([
        [1, 0, 0], [0, 0, 1], [0, 0, 1], [1, 0, 0],
    ], np.float32)                       # red on x=-0.5, blue on x=+0.5
    img, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                            jnp.asarray(vcols), cam, W, H,
                            background=jnp.zeros(3), sigma=0.5,
                            vertex_interp=True)
    img = np.asarray(img)
    row = img[H // 2]
    # world +x maps to screen -x for this camera: find which side is red
    left, right = row[W // 2 - 15], row[W // 2 + 15]
    assert abs(left[0] - right[0]) > 0.5          # strong horizontal gradient
    mid = row[W // 2]
    assert 0.25 < mid[0] < 0.75 and 0.25 < mid[2] < 0.75   # blended center

    # gradients flow to vertex colors
    def loss(c):
        i, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), c,
                              cam, W, H, background=jnp.zeros(3),
                              vertex_interp=True)
        return jnp.mean(i ** 2)
    g = np.asarray(jax.grad(loss)(jnp.asarray(vcols)))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
