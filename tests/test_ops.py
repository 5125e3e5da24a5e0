"""Geometry ops: marching tetrahedra, mesh clip/smooth/decimate, KNN."""

import numpy as np
import pytest

from omfs4d.ops.marching import marching_cubes
from omfs4d.ops.mesh import TriMesh, plane_clip
from omfs4d.ops.knn import knn_mean_distance, knn_mean_distance_np
from omfs4d.ops.primitives import make_sphere_mesh


class TestMarching:
    def test_sphere_surface(self):
        # volume with a sphere of radius 10 at the center
        n = 32
        z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = (n - 1) / 2
        field = 15.0 - np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
        verts, faces = marching_cubes(field, level=5.0)  # radius 10 surface
        assert len(verts) > 100 and len(faces) > 100
        r = np.linalg.norm(verts - c, axis=1)
        np.testing.assert_allclose(r.mean(), 10.0, atol=0.2)
        assert r.std() < 0.2

    def test_watertight(self):
        """Every edge must be shared by exactly 2 triangles (closed surface)."""
        n = 20
        z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = (n - 1) / 2
        field = 8.0 - np.maximum.reduce([np.abs(z - c), np.abs(y - c), np.abs(x - c)])
        verts, faces = marching_cubes(field, level=2.0)
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_orientation_outward(self):
        n = 24
        z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = (n - 1) / 2
        field = 10.0 - np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
        verts, faces = marching_cubes(field, level=2.0)
        tri = verts[faces]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centroid = tri.mean(axis=1) - c
        # outward = pointing away from center (field decreases outward)
        dots = (nrm * centroid).sum(1)
        assert (dots > 0).mean() > 0.99

    def test_spacing(self):
        n = 16
        z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = (n - 1) / 2
        field = 6.0 - np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
        verts, _ = marching_cubes(field, level=1.0, spacing=(2.0, 1.0, 1.0))
        assert verts[:, 0].max() - verts[:, 0].min() > 1.5 * (
            verts[:, 1].max() - verts[:, 1].min()
        )


class TestMeshOps:
    def test_clip_halves_sphere(self):
        m = make_sphere_mesh(radius=30)
        upper = m.clip(normal=(0, 0, 1), origin=(0, 0, 0), invert=False)
        lower = m.clip(normal=(0, 0, 1), origin=(0, 0, 0), invert=True)
        assert upper.n_points > 0 and lower.n_points > 0
        assert upper.vertices[:, 2].min() >= -1e-4
        assert lower.vertices[:, 2].max() <= 1e-4
        # cut passes exactly through the plane: both have verts at z ~ 0
        assert np.abs(upper.vertices[:, 2]).min() < 1e-4

    def test_clip_plane_offset(self):
        m = make_sphere_mesh(radius=30, center=(0, 0, 20))
        part = m.clip(normal=(0, 0, 1), origin=(0, 0, 20), invert=False)
        assert part.vertices[:, 2].min() >= 20 - 1e-4

    def test_clip_empty_side(self):
        m = make_sphere_mesh(radius=10)
        nothing = m.clip(normal=(0, 0, 1), origin=(0, 0, 100), invert=False)
        assert nothing.n_points == 0

    def test_merge_and_center(self):
        a = make_sphere_mesh(radius=10, center=(0, 0, 20))
        b = make_sphere_mesh(radius=10, center=(0, 0, -20))
        m = a.merge(b)
        assert m.n_points == a.n_points + b.n_points
        np.testing.assert_allclose(m.center, [0, 0, 0], atol=1e-4)

    def test_rotate_about_point(self):
        m = make_sphere_mesh(radius=5, center=(10, 0, 0))
        r = m.rotate_z(90, point=(0, 0, 0))
        np.testing.assert_allclose(r.center, [0, 10, 0], atol=1e-3)

    def test_smooth_shrinks_slightly(self):
        m = make_sphere_mesh(radius=10, res=12)
        s = m.smooth(n_iter=30)
        r0 = np.linalg.norm(m.vertices, axis=1).mean()
        r1 = np.linalg.norm(s.vertices, axis=1).mean()
        assert 0.8 * r0 < r1 <= r0 + 1e-6

    def test_decimate(self):
        m = make_sphere_mesh(radius=10, res=32)
        d = m.decimate(0.5)
        assert d.n_faces < m.n_faces
        assert d.n_faces > 0.2 * m.n_faces
        # shape roughly preserved
        r = np.linalg.norm(d.vertices, axis=1)
        np.testing.assert_allclose(r.mean(), 10.0, atol=1.0)

    def test_clean_dedups(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]], dtype=np.float32)
        faces = np.array([[0, 1, 2], [3, 1, 2]], dtype=np.int32)
        m = TriMesh(verts, faces).clean()
        assert m.n_points == 3
        assert m.n_faces == 1


class TestKNN:
    def test_matches_reference(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        got = np.asarray(knn_mean_distance(pts, k=3, chunk=128))
        want = knn_mean_distance_np(pts, k=3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_regular_grid(self):
        g = np.stack(np.meshgrid(*[np.arange(4.0)] * 3, indexing="ij"), -1).reshape(-1, 3)
        d = np.asarray(knn_mean_distance(g.astype(np.float32), k=3, chunk=64))
        # every point has at least 3 axis neighbors at distance 1
        np.testing.assert_allclose(d, 1.0, atol=1e-5)


class TestConnectivity:
    def test_two_components(self):
        a = make_sphere_mesh(radius=5, center=(0, 0, 0), res=8)
        b = make_sphere_mesh(radius=5, center=(100, 0, 0), res=8)
        m = a.merge(b)
        labels, count = m.connectivity_components()
        assert count == 2
        assert (labels[: a.n_points] == labels[0]).all()
        assert (labels[a.n_points :] == labels[a.n_points]).all()
        assert labels[0] != labels[a.n_points]
