"""FLAME model: synthetic asset schema, LBS correctness, landmarks."""

import jax.numpy as jnp
import numpy as np
import pytest

from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import (
    FlameModel,
    axis_angle_to_matrix,
    canonical_params,
    flame_forward,
    flame_landmarks,
)


@pytest.fixture(scope="module")
def model():
    return FlameModel.from_asset(synthetic_flame_asset(n_vertices=1200, seed=0))


def _params(model, B=2, **over):
    p = {
        "shape": jnp.zeros((300,)),
        "expr": jnp.zeros((B, 100)),
        "rotation": jnp.zeros((B, 3)),
        "neck_pose": jnp.zeros((B, 3)),
        "jaw_pose": jnp.zeros((B, 3)),
        "eyes_pose": jnp.zeros((B, 6)),
        "translation": jnp.zeros((B, 3)),
    }
    p.update(over)
    return p


class TestAsset:
    def test_schema(self):
        a = synthetic_flame_asset(n_vertices=800, seed=1)
        V = 800
        assert a["v_template"].shape == (V, 3)
        assert a["shapedirs_shape"].shape == (V, 3, 300)
        assert a["shapedirs_expr"].shape == (V, 3, 100)
        assert a["J_regressor"].shape == (5, V)
        assert a["lbs_weights"].shape == (V, 5)
        np.testing.assert_allclose(a["lbs_weights"].sum(1), 1.0, atol=1e-5)
        np.testing.assert_allclose(a["J_regressor"].sum(1), 1.0, atol=1e-5)
        assert a["lmk_faces_idx"].shape == (68,)
        assert a["faces"].max() < V

    def test_deterministic(self):
        a = synthetic_flame_asset(n_vertices=500, seed=3)
        b = synthetic_flame_asset(n_vertices=500, seed=3)
        np.testing.assert_array_equal(a["v_template"], b["v_template"])
        np.testing.assert_array_equal(a["shapedirs_expr"], b["shapedirs_expr"])


class TestForward:
    def test_neutral_is_template(self, model):
        v = flame_forward(model, _params(model, B=1))
        np.testing.assert_allclose(np.asarray(v[0]), np.asarray(model.v_template),
                                   atol=1e-5)

    def test_translation(self, model):
        t = jnp.array([[0.1, -0.2, 0.3]])
        v = flame_forward(model, _params(model, B=1, translation=t))
        np.testing.assert_allclose(
            np.asarray(v[0]), np.asarray(model.v_template) + np.asarray(t[0]),
            atol=1e-5,
        )

    def test_global_rotation_rigid(self, model):
        aa = jnp.array([[0.3, -0.2, 0.5]])
        v = flame_forward(model, _params(model, B=1, rotation=aa))
        R = np.asarray(axis_angle_to_matrix(aa))[0]
        # global joint sits at J_regressor[0] @ template
        j0 = np.asarray(model.J_regressor)[0] @ np.asarray(model.v_template)
        want = (np.asarray(model.v_template) - j0) @ R.T + j0
        np.testing.assert_allclose(np.asarray(v[0]), want, atol=1e-5)

    def test_jaw_moves_only_jaw_region(self, model):
        jaw = jnp.array([[0.4, 0.0, 0.0]])
        v = flame_forward(model, _params(model, B=1, jaw_pose=jaw))
        moved = np.linalg.norm(np.asarray(v[0]) - np.asarray(model.v_template), axis=1)
        w_jaw = np.asarray(model.lbs_weights)[:, 2]
        assert moved[w_jaw > 0.5].mean() > 1e-3
        np.testing.assert_allclose(moved[w_jaw < 1e-4], 0.0, atol=1e-6)

    def test_jaw_rotation_exact_for_fully_weighted(self, model):
        """Verts with w_jaw == 1 must rotate rigidly about the jaw joint."""
        w = np.asarray(model.lbs_weights)
        full = w[:, 2] > 0.999
        if not full.any():
            pytest.skip("no fully jaw-weighted verts in this asset")
        theta = 0.3
        jaw = jnp.array([[theta, 0.0, 0.0]])
        v = flame_forward(model, _params(model, B=1, jaw_pose=jaw))
        jloc = np.asarray(model.J_regressor)[2] @ np.asarray(model.v_template)
        R = np.asarray(axis_angle_to_matrix(jnp.array([theta, 0.0, 0.0])))
        want = (np.asarray(model.v_template)[full] - jloc) @ R.T + jloc
        np.testing.assert_allclose(np.asarray(v[0])[full], want, atol=1e-5)

    def test_expr_changes_surface(self, model):
        e = jnp.zeros((1, 100)).at[0, 0].set(2.0)
        v = flame_forward(model, _params(model, B=1, expr=e))
        assert np.abs(np.asarray(v[0]) - np.asarray(model.v_template)).max() > 1e-4

    def test_static_offset(self, model):
        V = model.n_vertices
        so = jnp.zeros((1, V, 3)).at[0, 7, 1].set(0.05)
        p = _params(model, B=1)
        p["static_offset"] = so
        v = flame_forward(model, p)
        assert abs(float(v[0, 7, 1]) - float(model.v_template[7, 1]) - 0.05) < 1e-5

    def test_batched(self, model):
        B = 4
        rot = jnp.asarray(np.random.default_rng(0).normal(0, 0.2, (B, 3)), jnp.float32)
        v = flame_forward(model, _params(model, B=B, rotation=rot))
        assert v.shape == (B, model.n_vertices, 3)
        # frames differ
        assert np.abs(np.asarray(v[0]) - np.asarray(v[1])).max() > 1e-4


class TestLandmarks:
    def test_barycentric(self, model):
        v = flame_forward(model, _params(model, B=1))
        lmk = flame_landmarks(model, v)
        assert lmk.shape == (1, 68, 3)
        # each landmark lies inside its face's bounding box
        f = np.asarray(model.faces)[np.asarray(model.lmk_faces_idx)]
        tri = np.asarray(v[0])[f]                   # (68, 3, 3)
        lo = tri.min(axis=1) - 1e-5
        hi = tri.max(axis=1) + 1e-5
        l = np.asarray(lmk[0])
        assert ((l >= lo) & (l <= hi)).all()

    def test_forward_returns_landmarks(self, model):
        v, lmk = flame_forward(model, _params(model, B=2), return_landmarks=True)
        assert lmk.shape == (2, 68, 3)


def test_canonical_params_schema(model):
    p = canonical_params(model, T=1)
    assert p["shape"].shape == (300,)
    assert p["expr"].shape == (1, 100)
    assert p["static_offset"].shape == (1, model.n_vertices, 3)
