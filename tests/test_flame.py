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


class TestRealAssetLoader:
    """`load_flame_asset` against a schema-faithful synthetic flame2023.pkl.

    The licensed pickle cannot ship (ref flame_fitter.py:37-39), so this
    fixture mimics its exact on-disk schema — sparse J_regressor,
    (2, J) uint32 kintree_table with a uint32(-1) root, fused (V, 3, 400)
    shapedirs, (V, 3, 36) posedirs, float64 template, uint32 faces, and a
    `full_lmk_*` landmark embedding saved as a 0-d object npy — to catch
    loader bit-rot without the real asset (ref flame_fitter.py:84-120)."""

    @pytest.fixture(scope="class")
    def asset_files(self, tmp_path_factory):
        import pickle

        from scipy import sparse

        d = tmp_path_factory.mktemp("flame_pkl")
        a = synthetic_flame_asset(n_vertices=700, seed=7)
        V = a["v_template"].shape[0]
        model = {
            "v_template": a["v_template"].astype(np.float64),
            "shapedirs": np.concatenate(
                [a["shapedirs_shape"], a["shapedirs_expr"]], axis=2
            ).astype(np.float64),
            "posedirs": np.random.default_rng(7)
            .normal(0, 1e-4, (V, 3, 36)).astype(np.float64),
            "J_regressor": sparse.csc_matrix(a["J_regressor"].astype(np.float64)),
            "weights": a["lbs_weights"].astype(np.float64),
            "kintree_table": np.array(
                [[4294967295, 0, 1, 1, 1], [0, 1, 2, 3, 4]], dtype=np.uint32),
            "f": a["faces"].astype(np.uint32),
            # real FLAME pickles are python-2 era; non-ascii metadata keeps
            # the encoding="latin1" load path honest
            "bs_style": "lbs — synthétique",
        }
        pkl = d / "flame2023.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(model, f, protocol=2)

        lmk = {
            "full_lmk_faces_idx": a["lmk_faces_idx"].astype(np.int64)[None, :],
            "full_lmk_bary_coords":
                a["lmk_bary_coords"].astype(np.float64)[None, :, :],
        }
        lmk_npy = d / "landmark_embedding_with_eyes.npy"
        np.save(lmk_npy, lmk, allow_pickle=True)
        return pkl, lmk_npy, a

    def test_roundtrip_schema(self, asset_files):
        from omfs4d.models.assets import load_flame_asset

        pkl, lmk_npy, src = asset_files
        a = load_flame_asset(pkl, lmk_npy)
        V = src["v_template"].shape[0]
        assert a["v_template"].shape == (V, 3)
        assert a["v_template"].dtype == np.float32
        assert a["shapedirs_shape"].shape == (V, 3, 300)
        assert a["shapedirs_expr"].shape == (V, 3, 100)
        assert a["posedirs"].shape == (V, 3, 36)
        assert a["J_regressor"].shape == (5, V)    # sparse -> dense
        assert a["lbs_weights"].shape == (V, 5)
        assert a["parents"].tolist() == [-1, 0, 1, 1, 1]
        assert a["faces"].dtype == np.int32
        assert a["lmk_faces_idx"].shape == (68,)
        assert a["lmk_bary_coords"].shape == (68, 3)
        np.testing.assert_allclose(a["shapedirs_shape"],
                                   src["shapedirs_shape"], atol=1e-6)

    def test_forward_from_real_schema(self, asset_files):
        from omfs4d.models.assets import load_flame_asset

        pkl, lmk_npy, _ = asset_files
        model = FlameModel.from_asset(load_flame_asset(pkl, lmk_npy))
        p = _params(model, B=2,
                    jaw_pose=jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]]))
        v, lmk = flame_forward(model, p, return_landmarks=True)
        assert np.isfinite(np.asarray(v)).all()
        assert np.isfinite(np.asarray(lmk)).all()
        assert lmk.shape == (2, 68, 3)
        # jaw pose must actually move vertices (real LBS path, not a no-op)
        assert float(jnp.abs(v[1] - v[0]).max()) > 1e-4

    def test_missing_landmark_file_gives_empty_embedding(self, asset_files):
        from omfs4d.models.assets import load_flame_asset

        pkl, _, _ = asset_files
        a = load_flame_asset(pkl)
        assert a["lmk_faces_idx"].shape == (0,)
        assert a["lmk_bary_coords"].shape == (0, 3)
