"""FLAME tracker: recover known GT params from projected landmarks."""

import jax.numpy as jnp
import numpy as np
import pytest

from omfs4d.core.config import TrackConfig
from omfs4d.models.assets import synthetic_flame_asset
from omfs4d.models.flame import FlameModel, flame_forward, flame_landmarks
from omfs4d.ops.camera import look_at_camera, project_points
from omfs4d.track.fitter import FlameTracker
from omfs4d.track.landmarks import detect_landmarks, save_landmarks


T = 6
W = H = 128


@pytest.fixture(scope="module")
def setup():
    model = FlameModel.from_asset(synthetic_flame_asset(n_vertices=700, seed=0))
    cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=W * 1.6,
                         width=W, height=H)
    rng = np.random.default_rng(1)
    gt = {
        "shape": np.zeros(300, np.float32),
        "expr": np.zeros((T, 100), np.float32),
        "rotation": np.zeros((T, 3), np.float32),
        "neck_pose": np.zeros((T, 3), np.float32),
        "jaw_pose": np.zeros((T, 3), np.float32),
        "eyes_pose": np.zeros((T, 6), np.float32),
        "translation": np.zeros((T, 3), np.float32),
    }
    gt["jaw_pose"][:, 0] = np.linspace(0.0, 0.25, T)
    gt["rotation"][:, 1] = 0.15 * np.sin(np.linspace(0, 3, T))
    gt["translation"][:, 0] = 0.01 * rng.normal(size=T)

    verts = flame_forward(model, {k: jnp.asarray(v) for k, v in gt.items()})
    lmk3d = flame_landmarks(model, verts)
    lmk2d = np.stack([
        np.asarray(project_points(cam, lmk3d[i])[0]) for i in range(T)
    ])
    return model, cam, gt, lmk2d


def test_landmark_fit_recovers_pose(setup):
    model, cam, gt, lmk2d = setup
    cfg = TrackConfig(
        n_shape=50, n_expr=20,
        steps_lmk_init_rigid=200, steps_lmk_init_all=200,
        photometric=False, lr=0.02,
    )
    tracker = FlameTracker(model, cfg, cam, (W, H), use_pallas="never")
    result = tracker.fit(lmk2d, np.ones(T, bool))

    # reprojection error must be small (units: normalized image fraction²)
    assert result.losses["landmark"] < 5e-5, result.losses

    # jaw opening trend recovered: landmark-only fitting under-constrains
    # magnitude (expr absorbs some motion) but the temporal trend must
    # correlate strongly with the GT jaw trajectory
    jaw = result.params["jaw_pose"][:, 0]
    corr = np.corrcoef(jaw, gt["jaw_pose"][:, 0])[0, 1]
    assert corr > 0.9, (jaw, corr)

    # contract shapes
    assert result.params["shape"].shape == (300,)
    assert result.params["expr"].shape == (T, 100)
    assert result.params["static_offset"].shape == (1, model.n_vertices, 3)


def test_landmark_detector_registry(setup, tmp_path):
    model, cam, gt, lmk2d = setup
    save_landmarks(tmp_path / "landmarks.npz", lmk2d)
    got, valid = detect_landmarks(tmp_path, method="file")
    np.testing.assert_allclose(got, lmk2d)
    assert valid.all()

    got2, _ = detect_landmarks(None, method="synthetic", model=model,
                               params=gt, cameras=cam)
    np.testing.assert_allclose(got2, lmk2d, atol=1e-3)


def test_unknown_detector_raises():
    with pytest.raises(KeyError):
        detect_landmarks(".", method="nope")
