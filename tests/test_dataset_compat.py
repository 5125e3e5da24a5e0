"""Dataset-contract compatibility: layouts the reference pipeline produces.

The converter writes file paths like `images/00000_00.png`, per-frame
intrinsics, `camera_angle_x`-only variants, and optional fg_mask_path
(ref: preprocess_video.py:359-401).  FrameDataset must load them all.
"""

import json
import math

import numpy as np

from omfs4d.io.dataset import FrameDataset, default_flame_params
from omfs4d.io.video import write_image


def _reference_style_dataset(root, T=3, W=32, H=24, with_flx=True):
    (root / "images").mkdir(parents=True)
    (root / "fg_masks").mkdir()
    (root / "flame_param").mkdir()
    rng = np.random.default_rng(0)
    frames = []
    fl = 1.6 * W
    for i in range(T):
        name = f"{i:05d}_00.png"                    # VHAP-style camera suffix
        write_image(root / "images" / name,
                    rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
        write_image(root / "fg_masks" / name,
                    np.full((H, W), 255, np.uint8))
        per = default_flame_params(1, n_verts=100)
        np.savez(root / "flame_param" / f"{i:05d}.npz", **per)
        frames.append({
            "file_path": f"images/{name}",
            "fg_mask_path": f"fg_masks/{name}",
            "flame_param_path": f"flame_param/{i:05d}.npz",
            "transform_matrix": np.eye(4).tolist(),
            "timestep_index": i,
            "camera_index": 0,
            "camera_angle_x": 2 * math.atan(W / (2 * fl)),
            "w": W, "h": H,
        })
    meta = {
        "camera_angle_x": 2 * math.atan(W / (2 * fl)),
        "frames": frames,
        "timestep_indices": list(range(T)),
        "camera_indices": [0],
    }
    if with_flx:
        meta.update({"fl_x": fl, "fl_y": fl, "cx": W / 2, "cy": H / 2,
                     "w": W, "h": H})
    (root / "transforms_train.json").write_text(json.dumps(meta))
    bat = default_flame_params(T, n_verts=100)
    np.savez(root / "flame_param.npz", **bat)
    np.savez(root / "canonical_flame_param.npz",
             **default_flame_params(1, n_verts=100))
    return root


def test_reference_layout_loads(tmp_path):
    root = _reference_style_dataset(tmp_path / "d")
    ds = FrameDataset(root, split="train")
    assert len(ds) == 3
    img = ds.load_image(1)
    assert img.shape == (24, 32, 3)
    mask = ds.load_mask(0)
    assert mask is not None and mask.max() == 1.0
    p = ds.load_frame_params(2)
    assert p["expr"].shape == (1, 100)
    cam = ds.camera(0)
    assert cam.width == 32 and cam.height == 24
    assert float(cam.fx) > 0


def test_fov_only_intrinsics(tmp_path):
    """No fl_x at top level: focal derived from camera_angle_x."""
    root = _reference_style_dataset(tmp_path / "d2", with_flx=False)
    ds = FrameDataset(root, split="train")
    cam = ds.camera(0)
    want_fl = 32 / (2 * math.tan(float(2 * math.atan(32 / (2 * 1.6 * 32))) / 2))
    assert abs(float(cam.fx) - want_fl) < 1e-3


def test_batched_fallback_when_no_per_frame(tmp_path):
    """Frames without flame_param_path slice the batched npz by timestep."""
    root = tmp_path / "d3"
    (root / "images").mkdir(parents=True)
    write_image(root / "images" / "0.png", np.zeros((8, 8, 3), np.uint8))
    bat = default_flame_params(4, n_verts=50)
    bat["jaw_pose"][2, 0] = 0.5
    np.savez(root / "flame_param.npz", **bat)
    (root / "transforms_train.json").write_text(json.dumps({
        "fl_x": 10.0, "fl_y": 10.0, "cx": 4, "cy": 4, "w": 8, "h": 8,
        "frames": [{"file_path": "images/0.png", "timestep_index": 2,
                    "transform_matrix": np.eye(4).tolist()}],
    }))
    ds = FrameDataset(root, split="train")
    p = ds.load_frame_params(0)
    assert abs(float(p["jaw_pose"][0, 0]) - 0.5) < 1e-6
    assert p["shape"].shape == (300,)
