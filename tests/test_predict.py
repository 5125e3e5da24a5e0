"""Golden behavior tests for surgical parameter mapping.

Ports the reference's invariant suite (ref: test/test_render_surgery.py):
compute_offset sign/sensitivity cases, npz-roundtrip modify_flame_params
with axis targeting + non-mutation + deformation-map remapping, rig-mode
fallback, deterministic frame export with manifest assertions.
"""

import json
import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from omfs4d.predict.surgery import (
    SCALE_FACTOR,
    choose_rig_mode,
    compute_offset,
    create_modified_dataset,
    export_deterministic_frames,
    load_deformation_map,
    modify_flame_params,
)
from omfs4d.io.video import write_image


class TestComputeOffset:
    def test_zero_mm_returns_zero(self):
        assert compute_offset(0.0, 1.0) == 0.0

    def test_positive_mm(self):
        assert abs(compute_offset(5.0, 1.0) - 5.0 * SCALE_FACTOR) < 1e-12

    def test_negative_mm(self):
        assert abs(compute_offset(-3.0, 1.0) + 3.0 * SCALE_FACTOR) < 1e-12

    def test_sensitivity_scaling(self):
        assert abs(compute_offset(5.0, 2.5) - 5.0 * 2.5 * SCALE_FACTOR) < 1e-12

    def test_zero_sensitivity(self):
        assert compute_offset(10.0, 0.0) == 0.0


@pytest.fixture
def param_files(tmp_path):
    src = tmp_path / "source.npz"
    out = tmp_path / "modified.npz"
    np.savez(src,
             jaw_pose=np.zeros((10, 3), dtype=np.float32),
             translation=np.zeros((10, 3), dtype=np.float32),
             expr=np.zeros((10, 100), dtype=np.float32),
             shape=np.zeros(300, dtype=np.float32))
    return str(src), str(out)


class TestModifyFlameParams:
    def test_lefort_modifies_translation_y(self, param_files):
        src, out = param_files
        modify_flame_params(src, out, 0.005, 0.0)
        data = np.load(out)
        assert abs(float(data["translation"][0, 1]) - 0.005) < 1e-5

    def test_bsso_modifies_jaw_pose_x(self, param_files):
        src, out = param_files
        modify_flame_params(src, out, 0.0, 0.003)
        data = np.load(out)
        assert abs(float(data["jaw_pose"][0, 0]) - 0.003) < 1e-5

    def test_does_not_mutate_source(self, param_files):
        src, out = param_files
        modify_flame_params(src, out, 0.01, 0.02)
        source = np.load(src)
        assert float(source["translation"][0, 1]) == 0.0
        assert float(source["jaw_pose"][0, 0]) == 0.0

    def test_single_frame_1d_form(self, tmp_path):
        src = tmp_path / "s.npz"
        out = tmp_path / "o.npz"
        np.savez(src, jaw_pose=np.zeros(3, np.float32),
                 translation=np.zeros(3, np.float32))
        modify_flame_params(str(src), str(out), 0.004, 0.002)
        data = np.load(out)
        assert abs(float(data["translation"][1]) - 0.004) < 1e-6
        assert abs(float(data["jaw_pose"][0]) - 0.002) < 1e-6

    def test_hybrid_deformation_map_axes_and_scale(self, param_files):
        src, out = param_files
        deform = {"translation_axis": 2, "jaw_axis": 1,
                  "lefort_scale": 2.0, "bsso_scale": 0.5}
        modify_flame_params(src, out, 0.01, 0.02, deformation_map=deform)
        data = np.load(out)
        assert abs(float(data["translation"][0, 2]) - 0.02) < 1e-5
        assert abs(float(data["jaw_pose"][0, 1]) - 0.01) < 1e-5


class TestRigModeFallback:
    def test_hybrid_falls_back_without_asset(self):
        mode, reason = choose_rig_mode("hybrid_full_head", "")
        assert mode == "flame_only"
        assert "missing" in reason

    def test_hybrid_kept_when_asset_exists(self, tmp_path):
        p = tmp_path / "asset.npz"
        np.savez(p, version=np.array([1]))
        mode, _ = choose_rig_mode("hybrid_full_head", str(p))
        assert mode == "hybrid_full_head"

    def test_flame_only_explicit(self):
        mode, reason = choose_rig_mode("flame_only", "/nonexistent")
        assert mode == "flame_only"
        assert "explicit" in reason


class TestDeformationMap:
    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            load_deformation_map("/does/not/exist.json")

    def test_non_dict_raises(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("[1, 2, 3]")
        with pytest.raises(ValueError):
            load_deformation_map(str(p))

    def test_empty_path_is_empty(self):
        assert load_deformation_map(None) == {}
        assert load_deformation_map("") == {}


class TestDeterministicFrameExport:
    def test_export_with_explicit_indices(self, tmp_path):
        frames_dir = tmp_path / "renders"
        out_dir = tmp_path / "out"
        frames_dir.mkdir(parents=True)
        for i in range(6):
            write_image(frames_dir / f"{i:05d}.png",
                        np.full((8, 8, 3), i * 20, dtype=np.uint8))
        idx_file = tmp_path / "idx.json"
        idx_file.write_text(json.dumps({"indices": [0, 3, 5]}))
        export_deterministic_frames(str(frames_dir), str(out_dir), str(idx_file))
        manifest = json.loads(
            (out_dir / "deterministic_indices_manifest.json").read_text()
        )
        assert manifest["selected_indices"] == [0, 3, 5]
        for i in (0, 3, 5):
            assert (out_dir / f"idx_{i:05d}.png").exists()

    def test_auto_sampling(self, tmp_path):
        frames_dir = tmp_path / "renders"
        frames_dir.mkdir()
        for i in range(50):
            write_image(frames_dir / f"{i:05d}.png",
                        np.zeros((4, 4, 3), dtype=np.uint8))
        out = tmp_path / "out"
        export_deterministic_frames(str(frames_dir), str(out), max_frames=10)
        manifest = json.loads(
            (out / "deterministic_indices_manifest.json").read_text()
        )
        sel = manifest["selected_indices"]
        assert len(sel) == 10 and sel[0] == 0 and sel[-1] == 49


class TestModifiedDataset:
    def test_create_modified_dataset(self, tmp_path):
        data = tmp_path / "data"
        (data / "images").mkdir(parents=True)
        (data / "flame_param").mkdir()
        write_image(data / "images" / "00000.png", np.zeros((4, 4, 3), np.uint8))
        np.savez(data / "flame_param" / "00000.npz",
                 jaw_pose=np.zeros((1, 3), np.float32),
                 translation=np.zeros((1, 3), np.float32))
        np.savez(data / "flame_param.npz",
                 jaw_pose=np.zeros((1, 3), np.float32),
                 translation=np.zeros((1, 3), np.float32))
        np.savez(data / "canonical_flame_param.npz", shape=np.zeros(300))
        (data / "transforms_train.json").write_text(json.dumps({
            "frames": [{"file_path": "images/00000.png", "timestep_index": 0}]
        }))

        out = create_modified_dataset(str(data), 0.005, 0.002)
        try:
            mod = np.load(Path(out) / "flame_param" / "00000.npz")
            assert abs(float(mod["translation"][0, 1]) - 0.005) < 1e-6
            assert abs(float(mod["jaw_pose"][0, 0]) - 0.002) < 1e-6
            batched = np.load(Path(out) / "flame_param.npz")
            assert abs(float(batched["translation"][0, 1]) - 0.005) < 1e-6
            assert (Path(out) / "canonical_flame_param.npz").exists()
            t = json.loads((Path(out) / "transforms_train.json").read_text())
            assert t["frames"][0]["flame_param_path"] == "flame_param/00000.npz"
            assert (Path(out) / "images" / "00000.png").exists()
        finally:
            import shutil
            shutil.rmtree(out, ignore_errors=True)


def test_modified_dataset_uses_refined_params(tmp_path):
    """When training co-optimized the FLAME params, the modified dataset's
    per-frame/batched params must derive from the REFINED params (+ offsets),
    not the dataset's original tracked params — the avatar was optimized
    against the refined poses."""
    import numpy as np
    from omfs4d.io.dataset import default_flame_params
    from omfs4d.predict.surgery import create_modified_dataset

    T = 3
    data_dir = tmp_path / "data"
    (data_dir / "flame_param").mkdir(parents=True)
    orig = default_flame_params(T, n_verts=50)
    np.savez(data_dir / "flame_param.npz", **orig)
    for i in range(T):
        per = {k: (v if k == "shape" or (v.ndim == 3 and v.shape[0] == 1)
                   else v[i:i + 1]) for k, v in orig.items()}
        np.savez(data_dir / "flame_param" / f"{i:05d}.npz", **per)
    import json
    (data_dir / "transforms_train.json").write_text(json.dumps({
        "frames": [{"timestep_index": i, "transform_matrix": np.eye(4).tolist()}
                   for i in range(T)]}))

    refined = {k: np.asarray(v).copy() for k, v in orig.items()}
    refined["rotation"] = refined["rotation"] + 0.123      # the refinement
    ref_path = tmp_path / "flame_param_refined.npz"
    np.savez(ref_path, **refined)

    out = create_modified_dataset(str(data_dir), 0.005, 0.0,
                                  refined_params=str(ref_path))
    got = np.load(f"{out}/flame_param/00001.npz")
    np.testing.assert_allclose(got["rotation"], refined["rotation"][1:2],
                               atol=1e-6)
    # the surgical offset applied on top of the refined base
    np.testing.assert_allclose(
        got["translation"][:, 1], refined["translation"][1:2, 1] + 0.005,
        atol=1e-6)
    batched = np.load(f"{out}/flame_param.npz")
    np.testing.assert_allclose(batched["rotation"], refined["rotation"],
                               atol=1e-6)
    # without refined_params the original base is used
    out2 = create_modified_dataset(str(data_dir), 0.005, 0.0)
    got2 = np.load(f"{out2}/flame_param/00001.npz")
    np.testing.assert_allclose(got2["rotation"], orig["rotation"][1:2],
                               atol=1e-6)
