"""Validation reporting + head-recon scaffold."""

import json

import numpy as np
import pytest

from omfs4d.eval.reporting import bucket, generate_report, psnr, ssim_global
from omfs4d.headrecon.pipeline import (
    build_canonical_head,
    evaluate_head_coverage,
    evaluate_multi_coverage,
    fit_shared_shape,
    ingest_sequences,
    register_sequences,
)
from omfs4d.io.video import write_image


class TestMetrics:
    def test_psnr_identical_caps_at_99(self):
        a = np.random.default_rng(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
        assert psnr(a, a) == 99.0

    def test_psnr_known_value(self):
        a = np.zeros((4, 4), np.float32)
        b = np.full((4, 4), 16.0, np.float32)   # mse = 256 -> 20*log10(255/16)
        assert abs(psnr(a, b) - 20 * np.log10(255.0 / 16.0)) < 1e-6

    def test_ssim_identical_is_one(self):
        a = np.random.default_rng(1).uniform(0, 255, (16, 16, 3))
        assert abs(ssim_global(a, a) - 1.0) < 1e-9

    def test_buckets(self):
        assert bucket(0.1) == "front"
        assert bucket(0.9) == "front"
        assert bucket(0.5) == "profile"
        assert bucket(0.25) == "rear"
        assert bucket(0.7) == "rear"


class TestReport:
    def test_generate_report(self, tmp_path):
        model = tmp_path / "model"
        latest = model / "train" / "ours_100"
        (latest / "renders").mkdir(parents=True)
        (latest / "gt").mkdir(parents=True)
        det = tmp_path / "det"
        det.mkdir()
        rng = np.random.default_rng(0)
        exports = []
        for i in range(6):
            img = rng.uniform(0, 255, (8, 8, 3)).astype(np.uint8)
            name = f"{i:05d}.png"
            write_image(latest / "renders" / name, img)
            write_image(latest / "gt" / name, img)   # identical -> 99 dB
            exports.append({"index": i, "source": name,
                            "exported": f"idx_{i:05d}.png"})
        (det / "deterministic_indices_manifest.json").write_text(
            json.dumps({"exports": exports}))

        out = tmp_path / "reports"
        report = generate_report(model, det, out)
        assert report["summary"]["count"] == 6
        assert (out / "strict_scores.json").exists()
        assert (out / "human_review_checklist.md").exists()
        front = report["summary"]["by_bucket"]["front"]
        assert front["psnr"] == 99.0

    def test_region_excluded_metric(self, tmp_path):
        """Surgically moved pixels must not count against psnr_unchanged.

        The raw strict psnr compares MOVED anatomy against unmoved GT and
        is inherently capped (ref: the modified-vs-GT scoring convention,
        validation_reporting.py:58-110); with a zero-offset baseline the
        report also measures whether UNCHANGED pixels were corrupted.
        """
        model = tmp_path / "model"
        latest = model / "train" / "ours_10"
        (latest / "renders").mkdir(parents=True)
        (latest / "gt").mkdir(parents=True)
        base = tmp_path / "baseline"
        base.mkdir()
        det = tmp_path / "det"
        det.mkdir()
        rng = np.random.default_rng(1)
        exports = []
        for i in range(3):
            gt = rng.uniform(0, 255, (16, 16, 3)).astype(np.uint8)
            modified = gt.copy()
            modified[8:, :]  = 255 - modified[8:, :]   # "surgery": bottom half
            name = f"{i:05d}.png"
            write_image(latest / "renders" / name, modified)
            write_image(latest / "gt" / name, gt)
            write_image(base / name, gt)               # zero-offset == GT here
            exports.append({"index": i, "source": name,
                            "exported": f"idx_{i:05d}.png"})
        (det / "deterministic_indices_manifest.json").write_text(
            json.dumps({"exports": exports}))

        rep = generate_report(model, det, tmp_path / "rep",
                              baseline_renders_dir=base)
        rows = rep["rows"]
        # raw psnr is destroyed by the moved half; unchanged-region psnr
        # sees only identical pixels and hits the cap
        assert all(r["psnr"] < 20 for r in rows)
        assert all(r["psnr_unchanged"] == 99.0 for r in rows)
        front = rep["summary"]["by_bucket"]["front"]
        assert front["psnr_unchanged"] == 99.0

    def test_report_picks_latest_ours(self, tmp_path):
        model = tmp_path / "model"
        for it in (50, 200):
            (model / "train" / f"ours_{it}" / "renders").mkdir(parents=True)
            (model / "train" / f"ours_{it}" / "gt").mkdir(parents=True)
        from omfs4d.eval.reporting import find_latest_train_dir
        assert find_latest_train_dir(model).name == "ours_200"


class TestHeadRecon:
    def test_full_scaffold(self, tmp_path):
        root = tmp_path / "captures"
        for name in ("seq_a", "seq_b"):
            d = root / name / "images"
            d.mkdir(parents=True)
            write_image(d / "0.png", np.zeros((4, 4, 3), np.uint8))
            (root / name / "transforms_train.json").write_text(json.dumps({
                "frames": [{"timestep_index": i} for i in range(20)]
            }))
        out = tmp_path / "out"
        manifest = ingest_sequences(root, out)
        data = json.loads(manifest.read_text())
        assert data["sequence_count"] == 2

        table = register_sequences(manifest, out)
        regs = json.loads(table.read_text())["registrations"]
        assert regs[0]["canonical"] and not regs[1]["canonical"]

        asset = build_canonical_head(table, out / "canonical.npz")
        loaded = np.load(asset)
        assert int(loaded["n_sequences"][0]) == 2

        report = evaluate_head_coverage(root / "seq_a", out)
        assert report["total_frames"] == 20
        assert report["buckets"]["front"] > 0

        multi = evaluate_multi_coverage(manifest, out)
        assert multi["sequence_count"] == 2
        assert multi["merged_buckets"]["front"] == 2 * report["buckets"]["front"]

    def test_registration_from_tracked_poses(self, tmp_path):
        """Two tracked sequences of the same head, the second with a known
        rigid pose offset: register_sequences must recover the relative
        transform that maps sequence-b's camera frame into sequence-a's."""
        root = tmp_path / "captures"
        rot_a = np.array([0.0, 0.2, 0.0], np.float32)
        trans_a = np.array([0.01, 0.0, -0.02], np.float32)
        rot_b = np.array([0.0, -0.9, 0.1], np.float32)
        trans_b = np.array([-0.03, 0.02, 0.05], np.float32)
        for name, rot, trans in (("seq_a", rot_a, trans_a),
                                 ("seq_b", rot_b, trans_b)):
            d = root / name
            (d / "images").mkdir(parents=True)
            (d / "transforms_train.json").write_text(json.dumps({
                "frames": [{"timestep_index": 0}]}))
            np.savez(d / "flame_param.npz",
                     rotation=rot[None], translation=trans[None])
        out = tmp_path / "out"
        manifest = ingest_sequences(root, out)
        table = json.loads(register_sequences(manifest, out).read_text())
        regs = {r["name"]: r for r in table["registrations"]}
        assert regs["seq_a"]["canonical"]
        assert regs["seq_a"]["residual"] == 0.0
        # residual for the tracked pair is computable and ~0 (not -1 unknown)
        assert 0.0 <= regs["seq_b"]["residual"] < 1e-5

        # the transform maps seq_b head points into seq_a's camera frame:
        # check on the head origin (translation) and a second point
        from omfs4d.headrecon.pipeline import _aa_to_matrix
        T_rel = np.asarray(regs["seq_b"]["transform"])
        Ra, Rb = _aa_to_matrix(rot_a), _aa_to_matrix(rot_b)
        for p_head in (np.zeros(3), np.array([0.1, -0.05, 0.2])):
            p_a = Ra @ p_head + trans_a
            p_b = Rb @ p_head + trans_b
            p_mapped = T_rel[:3, :3] @ p_b + T_rel[:3, 3]
            np.testing.assert_allclose(p_mapped, p_a, atol=1e-6)

    @pytest.mark.slow
    def test_fit_shared_shape_two_sequences(self):
        """Joint identity fit across two sequences: one shape vector,
        per-sequence frame params split back to the right lengths."""
        import jax.numpy as jnp
        from omfs4d.core.config import TrackConfig
        from omfs4d.models.assets import synthetic_flame_asset
        from omfs4d.models.flame import (
            FlameModel, flame_forward, flame_landmarks)
        from omfs4d.ops.camera import look_at_camera, project_points
        from omfs4d.track.fitter import FlameTracker

        W = H = 96
        model = FlameModel.from_asset(
            synthetic_flame_asset(n_vertices=500, seed=0))
        cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0), fx=W * 1.6,
                             width=W, height=H)
        lengths = (3, 5)
        seq_lmks = []
        for Tn, yaw in zip(lengths, (0.1, -0.2)):
            gt = {"shape": jnp.zeros(300),
                  "expr": jnp.zeros((Tn, 100)),
                  "rotation": jnp.zeros((Tn, 3)).at[:, 1].set(yaw)}
            verts = flame_forward(model, gt)
            lmk3d = flame_landmarks(model, verts)
            lmk2d = np.stack([np.asarray(project_points(cam, lmk3d[i])[0])
                              for i in range(Tn)])
            seq_lmks.append((lmk2d, np.ones(Tn, bool)))

        cfg = TrackConfig(n_shape=20, n_expr=10,
                          steps_lmk_init_rigid=80, steps_lmk_init_all=80,
                          photometric=False, lr=0.02)
        tracker = FlameTracker(model, cfg, cam, (W, H), use_pallas="never")
        shape, per_seq = fit_shared_shape(tracker, seq_lmks)

        assert shape.shape == (300,)
        assert len(per_seq) == 2
        for params, Tn in zip(per_seq, lengths):
            assert params["expr"].shape[0] == Tn
            np.testing.assert_array_equal(params["shape"], shape)
        # the two sequences recovered their distinct yaw signs
        assert np.mean(per_seq[0]["rotation"][:, 1]) > 0
        assert np.mean(per_seq[1]["rotation"][:, 1]) < 0
