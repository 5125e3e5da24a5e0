"""Validation reporting + head-recon scaffold."""

import json

import numpy as np
import pytest

from omfs4d.eval.reporting import bucket, generate_report, psnr, ssim_global
from omfs4d.headrecon.pipeline import (
    build_canonical_head,
    evaluate_head_coverage,
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
