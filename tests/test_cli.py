"""CLI surface: clinical command end-to-end, config overrides."""

import numpy as np
import pytest

from omfs4d.core.config import Config, config_from_args
from omfs4d.io.meshio import load_mesh
from omfs4d.pipeline.cli import main as cli_main
from tests.test_clinical_loader import _make_sphere_ct


def test_config_overrides():
    cfg, rest = config_from_args([
        "train", "--data", "x", "train.iterations=777",
        "render.use_pallas=never", "clinical.hu_threshold=700",
    ])
    assert cfg.train.iterations == 777
    assert cfg.render.use_pallas == "never"
    assert cfg.clinical.hu_threshold == 700.0
    assert rest == ["train", "--data", "x"]


def test_unknown_override_raises():
    with pytest.raises(KeyError):
        config_from_args(["train.nonexistent=1"])


def test_cli_clinical_dicom_to_stl(tmp_path):
    series = _make_sphere_ct(tmp_path)
    out = tmp_path / "skull.stl"
    rc = cli_main([
        "clinical", "--dicom", str(series), "--out", str(out),
        "clinical.smooth_iterations=3", "clinical.decimate_fraction=0.9",
    ])
    assert rc == 0
    verts, faces = load_mesh(out)
    assert len(faces) > 20


def test_cli_clinical_cut_and_move(tmp_path):
    series = _make_sphere_ct(tmp_path, n=24, radius=9.0)
    out = tmp_path / "plan.obj"
    rc = cli_main([
        "clinical", "--dicom", str(series), "--out", str(out),
        "--lefort-z", "0", "--bsso-l-x", "-4", "--bsso-r-x", "4",
        "--maxilla-mm", "3",
        "clinical.smooth_iterations=0", "clinical.decimate_fraction=1.0",
    ])
    assert rc == 0
    verts, _ = load_mesh(out)
    assert len(verts) > 20


def test_cli_synthetic_data(tmp_path):
    out = tmp_path / "data"
    rc = cli_main([
        "synthetic-data", "--out", str(out), "--frames", "6", "--size", "48",
        "render.use_pallas=never",
    ])
    assert rc == 0
    assert len(list((out / "images").glob("*.png"))) == 6
    assert (out / "flame_param.npz").exists()
    assert (out / "transforms_train.json").exists()


@pytest.mark.slow
def test_cli_prepare_models(tmp_path, monkeypatch):
    """`cli prepare-models` trains + caches the neural detector and the
    matting net (the framework's analogue of the reference's external
    model-weight downloads)."""
    monkeypatch.setenv("OMFS4D_CACHE", str(tmp_path / "cache"))
    rc = cli_main([
        "prepare-models", "--workdir", str(tmp_path / "wd"),
        "track.detector_steps=10", "track.detector_size=64",
        "pipeline.matting_train_steps=10",
        "render.use_pallas=never",
    ])
    assert rc == 0
    cache = tmp_path / "cache"
    names = [p.name for p in cache.iterdir()]
    assert any(n.startswith("landmark_net") for n in names), names
    assert any(n.startswith("segnet") for n in names), names
