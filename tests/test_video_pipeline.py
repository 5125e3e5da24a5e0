"""Video IO + preprocess stage: synthetic mp4 -> frames -> masks."""

import numpy as np
import pytest

from omfs4d.core.config import Config
from omfs4d.io.video import extract_frames, probe_video, read_image, stitch_video, write_image


@pytest.fixture
def video(tmp_path):
    """Synthetic moving-blob video written via the framework's own stitcher."""
    frames_dir = tmp_path / "src_frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    bg = rng.integers(80, 120, (96, 128, 3)).astype(np.uint8)
    for t in range(12):
        img = bg.copy()
        yy, xx = np.mgrid[0:96, 0:128]
        blob = (yy - 48) ** 2 + (xx - 64 - t) ** 2 < 300
        img[blob] = [220, 120, 60]
        write_image(frames_dir / f"{t:05d}.png", img)
    return stitch_video(frames_dir, tmp_path / "in.mp4", fps=10)


def test_probe_and_extract(video, tmp_path):
    info = probe_video(video)
    assert info["width"] == 128 and info["height"] == 96
    out = extract_frames(video, tmp_path / "frames", target_size=0)
    assert len(out) == 12
    img = read_image(out[0])
    assert img.shape == (96, 128, 3)


def test_extract_downsamples(video, tmp_path):
    out = extract_frames(video, tmp_path / "frames", target_size=48)
    img = read_image(out[0])
    assert min(img.shape[:2]) == 48


def test_extract_max_frames_and_stride(video, tmp_path):
    out = extract_frames(video, tmp_path / "frames", max_frames=3, stride=2)
    assert len(out) == 3


def test_ffmpeg_stitch_contract(tmp_path, monkeypatch):
    """When an ffmpeg binary exists, stitching must use the reference's
    exact encode contract: libx264, yuv420p, preset medium, CRF 18
    (ref render_surgery.py:433-441).  Exercised with a recording stub."""
    import omfs4d.io.video as vid

    frames_dir = tmp_path / "f"
    frames_dir.mkdir()
    for t in range(3):
        write_image(frames_dir / f"{t:05d}.png",
                    np.full((32, 32, 3), t * 40, np.uint8))

    fake = tmp_path / "ffmpeg"
    argfile = tmp_path / "args.txt"
    fake.write_text("#!/bin/bash\n"
                    f"echo \"$@\" > {argfile}\n"
                    "touch \"${@: -1}\"\n")
    fake.chmod(0o755)
    monkeypatch.setattr(vid, "find_ffmpeg", lambda: str(fake))

    out = vid.stitch_video(frames_dir, tmp_path / "out.mp4", fps=25)
    assert out.exists()
    args = argfile.read_text().split()
    for flag, val in (("-c:v", "libx264"), ("-pix_fmt", "yuv420p"),
                      ("-preset", "medium"), ("-crf", "18"),
                      ("-framerate", "25")):
        assert val == args[args.index(flag) + 1], (flag, args)


def test_pipeline_preprocess_stage(video, tmp_path):
    from omfs4d.pipeline.runner import Pipeline

    cfg = Config()
    cfg.pipeline.target_size = 64
    cfg.pipeline.max_frames = 6
    pipe = Pipeline(cfg, tmp_path / "work")
    out = pipe.preprocess(video)
    assert len(list((out / "images").glob("*.png"))) == 6
    # stage cache: second call reuses the same directory without rerun
    out2 = pipe.preprocess(video)
    assert out == out2
