"""Video decode/encode (ffmpeg when present, OpenCV otherwise).

Replaces the reference's ffmpeg subprocess usage for frame extraction
(ref: preprocess_video.py:45-54) and H.264 stitching
(ref: render_surgery.py:412-449).  Stitching prefers a real ffmpeg binary
(libx264 yuv420p crf18 — the reference's exact encode contract,
render_surgery.py:433-441) and falls back through cv2 codecs:
avc1 -> mp4v -> MJPG.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:                                  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def probe_video(path: str | Path) -> dict:
    cap = cv2.VideoCapture(str(path))
    try:
        return {
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            "fps": float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
            "frame_count": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        }
    finally:
        cap.release()


def extract_frames(
    video_path: str | Path,
    output_dir: str | Path,
    target_size: int = 0,
    max_frames: int = 0,
    stride: int = 1,
) -> list[Path]:
    """Decode a video into numbered PNG frames (RGB), optionally downscaled
    so min(H, W) ~ target_size (ref downsample policy: preprocess_video.py:452-463)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(video_path))
    paths = []
    i = kept = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            if target_size > 0:
                h, w = frame.shape[:2]
                scale = target_size / min(h, w)
                if scale < 1.0:
                    frame = cv2.resize(frame, (int(round(w * scale)), int(round(h * scale))),
                                       interpolation=cv2.INTER_AREA)
            p = out / f"{kept:05d}.png"
            cv2.imwrite(str(p), frame)
            paths.append(p)
            kept += 1
            if max_frames and kept >= max_frames:
                break
        i += 1
    cap.release()
    return paths


def read_image(path: str | Path) -> np.ndarray:
    """Read an image as (H, W, 3) uint8 RGB."""
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def write_image(path: str | Path, rgb: np.ndarray) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.5 else arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        cv2.imwrite(str(path), arr)
    else:
        cv2.imwrite(str(path), cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))


def find_ffmpeg() -> str | None:
    """Locate an ffmpeg binary: PATH first, then the imageio_ffmpeg wheel."""
    exe = shutil.which("ffmpeg")
    if exe:
        return exe
    try:                                           # pragma: no cover - env
        import imageio_ffmpeg
        return imageio_ffmpeg.get_ffmpeg_exe()
    except Exception:
        return None


def ffmpeg_stitch_cmd(ffmpeg_bin: str, pattern: str, output_path: str,
                      fps: int, crf: int = 18) -> list[str]:
    """The reference's exact H.264 encode invocation
    (render_surgery.py:433-441): libx264, yuv420p, preset medium, CRF 18."""
    return [
        ffmpeg_bin, "-y",
        "-framerate", str(fps),
        "-i", pattern,
        "-c:v", "libx264",
        "-pix_fmt", "yuv420p",
        "-preset", "medium",
        "-crf", str(crf),
        str(output_path),
    ]


def _stitch_ffmpeg(frames: list[Path], out_path: Path, fps: int,
                   ffmpeg_bin: str) -> None:
    import tempfile

    with tempfile.TemporaryDirectory(prefix="stitch_") as tmp:
        for i, src in enumerate(frames):
            shutil.copy2(src, Path(tmp) / f"frame_{i:05d}.png")
        cmd = ffmpeg_stitch_cmd(
            ffmpeg_bin, str(Path(tmp) / "frame_%05d.png"), str(out_path), fps)
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(f"ffmpeg failed:\n{res.stderr[-2000:]}")


def stitch_video(frames_dir: str | Path, output_path: str | Path, fps: int = 30) -> Path:
    """Stitch sorted PNG frames into an MP4 (parity: render_surgery.py:412-449).

    Uses ffmpeg (libx264 yuv420p crf18 — the reference's encode contract)
    when a binary is available; otherwise the cv2 codec ladder.
    """
    frames = sorted(Path(frames_dir).glob("*.png"))
    if not frames:
        raise FileNotFoundError(f"No PNG frames in {frames_dir}")
    out_path = Path(output_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    ffmpeg_bin = find_ffmpeg()
    if ffmpeg_bin:
        _stitch_ffmpeg(frames, out_path, fps, ffmpeg_bin)
        return out_path

    first = cv2.imread(str(frames[0]))
    h, w = first.shape[:2]

    writer = None
    for codec in ("avc1", "mp4v", "MJPG"):
        fourcc = cv2.VideoWriter_fourcc(*codec)
        writer = cv2.VideoWriter(str(out_path), fourcc, float(fps), (w, h))
        if writer.isOpened():
            break
        writer.release()
        writer = None
    if writer is None:
        raise RuntimeError("no available video codec (tried avc1, mp4v, MJPG)")

    for p in frames:
        img = cv2.imread(str(p))
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    return out_path
