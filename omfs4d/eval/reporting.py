"""Deterministic validation reporting — strict PSNR/SSIM by view bucket.

Behavioral parity with the reference (ref: validation_reporting.py:16-121):
same PSNR convention (identical images cap at 99.0 dB on uint8 scale), same
global-statistics SSIM, same temporal-progress buckets
(front <0.2 or >0.8 / profile 0.35-0.65 / rear otherwise), same
strict_scores.json + human_review_checklist.md outputs.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

from omfs4d.core.logging import get_logger
from omfs4d.io.video import read_image

log = get_logger("validation_reporting")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on 0-255 images; identical images return the 99.0 dB cap."""
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return 99.0
    return 20.0 * math.log10(255.0 / math.sqrt(mse))


def ssim_global(a: np.ndarray, b: np.ndarray) -> float:
    """Global-statistics SSIM on luma (not windowed — cheap strict gate)."""
    if a.ndim == 3:
        a = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    if b.ndim == 3:
        b = 0.299 * b[:, :, 0] + 0.587 * b[:, :, 1] + 0.114 * b[:, :, 2]
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_x, mu_y = a.mean(), b.mean()
    sig_x = ((a - mu_x) ** 2).mean()
    sig_y = ((b - mu_y) ** 2).mean()
    sig_xy = ((a - mu_x) * (b - mu_y)).mean()
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    return float(
        ((2 * mu_x * mu_y + c1) * (2 * sig_xy + c2))
        / ((mu_x * mu_x + mu_y * mu_y + c1) * (sig_x + sig_y + c2))
    )


def bucket(progress: float) -> str:
    if progress < 0.20 or progress > 0.80:
        return "front"
    if 0.35 <= progress <= 0.65:
        return "profile"
    return "rear"


def find_latest_train_dir(model_path: Path) -> Path:
    train_dir = Path(model_path) / "train"
    if not train_dir.exists():
        raise FileNotFoundError(f"Missing train directory: {train_dir}")
    dirs = [p for p in train_dir.iterdir() if p.is_dir() and p.name.startswith("ours_")]
    if not dirs:
        raise FileNotFoundError(f"No ours_* directories in {train_dir}")
    return sorted(dirs, key=lambda p: int(p.name.split("_")[-1]), reverse=True)[0]


CHECKLIST = """# Human Review Checklist

- [ ] Jawline continuity in profile views.
- [ ] Ear geometry plausibility in left/right profile.
- [ ] Neck-head transition remains stable across motion.
- [ ] No visible shimmer/flicker in slow turns.
- [ ] Maxilla/mandible changes remain anatomically plausible.
"""


def generate_report(model_path, deterministic_frames_dir, output_dir) -> dict:
    """Score the deterministic frame subset against GT; write strict_scores.json."""
    model_path = Path(model_path)
    deterministic_frames_dir = Path(deterministic_frames_dir)
    output_dir = Path(output_dir)

    latest = find_latest_train_dir(model_path)
    renders_dir = latest / "renders"
    gt_dir = latest / "gt"
    if not renders_dir.exists() or not gt_dir.exists():
        raise FileNotFoundError(f"Missing renders/gt directories in {latest}")

    manifest = deterministic_frames_dir / "deterministic_indices_manifest.json"
    if not manifest.exists():
        raise FileNotFoundError(f"Missing deterministic manifest: {manifest}")
    with open(manifest, "r", encoding="utf-8") as f:
        idx_manifest = json.load(f)
    rows = idx_manifest.get("exports", [])

    metrics = []
    max_index = max((int(r.get("index", 0)) for r in rows), default=1)
    for row in rows:
        idx = int(row["index"])
        src_name = row["source"]
        render_path = renders_dir / src_name
        gt_path = gt_dir / src_name
        if not render_path.exists() or not gt_path.exists():
            continue
        a = read_image(render_path).astype(np.float32)
        b = read_image(gt_path).astype(np.float32)
        progress = idx / max(1, max_index)
        metrics.append({
            "index": idx,
            "frame": src_name,
            "progress": progress,
            "bucket": bucket(progress),
            "psnr": psnr(a, b),
            "ssim": ssim_global(a, b),
        })

    summary = {"count": len(metrics), "by_bucket": {}}
    for b in ("front", "profile", "rear"):
        vals = [m for m in metrics if m["bucket"] == b]
        if not vals:
            summary["by_bucket"][b] = {"count": 0, "psnr": None, "ssim": None}
            continue
        summary["by_bucket"][b] = {
            "count": len(vals),
            "psnr": float(np.mean([v["psnr"] for v in vals])),
            "ssim": float(np.mean([v["ssim"] for v in vals])),
        }

    output_dir.mkdir(parents=True, exist_ok=True)
    scores_path = output_dir / "strict_scores.json"
    with open(scores_path, "w", encoding="utf-8") as f:
        json.dump({"summary": summary, "rows": metrics}, f, indent=2)
    (output_dir / "human_review_checklist.md").write_text(CHECKLIST, encoding="utf-8")
    log.info(f"Wrote strict report: {scores_path}")
    return {"summary": summary, "rows": metrics}
