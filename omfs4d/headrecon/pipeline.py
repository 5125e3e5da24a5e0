"""Multi-sequence full-head reconstruction scaffolding.

Parity with the reference's head_recon package (ref:
02_Visual_Engine/head_recon/*.py — explicitly a placeholder scaffold there
too): sequence manifest building, identity-initialized registration with the
first sequence as canonical, canonical-asset carrier npz, and temporal
coverage buckets.  Real multi-sequence fusion (joint FLAME shape across
sequences + merged gaussian sets) layers onto these entry points.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from omfs4d.core.logging import get_logger
from omfs4d.eval.reporting import bucket

log = get_logger("head_recon")


def _count_frames(images_dir: Path) -> int:
    if not images_dir.exists():
        return 0
    return len([p for p in images_dir.iterdir()
                if p.suffix.lower() in (".jpg", ".png")])


def ingest_sequences(capture_root: Path, output_dir: Path) -> Path:
    """Scan a capture root for sequence dirs; write sequence_manifest.json."""
    capture_root = Path(capture_root)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    sequences = []
    for seq_dir in sorted(p for p in capture_root.iterdir() if p.is_dir()):
        transforms = seq_dir / "transforms_train.json"
        images = seq_dir / "images"
        if not transforms.exists() and not images.exists():
            continue
        sequences.append({
            "name": seq_dir.name,
            "path": str(seq_dir.resolve()),
            "transforms_train": str(transforms.resolve()) if transforms.exists() else "",
            "image_count": _count_frames(images),
        })
    manifest = {
        "capture_root": str(capture_root.resolve()),
        "sequence_count": len(sequences),
        "sequences": sequences,
    }
    out_path = output_dir / "sequence_manifest.json"
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    log.info(f"Wrote sequence manifest: {out_path}")
    return out_path


def register_sequences(manifest_path: Path, output_dir: Path) -> Path:
    """Registration table: first sequence is canonical, others start at
    identity (refined by downstream alignment)."""
    manifest_path = Path(manifest_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(manifest_path, "r", encoding="utf-8") as f:
        manifest = json.load(f)
    rows = []
    for i, seq in enumerate(manifest.get("sequences", [])):
        rows.append({
            "name": seq["name"],
            "canonical": i == 0,
            "transform": np.eye(4).tolist(),
            "residual": 0.0,
        })
    out_path = output_dir / "registration_table.json"
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"registrations": rows}, f, indent=2)
    log.info(f"Wrote registration table: {out_path}")
    return out_path


def build_canonical_head(registration_path: Path, output_path: Path,
                         flame_shape: np.ndarray | None = None) -> Path:
    """Canonical head asset npz (metadata carrier consumed by the
    hybrid_full_head rig mode, ref: render_surgery.py:74-85)."""
    registration_path = Path(registration_path)
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(registration_path, "r", encoding="utf-8") as f:
        table = json.load(f)
    np.savez(
        output_path,
        version=np.array([1]),
        n_sequences=np.array([len(table.get("registrations", []))]),
        shape=flame_shape if flame_shape is not None else np.zeros(300, np.float32),
    )
    log.info(f"Wrote canonical head asset: {output_path}")
    return output_path


def evaluate_head_coverage(data_dir: Path, output_dir: Path) -> dict:
    """Temporal-bucket coverage report over the train split."""
    data_dir = Path(data_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(data_dir / "transforms_train.json", "r", encoding="utf-8") as f:
        frames = json.load(f).get("frames", [])
    n = len(frames)
    counts = {"front": 0, "profile": 0, "rear": 0}
    for i in range(n):
        counts[bucket(i / max(1, n - 1))] += 1
    report = {
        "total_frames": n,
        "buckets": counts,
        "covered": {k: v > 0 for k, v in counts.items()},
    }
    out_path = output_dir / "head_coverage_report.json"
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    log.info(f"Wrote head coverage report: {out_path}")
    return report
