"""Facial-landmark detection interface (host-side stage).

The reference uses GPU NN detectors (MediaPipe 478-pt in flame_fitter.py:
200-244; face-alignment/STAR through VHAP, run_full_pipeline_conda.ps1:
166-168).  Neither ships in this image, so detection is a *pluggable host
stage*: any callable (images_dir | array) -> (T, 68, 2) landmarks (or None
per missing frame) can be registered; built-ins cover files-on-disk and the
synthetic-GT path used by tests/benches.  The MediaPipe 478->68 index map is
preserved so a MediaPipe plugin drops in unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np

# 68-point subset of MediaPipe's 478 landmarks (same correspondence table
# the reference uses, flame_fitter.py:45-66) — kept for plugin detectors.
MEDIAPIPE_TO_68 = [
    10, 338, 297, 332, 284, 251, 389, 356, 454,
    323, 361, 288, 397, 365, 379, 378, 400,
    46, 53, 52, 65, 55,
    285, 295, 282, 283, 276,
    6, 197, 195, 5,
    48, 115, 220, 45, 4,
    33, 160, 158, 133, 153, 144,
    362, 385, 387, 263, 373, 380,
    61, 40, 37, 0, 267, 270, 291,
    321, 314, 17, 84, 91,
    78, 82, 13, 312, 308, 317, 14, 87,
]

_DETECTORS: dict[str, Callable] = {}


def register_detector(name: str):
    def deco(fn: Callable):
        _DETECTORS[name] = fn
        return fn
    return deco


@register_detector("file")
def _from_file(source, **kw):
    """Load landmarks from `<dir>/landmarks.npz` (keys: landmarks, valid)."""
    p = Path(source)
    npz = p / "landmarks.npz" if p.is_dir() else p
    data = np.load(npz)
    lmk = np.asarray(data["landmarks"], np.float32)
    valid = np.asarray(data.get("valid", np.ones(len(lmk), bool)))
    return lmk, valid


@register_detector("synthetic")
def _synthetic(source, model=None, params=None, cameras=None, **kw):
    """Project the GT FLAME landmarks (tests/benches: perfect detector)."""
    import jax.numpy as jnp
    from omfs4d.models.flame import flame_forward, flame_landmarks
    from omfs4d.ops.camera import Camera, project_points

    verts = flame_forward(model, {k: jnp.asarray(v) for k, v in params.items()})
    lmk3d = flame_landmarks(model, verts)          # (T, 68, 3)
    T = lmk3d.shape[0]
    out = np.zeros((T, lmk3d.shape[1], 2), np.float32)
    for i in range(T):
        # NOTE: Camera is itself a NamedTuple — check for it before list/tuple
        cam = cameras if isinstance(cameras, Camera) else cameras[i]
        uv, _ = project_points(cam, lmk3d[i])
        out[i] = np.asarray(uv)
    return out, np.ones(T, bool)


def detect_landmarks(source, method: str = "file", **kw):
    """Run a registered detector; returns ((T, L, 2) float32, (T,) valid)."""
    if method not in _DETECTORS:
        raise KeyError(
            f"landmark detector {method!r} not registered; "
            f"available: {sorted(_DETECTORS)}"
        )
    return _DETECTORS[method](source, **kw)


def save_landmarks(path, landmarks: np.ndarray, valid: np.ndarray | None = None):
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, landmarks=landmarks,
             valid=valid if valid is not None else np.ones(len(landmarks), bool))
