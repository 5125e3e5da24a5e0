"""Pluggable AI segmentation hook.

The reference ships an optional nnU-Net v2 wrapper that is not wired into
the live UI path (ref: run_segmentation.py:25-90; app.py:544-546 uses HU
thresholding instead).  Parity here is a registry: any callable
(volume, spacing) -> label volume can be registered as a segmenter; the
default is HU thresholding, which is also what the reference actually runs.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

_SEGMENTERS: dict[str, Callable] = {}


def register_segmenter(name: str):
    def deco(fn: Callable):
        _SEGMENTERS[name] = fn
        return fn
    return deco


@register_segmenter("hu_threshold")
def _hu_threshold(volume: np.ndarray, spacing, hu_threshold: float = 300.0, **_) -> np.ndarray:
    return (volume >= hu_threshold).astype(np.uint8)


def segment_volume(volume: np.ndarray, spacing, method: str = "hu_threshold", **kwargs) -> np.ndarray:
    """Run a registered segmenter; returns an integer label volume."""
    if method not in _SEGMENTERS:
        raise KeyError(
            f"segmenter {method!r} not registered; available: {sorted(_SEGMENTERS)}"
        )
    return _SEGMENTERS[method](volume, spacing, **kwargs)
