"""Foreground matting: median-background model on a synthetic moving blob."""

import numpy as np
import pytest

from omfs4d.track.matting import compute_masks


def _synthetic_video(T=12, H=48, W=48):
    rng = np.random.default_rng(0)
    bg = rng.integers(80, 120, (H, W, 3)).astype(np.uint8)
    frames = np.zeros((T, H, W, 3), np.uint8)
    gt = np.zeros((T, H, W), bool)
    for t in range(T):
        frames[t] = bg
        cx = 12 + 2 * t
        yy, xx = np.mgrid[0:H, 0:W]
        blob = (yy - 24) ** 2 + (xx - cx) ** 2 < 64
        frames[t][blob] = [230, 40, 40]
        gt[t] = blob
    return frames, gt


def _iou(masks, gt):
    inter = (masks.astype(bool) & gt).sum()
    union = (masks.astype(bool) | gt).sum()
    return inter / union


def test_border_color_matting_centered_subject():
    """The default matting must handle a CENTERED subject (head video):
    a temporal median would absorb it."""
    rng = np.random.default_rng(1)
    T, H, W = 8, 64, 64
    bg = rng.integers(90, 110, (H, W, 3)).astype(np.uint8)
    frames = np.zeros((T, H, W, 3), np.uint8)
    gt = np.zeros((T, H, W), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(T):
        frames[t] = bg
        blob = (yy - 32) ** 2 + (xx - 32 - (t % 3)) ** 2 < 180
        frames[t][blob] = [210, 150, 60]
        gt[t] = blob
    masks = compute_masks(frames, method="border_color", threshold=40.0)
    assert _iou(masks, gt) > 0.85, _iou(masks, gt)


def test_median_background_matting_moving_subject():
    frames, gt = _synthetic_video()
    masks = compute_masks(frames, method="median_background", threshold=40.0,
                          smooth=1)
    assert masks.shape == frames.shape[:3]
    # moving blob: median background recovers most of it
    assert _iou(masks, gt) > 0.5, _iou(masks, gt)


def test_none_matting():
    frames, _ = _synthetic_video(T=3)
    masks = compute_masks(frames, method="none")
    assert (masks == 1.0).all()


def test_unknown_method_raises():
    with pytest.raises(KeyError):
        compute_masks(np.zeros((1, 4, 4, 3), np.uint8), method="nope")
