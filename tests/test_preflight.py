"""Runtime preflight gates + pipeline fallback on corrupted captures.

The reference never needs this (it outsources detection/matting to
pretrained MediaPipe / face-alignment / RVM, ref preprocess_video.py:132,163);
a first-party detector needs a first-party runtime gate so a capture the
synthetic training distribution never anticipated degrades loudly — with a
fallback — instead of silently poisoning the tracked dataset.
"""

import json

import numpy as np
import pytest

from omfs4d.core.config import Config
from omfs4d.pipeline.runner import Pipeline
from omfs4d.track.preflight import landmark_preflight, mask_preflight

W = H = 64
T, L = 12, 68


def _good_landmarks(rng):
    """Plausible smooth face-landmark track: a drifting cloud mid-frame."""
    base = np.stack([rng.uniform(0.3 * W, 0.7 * W, L),
                     rng.uniform(0.3 * H, 0.7 * H, L)], axis=1)
    drift = np.cumsum(rng.normal(0, 0.3, (T, 1, 2)), axis=0)
    return (base[None] + drift).astype(np.float32), np.ones(T, bool)


class TestLandmarkGates:
    def test_good_track_passes(self, rng):
        lmk, valid = _good_landmarks(rng)
        rep = landmark_preflight(lmk, valid, W, H)
        assert rep.ok, rep.reasons

    def test_low_valid_fraction_fails(self, rng):
        lmk, valid = _good_landmarks(rng)
        valid[: int(0.7 * T)] = False
        rep = landmark_preflight(lmk, valid, W, H)
        assert not rep.ok and any("valid" in r for r in rep.reasons)

    def test_out_of_bounds_fails(self, rng):
        lmk, valid = _good_landmarks(rng)
        lmk = lmk + 3 * W                      # everything far off-frame
        rep = landmark_preflight(lmk, valid, W, H)
        assert not rep.ok and any("in-bounds" in r for r in rep.reasons)

    def test_collapse_fails(self, rng):
        """A soft-argmax detector collapsing to its heatmap attractor puts
        every landmark at (almost) the same point."""
        lmk = np.full((T, L, 2), W / 2, np.float32)
        lmk += np.random.default_rng(0).normal(0, 0.05, lmk.shape)
        rep = landmark_preflight(lmk, np.ones(T, bool), W, H)
        assert not rep.ok and any("collapse" in r for r in rep.reasons)

    def test_jitter_fails(self, rng):
        """Landmarks teleporting across the frame every step are detector
        noise, not face motion."""
        lmk = np.asarray(
            np.random.default_rng(1).uniform(0, W, (T, L, 2)), np.float32)
        rep = landmark_preflight(lmk, np.ones(T, bool), W, H)
        assert not rep.ok and any("jitter" in r for r in rep.reasons)


class TestMaskGates:
    def _blob(self, cx):
        yy, xx = np.mgrid[:H, :W]
        return ((yy - H / 2) ** 2 + (xx - cx) ** 2 < (H / 4) ** 2
                ).astype(np.float32)

    def test_stable_blob_passes(self):
        masks = np.stack([self._blob(W / 2 + 0.2 * t) for t in range(T)])
        rep = mask_preflight(masks)
        assert rep.ok, rep.reasons

    def test_all_background_fails(self):
        rep = mask_preflight(np.zeros((T, H, W), np.float32))
        assert not rep.ok

    def test_all_foreground_fails(self):
        rep = mask_preflight(np.ones((T, H, W), np.float32))
        assert not rep.ok

    def test_flicker_fails(self):
        """Masks jumping between disjoint regions frame-to-frame."""
        masks = np.stack([self._blob(W / 4 if t % 2 else 3 * W / 4)
                          for t in range(T)])
        rep = mask_preflight(masks)
        assert not rep.ok and any("IoU" in r for r in rep.reasons)


@pytest.fixture()
def pipe(tmp_path):
    cfg = Config()
    return Pipeline(cfg, tmp_path / "work"), tmp_path


def _events(pipe):
    path = pipe.events.path
    if not (path and path.exists()):
        return []
    return [json.loads(line) for line in open(path)]


class TestPipelineFallback:
    def test_corrupted_landmarks_fall_back_to_file(self, pipe, rng):
        """A collapsed detector output + a landmarks.npz next to the frames
        -> the runner swaps in the file and records the fallback in
        events.jsonl (never silently)."""
        from omfs4d.track.landmarks import save_landmarks

        runner, tmp = pipe
        images_dir = tmp / "case" / "images"
        images_dir.mkdir(parents=True)
        good, valid = _good_landmarks(rng)
        save_landmarks(images_dir.parent / "landmarks.npz", good, valid)

        bad = np.full((T, L, 2), W / 2, np.float32)   # collapsed
        out, out_valid = runner._landmarks_with_fallback(
            bad, np.ones(T, bool), images_dir, W, H)
        np.testing.assert_allclose(out, good, atol=1e-5)

        evs = _events(runner)
        assert any(e["event"] == "preflight_warning"
                   and e["stage"] == "track.landmarks" for e in evs)
        fb = [e for e in evs if e["event"] == "preflight_fallback"]
        assert fb and fb[-1]["method"] == "file"

    def test_good_landmarks_pass_through_silently(self, pipe, rng):
        runner, tmp = pipe
        good, valid = _good_landmarks(rng)
        out, _ = runner._landmarks_with_fallback(
            good, valid, tmp / "none", W, H)
        np.testing.assert_array_equal(out, good)
        assert not any(e["event"].startswith("preflight")
                       for e in _events(runner))

    def test_corrupted_masks_fall_back_to_median(self, pipe):
        """All-foreground masks on a static-background capture -> the
        median_background fallback recovers the moving blob."""
        runner, tmp = pipe
        rng = np.random.default_rng(0)
        frames = np.tile(rng.uniform(0, 0.3, (1, H, W, 3)), (T, 1, 1, 1))
        yy, xx = np.mgrid[:H, :W]
        # the blob must traverse farther than its own diameter so the
        # per-pixel temporal median sees background at every pixel
        for t in range(T):
            blob = ((yy - H / 2) ** 2 + (xx - W / 4 - 4.0 * t) ** 2
                    < (H / 6) ** 2)
            frames[t][blob] = (0.9, 0.7, 0.6)
        frames = (frames * 255).astype(np.uint8)

        bad = np.ones((T, H, W), np.float32)
        out = runner._masks_with_fallback(bad, frames)
        assert out is not None
        area = (np.asarray(out) > 0.5).mean()
        assert 0.05 < area < 0.5

        evs = _events(runner)
        fb = [e for e in evs if e["event"] == "preflight_fallback"]
        assert fb and fb[-1]["method"] == "median_background"

    def test_unrecoverable_masks_become_none(self, pipe):
        """When the median fallback cannot help either (pure-noise frames),
        the dataset is written WITHOUT fg masks — flagged, not fabricated."""
        runner, tmp = pipe
        frames = (np.random.default_rng(2)
                  .uniform(0, 255, (T, H, W, 3))).astype(np.uint8)
        out = runner._masks_with_fallback(
            np.ones((T, H, W), np.float32), frames)
        assert out is None
        assert any(e["event"] == "preflight_no_fallback"
                   for e in _events(runner))
