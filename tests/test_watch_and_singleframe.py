"""Auto-continue watcher event tailing + single-frame dataset carving."""

import json
import threading
import time

import numpy as np

from omfs4d.pipeline.watch import wait_for_event
from omfs4d.pipeline.single_frame import build_single_frame_dataset
from omfs4d.io.dataset import FrameDataset


class TestWatch:
    def test_wait_for_event_finds_record(self, tmp_path):
        events = tmp_path / "events.jsonl"

        def writer():
            time.sleep(0.2)
            with open(events, "a") as f:
                f.write(json.dumps({"event": "stage_start", "stage": "track"}) + "\n")
                f.write(json.dumps({"event": "stage_end", "stage": "track",
                                    "seconds": 12.5}) + "\n")

        t = threading.Thread(target=writer)
        t.start()
        rec = wait_for_event(events, "stage_end", stage="track",
                             timeout=10.0, poll=0.1)
        t.join()
        assert rec is not None and rec["seconds"] == 12.5

    def test_wait_for_event_times_out(self, tmp_path):
        rec = wait_for_event(tmp_path / "none.jsonl", "stage_end",
                             timeout=0.3, poll=0.1)
        assert rec is None

    def test_ignores_other_stages(self, tmp_path):
        events = tmp_path / "events.jsonl"
        with open(events, "w") as f:
            f.write(json.dumps({"event": "stage_end", "stage": "preprocess"}) + "\n")
        rec = wait_for_event(events, "stage_end", stage="track",
                             timeout=0.3, poll=0.1)
        assert rec is None


class TestSingleFrame:
    def test_build_single_frame_dataset(self, tmp_path):
        from omfs4d.io.synthetic import make_synthetic_dataset

        synth = make_synthetic_dataset(tmp_path / "src", n_frames=12,
                                       width=48, height=48, n_vertices=400,
                                       backend="never")
        out = build_single_frame_dataset(synth["path"], tmp_path / "one",
                                         frame_index=3)
        ds = FrameDataset(out, split="train")
        assert len(ds) == 1
        assert ds.frame_meta(0)["timestep_index"] == 0
        img = ds.load_image(0)
        assert img.shape == (48, 48, 3)
        # the carved frame's params equal the source's frame-3 params
        src = FrameDataset(synth["path"], split="train")
        p_one = ds.load_frame_params(0)
        p_src = src.load_frame_params(3)
        np.testing.assert_allclose(p_one["jaw_pose"], p_src["jaw_pose"])
        assert (out / "canonical_flame_param.npz").exists()
