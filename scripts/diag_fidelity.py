"""Attribute the e2e fidelity gap between tracker and trainer (512^2 work).

Two legs over the same synthetic capture:

  * ``--leg trainer``: train the avatar directly on the dataset's GROUND
    TRUTH FLAME params + camera (the synthetic case writes them), render
    the zero-offset self-reconstruction, score PSNR.  This is the
    trainer's ceiling at this resolution — no tracker error in the loop.
  * ``--leg full``: the normal pipeline (neural landmarks -> staged
    tracker with a deliberately wrong focal guess -> train), same score.

The difference between the two legs is the dB the tracker loses.

    python scripts/diag_fidelity.py --size 512 --frames 60 --iters 5000 --leg trainer
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--leg", choices=("trainer", "full"), default="trainer")
    ap.add_argument("--workdir", default="/tmp/omfs4d_diag")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--densify-interval", type=int, default=0,
                    help="override train.densify_interval (0 = config default)")
    ap.add_argument("--max-gaussians", type=int, default=0)
    ap.add_argument("--set", action="append", default=[],
                    help="dotted config override, e.g. "
                         "--set train.lr_flame_pose=3e-4 (repeatable)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import numpy as np

    from omfs4d.core.config import Config
    from omfs4d.io.synthetic import make_synthetic_dataset
    from omfs4d.io.video import stitch_video
    from omfs4d.ops.camera import look_at_camera
    from omfs4d.pipeline.runner import Pipeline

    backend = jax.default_backend()
    use_pallas = "always" if backend == "tpu" else "never"
    print(f"[diag] backend={backend} leg={args.leg}", flush=True)
    work = Path(args.workdir) / f"{args.leg}_{args.size}"
    work.mkdir(parents=True, exist_ok=True)
    S = args.size

    # trainer leg: the GT capture must use the PIPELINE's FLAME topology
    # (5143 verts) so its params drive the trainer's model exactly; the
    # full leg keeps the default 1500-vert GT head (the tracker never sees
    # GT params, only pixels — a deliberately out-of-model subject)
    n_verts = 5143 if args.leg == "trainer" else 1500
    case = make_synthetic_dataset(work / "case", n_frames=args.frames,
                                  width=S, height=S, backend=use_pallas,
                                  n_vertices=n_verts)

    cfg = Config()
    cfg.pipeline.target_size = S
    cfg.pipeline.max_frames = args.frames
    cfg.pipeline.min_train_frames = min(50, max(args.frames - 2, 1))
    cfg.render.use_pallas = use_pallas
    cfg.train.iterations = args.iters
    if args.densify_interval:
        cfg.train.densify_interval = args.densify_interval
    if args.max_gaussians:
        cfg.train.max_gaussians = args.max_gaussians
    from omfs4d.core.config import apply_override
    for ov in args.set:
        k, v = ov.split("=", 1)
        apply_override(cfg, k, v)
    pipe = Pipeline(cfg, work / "wd")

    t0 = time.time()
    if args.leg == "trainer":
        data_dir = case["path"]          # GT params + GT camera, no tracker
    else:
        video = stitch_video(work / "case" / "images", work / "in.mp4",
                             fps=25)
        frames_dir = pipe.preprocess(video)
        cam = look_at_camera(eye=(0, 0, 0.5), target=(0, 0, 0),
                             fx=1.6 * S, width=S, height=S)
        data_dir = pipe.track(frames_dir, cam, landmark_method="auto")
    t_track = time.time() - t0

    t0 = time.time()
    model_dir = pipe.train(data_dir, iterations=args.iters)
    t_train = time.time() - t0

    det = work / "det_self"
    pipe.render_surgery(model_dir, data_dir, work / "self.mp4", 0.0, 0.0,
                        export_frames_dir=str(det))
    rep = pipe.report(model_dir, det, output_dir=work / "rep")
    rows = rep.get("rows", [])
    psnrs = [r["psnr"] for r in rows]
    out = {
        "leg": args.leg, "size": S, "frames": args.frames,
        "iters": args.iters, "overrides": args.set,
        "densify_interval": cfg.train.densify_interval,
        "selfrecon_psnr": float(np.mean(psnrs)) if psnrs else None,
        "psnr_min": float(np.min(psnrs)) if psnrs else None,
        "psnr_max": float(np.max(psnrs)) if psnrs else None,
        "psnr_std": float(np.std(psnrs)) if psnrs else None,
        "per_frame": [(r["index"], round(r["psnr"], 2)) for r in rows],
        "t_track_s": round(t_track, 1), "t_train_s": round(t_train, 1),
    }
    (work / "diag.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
