"""Single-frame overfit experiment — e2e sanity harness.

Parity with the reference's manual harness (ref: single_frame_experiment.py:
1-15, 32-163): carve a 1-frame dataset out of an existing dataset, train an
avatar on it, render the same pose with zero surgical offsets, and save a
GT/render PNG pair + PSNR for eyeballing.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from omfs4d.core.logging import get_logger
from omfs4d.io.dataset import FrameDataset
from omfs4d.io.video import write_image
from omfs4d.models.flame import FlameModel, flame_forward
from omfs4d.train.losses import psnr
from omfs4d.train.trainer import AvatarTrainer

log = get_logger("single_frame")


def build_single_frame_dataset(data_dir: str | Path, out_dir: str | Path,
                               frame_index: int = 0) -> Path:
    """Copy one frame's worth of dataset into `out_dir` (contract format)."""
    src = Path(data_dir)
    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    ds = FrameDataset(src, split="train")
    meta = dict(ds.frame_meta(frame_index))

    img_src = src / meta["file_path"]
    img_name = Path(meta["file_path"]).name
    shutil.copy2(img_src, out / "images" / img_name)
    meta["file_path"] = f"images/{img_name}"

    if meta.get("fg_mask_path"):
        (out / "fg_masks").mkdir(exist_ok=True)
        mask_name = Path(meta["fg_mask_path"]).name
        shutil.copy2(src / meta["fg_mask_path"], out / "fg_masks" / mask_name)
        meta["fg_mask_path"] = f"fg_masks/{mask_name}"

    (out / "flame_param").mkdir(exist_ok=True)
    params = ds.load_frame_params(frame_index)
    np.savez(out / "flame_param" / "00000.npz", **params)
    meta["flame_param_path"] = "flame_param/00000.npz"
    meta["timestep_index"] = 0

    np.savez(out / "flame_param.npz", **params)
    for extra in ("canonical_flame_param.npz", "points3d.ply"):
        if (src / extra).exists():
            shutil.copy2(src / extra, out / extra)

    payload = {k: v for k, v in ds.transforms.items() if k != "frames"}
    payload["frames"] = [meta]
    payload["timestep_indices"] = [0]
    for name in ("transforms_train.json", "transforms_test.json",
                 "transforms_val.json", "transforms.json"):
        with open(out / name, "w") as f:
            json.dump(payload, f, indent=2)
    return out


def run_single_frame_experiment(
    data_dir: str | Path,
    flame_model: FlameModel,
    out_dir: str | Path,
    iterations: int = 3000,
    frame_index: int = 0,
    use_pallas: str = "auto",
) -> dict:
    """1-frame overfit: train -> render -> save GT/render pair + PSNR."""
    from omfs4d.core.config import TrainConfig

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sf_data = build_single_frame_dataset(data_dir, out / "dataset", frame_index)

    ds = FrameDataset(sf_data, split="train")
    img = ds.load_image(0)
    H, W = img.shape[:2]
    cam = ds.camera(0)
    params = {k: jnp.asarray(v) for k, v in ds.load_frame_params(0).items()
              if k != "dynamic_offset"}
    verts = flame_forward(flame_model, params)[0]

    cfg = TrainConfig(iterations=iterations, opacity_reset_interval=0,
                      max_gaussians=50_000)
    trainer = AvatarTrainer(np.asarray(flame_model.faces), cfg, W, H,
                            use_pallas=use_pallas)
    data = {
        "images": img[None],
        "verts": np.asarray(verts)[None],
        "w2c": np.asarray(cam.w2c)[None],
        "fx": np.asarray([cam.fx], np.float32),
        "fy": np.asarray([cam.fy], np.float32),
        "cx": np.asarray([cam.cx], np.float32),
        "cy": np.asarray([cam.cy], np.float32),
    }
    state = trainer.train(data, output_dir=out / "model")

    render = trainer.render_frame(state, verts, cam)
    score = float(psnr(render, jnp.asarray(img, jnp.float32) / 255.0))
    write_image(out / "single_frame_gt.png", img)
    write_image(out / "single_frame_render.png", np.asarray(render))
    log.info(f"single-frame overfit PSNR: {score:.2f} dB")
    return {"psnr": score, "gt": str(out / "single_frame_gt.png"),
            "render": str(out / "single_frame_render.png")}
