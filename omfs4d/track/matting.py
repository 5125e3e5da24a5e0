"""Foreground matting -> fg_masks (host-side pluggable stage).

The reference delegates matting to GPU NN models (robust_video_matting /
BackgroundMattingV2 through VHAP, ref: preprocess_video.py:132,
app.py:1281).  Masks are an *input contract*, not core compute (SURVEY.md
§2.2), so this module provides a registry — any callable
(frames (T, H, W, 3) uint8) -> (T, H, W) float mask can plug in — plus two
built-ins that need no ML weights:

  * ``median_background``: a static-camera background model (per-pixel
    temporal median) + color-distance threshold + morphological cleanup;
    works well for the reference's intended capture setup (tripod selfie
    video, ref: app.py:1191).
  * ``none``: full-foreground masks.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

_MATTERS: dict[str, Callable] = {}


def register_matting(name: str):
    def deco(fn: Callable):
        _MATTERS[name] = fn
        return fn
    return deco


def _box_blur(mask: np.ndarray, k: int = 5) -> np.ndarray:
    """Separable box blur via cumulative sums (no cv2 dependency needed)."""
    pad = k // 2
    out = mask.astype(np.float32)
    for axis in (-2, -1):
        p = np.take(out, np.clip(np.arange(-pad, out.shape[axis] + pad),
                                 0, out.shape[axis] - 1), axis=axis)
        c = np.cumsum(p, axis=axis)
        lead = np.take(c, np.arange(k - 1, k - 1 + out.shape[axis]), axis=axis)
        lag = np.concatenate([
            np.zeros_like(np.take(c, [0], axis=axis)),
            np.take(c, np.arange(0, out.shape[axis] - 1), axis=axis),
        ], axis=axis)
        out = (lead - lag) / k
    return out


@register_matting("none")
def _full_fg(frames: np.ndarray, **_) -> np.ndarray:
    return np.ones(frames.shape[:3], dtype=np.float32)


def _box_blur_jnp(mask, k: int):
    """Batched (T, H, W) separable box blur — the jnp twin of _box_blur."""
    import jax.numpy as jnp

    pad = k // 2
    out = mask
    for axis in (-2, -1):
        n = out.shape[axis]
        idx = jnp.clip(jnp.arange(-pad, n + pad), 0, n - 1)
        p = jnp.take(out, idx, axis=axis)
        c = jnp.cumsum(p, axis=axis)
        lead = jnp.take(c, jnp.arange(k - 1, k - 1 + n), axis=axis)
        lag = jnp.concatenate([
            jnp.zeros_like(jnp.take(c, jnp.asarray([0]), axis=axis)),
            jnp.take(c, jnp.arange(0, n - 1), axis=axis),
        ], axis=axis)
        out = (lead - lag) / k
    return out


def _classify_device(frames: np.ndarray, centers: np.ndarray,
                     threshold: float, smooth: int):
    """Distance-to-nearest-color-mode foreground test, jitted.

    Shapes are static per capture; the program is cached in the persistent
    compile cache across runs of the same resolution."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run(fr, cs, thr2, sm):
        f = fr.astype(jnp.float32)
        d2min = jnp.full(f.shape[:3], jnp.inf, jnp.float32)
        for i in range(cs.shape[0]):
            diff = f - cs[i]
            d2min = jnp.minimum(
                d2min, jnp.einsum("thwc,thwc->thw", diff, diff))
        m = (d2min > thr2).astype(jnp.float32)
        if sm > 1:
            m = (_box_blur_jnp(m, sm) > 0.5).astype(jnp.float32)
        return m

    return run(jnp.asarray(frames), jnp.asarray(centers),
               float(threshold) ** 2, int(smooth))


@register_matting("median_background")
def _median_background(
    frames: np.ndarray,
    threshold: float = 30.0,
    sample_every: int = 5,
    smooth: int = 7,
    **_,
) -> np.ndarray:
    """Static-camera matting: per-pixel temporal median is the background;
    pixels further than `threshold` (L2 in RGB) are foreground."""
    f = frames.astype(np.float32)
    bg = np.median(f[::max(sample_every, 1)], axis=0)          # (H, W, 3)
    dist = np.linalg.norm(f - bg[None], axis=-1)               # (T, H, W)
    mask = (dist > threshold).astype(np.float32)
    if smooth > 1:
        mask = np.stack([_box_blur(m, smooth) for m in mask])
        mask = (mask > 0.5).astype(np.float32)
    return mask


@register_matting("border_color")
def _border_color(
    frames: np.ndarray,
    threshold: float = 35.0,
    border: int = 8,
    k: int = 4,
    smooth: int = 5,
    keep_largest: bool = True,
    **_,
) -> np.ndarray:
    """Head-video matting: the subject is centered, so the frame border is
    background.  Fits k color modes to border pixels (Lloyd k-means) and
    classifies pixels by distance to the nearest mode; keeps the largest
    connected foreground component and fills holes.

    This is the right default for the reference's capture protocol (static
    selfie video, subject centered) where a temporal-median background
    model would absorb the subject."""
    frames = np.asarray(frames)
    T, H, W = frames.shape[:3]

    # border pixels only — converting the whole (T, H, W, 3) volume to f32
    # on the host costs seconds of page faults for nothing
    bp = np.concatenate([
        frames[:, :border].reshape(-1, 3),
        frames[:, -border:].reshape(-1, 3),
        frames[:, :, :border].reshape(-1, 3),
        frames[:, :, -border:].reshape(-1, 3),
    ]).astype(np.float32)
    rng = np.random.default_rng(0)
    sample = bp[rng.choice(len(bp), size=min(len(bp), 20_000), replace=False)]
    centers = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(10):
        d = np.linalg.norm(sample[:, None] - centers[None], axis=-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = sample[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)

    # per-pixel classification runs JITTED ON DEVICE: the running-min +
    # blur is ~10 passes over a (T, H, W[, 3]) volume (250+ MB of host
    # temporaries at 60x512^2) — measured 47 s of the track stage on the
    # 1-core host, ~1 ms of device elementwise.  Only the uint8 frames go
    # up and the binary mask comes back.
    mask = np.asarray(_classify_device(frames, centers.astype(np.float32),
                                       float(threshold), int(smooth)))

    if keep_largest:
        from scipy import ndimage
        out = np.zeros_like(mask)
        for t in range(T):
            lab, n = ndimage.label(mask[t] > 0.5)
            if n:
                sizes = ndimage.sum(mask[t] > 0.5, lab, range(1, n + 1))
                keep = lab == (1 + int(np.argmax(sizes)))
                out[t] = ndimage.binary_fill_holes(keep).astype(np.float32)
        mask = out
    return mask


@register_matting("neural")
def _neural(frames: np.ndarray, model=None, weights=None,
            image_size: int = 96, train_steps: int = 800,
            backend: str = "never", **_) -> np.ndarray:
    """Self-trained matting net (track/segnet.py) — the NN analogue of the
    reference's robust_video_matting path.  Trains on domain-randomized
    synthetic renders on first use; afterwards a single jitted forward."""
    from omfs4d.track import segnet

    if model is None:
        from omfs4d.models.assets import synthetic_flame_asset
        from omfs4d.models.flame import FlameModel
        model = FlameModel.from_asset(synthetic_flame_asset())
    params = segnet.get_or_train_segnet(
        model, weights=weights, image_size=image_size, steps=train_steps,
        backend=backend)
    return segnet.predict_masks(params, np.asarray(frames),
                                image_size=image_size)


def compute_masks(frames: np.ndarray, method: str = "border_color",
                  **kwargs) -> np.ndarray:
    """Run a registered matting method -> (T, H, W) float32 in {0, 1}."""
    if method not in _MATTERS:
        raise KeyError(
            f"matting method {method!r} not registered; "
            f"available: {sorted(_MATTERS)}"
        )
    return _MATTERS[method](np.asarray(frames), **kwargs)
