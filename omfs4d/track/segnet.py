"""Self-trained neural foreground matting (JAX encoder-decoder).

The reference mats frames with GPU NN models (robust_video_matting /
BackgroundMattingV2 through VHAP, ref: preprocess_video.py:132,
app.py:1281) — neither ships in this image.  Like the landmark detector
(track/detector.py), this module trains its own model by domain-randomized
self-supervision: the synthetic face sampler composites FLAME renders over
random backgrounds and *knows the true alpha*, so (image, alpha) pairs are
free.  A small strided-conv encoder / resize-conv decoder predicts the
matte; weights are cached as an .npz.

Registered as ``method="neural"`` in omfs4d.track.matting.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from omfs4d.core.logging import get_logger
from omfs4d.models.flame import FlameModel
from omfs4d.track.detector import default_cache_dir

log = get_logger("segnet")

#: encoder channels per stride-2 stage; decoder mirrors them
_ENC = (16, 32, 64, 128)


def init_segnet(key, image_size: int = 96) -> dict:
    params = {}
    c_in = 3
    for i, c_out in enumerate(_ENC):
        key, k = jax.random.split(key)
        params[f"enc{i}/w"] = jax.random.normal(
            k, (3, 3, c_in, c_out), jnp.float32) * np.sqrt(2.0 / (9 * c_in))
        params[f"enc{i}/b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
    # decoder: after upsample, concat skip then conv
    for i in reversed(range(len(_ENC))):
        c_skip = 3 if i == 0 else _ENC[i - 1]
        c_cat = c_in + c_skip
        c_out = max(c_skip, 16)
        key, k = jax.random.split(key)
        params[f"dec{i}/w"] = jax.random.normal(
            k, (3, 3, c_cat, c_out), jnp.float32) * np.sqrt(2.0 / (9 * c_cat))
        params[f"dec{i}/b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
    key, k = jax.random.split(key)
    params["out/w"] = jax.random.normal(k, (1, 1, c_in, 1), jnp.float32) * 0.1
    params["out/b"] = jnp.zeros((1,), jnp.float32)
    return params


def _conv(x, w, b, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def segnet_apply(params: dict, images: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, 3) float [0,1] -> (B, S, S) alpha logits.

    Per-image standardization: global gain/bias must not shift the matte
    (photometric robustness by construction, cf. detector.net_apply)."""
    mu = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    sd = jnp.std(images, axis=(1, 2, 3), keepdims=True)
    x = (images - mu) / (sd + 1e-5)
    skips = [x]
    for i in range(len(_ENC)):
        x = jax.nn.relu(_conv(x, params[f"enc{i}/w"], params[f"enc{i}/b"],
                              stride=2))
        skips.append(x)
    for i in reversed(range(len(_ENC))):
        skip = skips[i]
        x = jax.image.resize(x, (x.shape[0],) + skip.shape[1:3]
                             + (x.shape[-1],), "nearest")
        x = jnp.concatenate([x, skip], axis=-1)
        x = jax.nn.relu(_conv(x, params[f"dec{i}/w"], params[f"dec{i}/b"]))
    return _conv(x, params["out/w"], params["out/b"])[..., 0]


def train_segnet(
    model: FlameModel,
    steps: int = 800,
    batch_size: int = 16,
    image_size: int = 96,
    lr: float = 1e-3,
    seed: int = 0,
    backend: str = "never",
    log_every: int = 200,
) -> dict:
    """Train on the detector's domain-randomized sampler (alpha is GT)."""
    import optax
    from omfs4d.track.detector import SyntheticFaceSampler

    sampler = SyntheticFaceSampler(model, image_size, backend=backend)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = init_segnet(k_init, image_size)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, images, alpha):
        def loss_fn(p):
            logits = segnet_apply(p, images)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, alpha))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    for i in range(steps):
        key, kb = jax.random.split(key)
        images, _, alpha = sampler.batch(kb, batch_size)
        params, opt_state, loss = step(params, opt_state, images, alpha)
        if log_every and (i % log_every == 0 or i == steps - 1):
            log.info(f"segnet step {i}: bce {float(loss):.4f}")
    return params


def get_or_train_segnet(
    model: FlameModel,
    weights: str | Path | None = None,
    image_size: int = 96,
    steps: int = 800,
    backend: str = "never",
    seed: int = 0,
) -> dict:
    if weights is not None and Path(weights).exists():
        data = np.load(Path(weights))
        return {k: jnp.asarray(data[k]) for k in data.files}
    # "n3" = standardized-input arch on the texture-randomized + shaded
    # sampler; never load stale caches into it
    cache = default_cache_dir() / (
        f"segnet_n3_v{model.n_vertices}_s{image_size}_t{steps}.npz")
    if weights is None and cache.exists():
        log.info(f"loading cached matting weights: {cache}")
        data = np.load(cache)
        return {k: jnp.asarray(data[k]) for k in data.files}
    log.info(f"training matting net ({steps} steps @ {image_size}px)...")
    params = train_segnet(model, steps=steps, image_size=image_size,
                          backend=backend, seed=seed)
    out = Path(weights) if weights else cache
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
    return params


def predict_masks(params: dict, frames: np.ndarray, image_size: int = 96,
                  chunk: int = 32, threshold: float = 0.5) -> np.ndarray:
    """(T, H, W, 3) uint8/float -> (T, H, W) float32 {0,1} masks."""
    T, H, W = frames.shape[:3]
    S = image_size

    @jax.jit
    def run(imgs):
        x = imgs.astype(jnp.float32)
        if frames.dtype == np.uint8:
            x = x / 255.0
        x = jax.image.resize(x, (x.shape[0], S, S, 3), "linear")
        logits = segnet_apply(params, x)
        full = jax.image.resize(logits, (x.shape[0], H, W), "linear")
        return jax.nn.sigmoid(full)

    out = np.concatenate([
        np.asarray(run(jnp.asarray(frames[i:i + chunk])))
        for i in range(0, T, chunk)
    ])
    return (out > threshold).astype(np.float32)
