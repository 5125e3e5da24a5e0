"""Self-trained neural facial-landmark detector (JAX CNN, MXU-friendly).

The reference detects landmarks with external GPU models (MediaPipe 478-pt,
flame_fitter.py:200-240; face-alignment FAN via VHAP, preprocess_video.py:163)
— neither ships in this image.  This module provides a first-party detector:
a small strided-conv regressor trained by *domain-randomized self-supervision*
— the framework renders its own FLAME head (random identity/expression/pose/
camera/texture/background/photometrics) with the differentiable rasterizer
and supervises on the projected ground-truth landmark positions.  The whole
data generator + train step is one jitted TPU program; no files, no labels.

Weights are cached as an .npz (flat name->array dict).  The detector is
registered as ``method="neural"`` in omfs4d.track.landmarks, alongside
gated ``mediapipe`` / ``face_alignment`` adapters for when those libraries
are importable.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from omfs4d.core.logging import get_logger
from omfs4d.models.flame import FlameModel, flame_forward, flame_landmarks
from omfs4d.ops.camera import Camera, project_points

log = get_logger("detector")

# strided conv stack: channels per stage (each halves the resolution)
_CHANNELS = (24, 48, 96, 192, 256)
_HIDDEN = 512


def default_cache_dir() -> Path:
    return Path(os.environ.get(
        "OMFS4D_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "omfs4d")
    ))


# ── network ──────────────────────────────────────────────────


def init_net(key, n_landmarks: int, image_size: int = 96) -> dict:
    """He-init parameters for the landmark regressor (flat dict pytree)."""
    params = {}
    c_in = 3
    size = image_size
    for i, c_out in enumerate(_CHANNELS):
        key, k = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        params[f"conv{i}/w"] = jax.random.normal(
            k, (3, 3, c_in, c_out), jnp.float32) * np.sqrt(2.0 / fan_in)
        params[f"conv{i}/b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
        size = (size + 1) // 2
    flat = size * size * c_in
    key, k1, k2 = jax.random.split(key, 3)
    params["fc0/w"] = jax.random.normal(k1, (flat, _HIDDEN)) * np.sqrt(2.0 / flat)
    params["fc0/b"] = jnp.zeros((_HIDDEN,), jnp.float32)
    params["fc1/w"] = jax.random.normal(k2, (_HIDDEN, n_landmarks * 2)) * 0.01
    # bias at image center: predictions start plausible, not at the corner
    params["fc1/b"] = jnp.full((n_landmarks * 2,), 0.5, jnp.float32)
    return params


def net_apply(params: dict, images: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, 3) float in [0,1] -> (B, L, 2) normalized landmark coords."""
    x = images - 0.5
    for i in range(len(_CHANNELS)):
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}/w"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}/b"]
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc0/w"] + params["fc0/b"])
    out = x @ params["fc1/w"] + params["fc1/b"]
    return out.reshape(x.shape[0], -1, 2)


def save_detector(path: str | Path, params: dict) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, **{k: np.asarray(v) for k, v in params.items()})


def load_detector(path: str | Path) -> dict:
    data = np.load(Path(path))
    return {k: jnp.asarray(data[k]) for k in data.files}


# ── domain-randomized synthetic supervision ──────────────────


def _look_at_w2c(eye: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Traceable OpenCV-convention look-at (mirrors ops.camera.look_at_camera)."""
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)
    w2c = jnp.eye(4, dtype=jnp.float32)
    w2c = w2c.at[:3, :3].set(R)
    return w2c.at[:3, 3].set(-R @ eye)


class SyntheticFaceSampler:
    """Jitted generator of (image, normalized-landmark) training pairs.

    Pre-builds a bank of differently-textured avatars on the FLAME mesh;
    each sample draws an avatar, FLAME params, a camera on a randomized
    orbit, a vertical-gradient background, and photometric jitter.
    """

    def __init__(self, model: FlameModel, image_size: int = 96,
                 n_textures: int = 4, max_per_tile: int = 128,
                 backend: str = "never"):
        from omfs4d.io.synthetic import textured_gt_avatar

        self.model = model
        self.size = int(image_size)
        self.backend = backend
        self.max_per_tile = max_per_tile
        bank = [textured_gt_avatar(model, seed=s) for s in range(n_textures)]
        self.avatars = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *bank)
        self._batch_fn = None

    def _sample_one(self, key, avatar) -> tuple[jnp.ndarray, jnp.ndarray]:
        from omfs4d.render.rasterize import render_avatar_frame

        model, S = self.model, self.size
        ks = jax.random.split(key, 12)

        params = {
            "shape": jnp.zeros((model.shapedirs_shape.shape[-1],), jnp.float32),
            "expr": 0.5 * jax.random.normal(
                ks[0], (1, model.shapedirs_expr.shape[-1])),
            "jaw_pose": jnp.concatenate([
                jax.random.uniform(ks[1], (1, 1), minval=0.0, maxval=0.35),
                0.05 * jax.random.normal(ks[2], (1, 2)),
            ], axis=1),
            "rotation": jnp.stack([
                jax.random.uniform(ks[3], (), minval=-0.3, maxval=0.3),
                jax.random.uniform(ks[4], (), minval=-0.6, maxval=0.6),
                jax.random.uniform(ks[5], (), minval=-0.2, maxval=0.2),
            ])[None],
            "translation": 0.02 * jax.random.normal(ks[6], (1, 3)),
        }
        verts = flame_forward(model, params)[0]

        ang = jax.random.uniform(ks[7], (), minval=-0.7, maxval=0.7)
        radius = jax.random.uniform(ks[8], (), minval=0.45, maxval=0.8)
        height = 0.12 * jax.random.normal(ks[9], ())
        eye = jnp.stack([radius * jnp.sin(ang), height, radius * jnp.cos(ang)])
        focal = S * jax.random.uniform(ks[10], (), minval=1.3, maxval=2.2)
        cam = Camera(
            w2c=_look_at_w2c(eye, jnp.zeros(3)),
            fx=focal, fy=focal,
            cx=jnp.float32(S / 2), cy=jnp.float32(S / 2),
            width=S, height=S,
        )

        img, aux = render_avatar_frame(
            avatar, verts, model.faces, cam, S, S,
            background=jnp.zeros(3), max_per_tile=self.max_per_tile,
            backend=self.backend,
        )
        # vertical-gradient background + photometric jitter + sensor noise
        kb = jax.random.split(ks[11], 5)
        c_top = jax.random.uniform(kb[0], (3,))
        c_bot = jax.random.uniform(kb[1], (3,))
        ramp = jnp.linspace(0.0, 1.0, S)[:, None, None]
        bg = c_top * (1 - ramp) + c_bot * ramp
        alpha = aux["alpha"][..., None]
        img = img + (1.0 - alpha) * bg
        gain = jax.random.uniform(kb[2], (), minval=0.6, maxval=1.25)
        bias = jax.random.uniform(kb[3], (), minval=-0.08, maxval=0.12)
        img = jnp.clip(img * gain + bias
                       + 0.02 * jax.random.normal(kb[4], img.shape), 0, 1)

        lmk3d = flame_landmarks(model, verts[None])[0]
        lmk_uv, _ = project_points(cam, lmk3d)
        return img, lmk_uv / S, aux["alpha"]

    def batch(self, key, batch_size: int):
        """(images (B,S,S,3), labels (B,L,2) normalized, alpha (B,S,S))
        — one jit call.  `alpha` is the ground-truth foreground coverage
        (used as matting supervision by track.segnet)."""
        if self._batch_fn is None:
            n_tex = jax.tree_util.tree_leaves(self.avatars)[0].shape[0]

            def gen(key):
                kt, ks = jax.random.split(key)
                tex_idx = jax.random.randint(kt, (batch_size,), 0, n_tex)
                avatars = jax.tree_util.tree_map(
                    lambda a: a[tex_idx], self.avatars)
                return jax.vmap(self._sample_one)(
                    jax.random.split(ks, batch_size), avatars)

            self._batch_fn = jax.jit(gen)
        return self._batch_fn(key)


def train_detector(
    model: FlameModel,
    steps: int = 1500,
    batch_size: int = 32,
    image_size: int = 96,
    lr: float = 3e-4,
    seed: int = 0,
    backend: str = "never",
    log_every: int = 200,
) -> dict:
    """Train the regressor on domain-randomized synthetic renders."""
    import optax

    sampler = SyntheticFaceSampler(model, image_size, backend=backend)
    n_lmk = model.lmk_faces_idx.shape[0]
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = init_net(k_init, n_lmk, image_size)

    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            pred = net_apply(p, images)
            return jnp.mean(optax.huber_loss(pred, labels, delta=0.05))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    for i in range(steps):
        key, kb = jax.random.split(key)
        images, labels, _ = sampler.batch(kb, batch_size)
        params, opt_state, loss = step(params, opt_state, images, labels)
        if log_every and (i % log_every == 0 or i == steps - 1):
            px = float(jnp.sqrt(loss * 2) * image_size)  # rough px scale
            log.info(f"detector step {i}: huber {float(loss):.5f} (~{px:.1f}px)")
    return params


def get_or_train_detector(
    model: FlameModel,
    weights: str | Path | None = None,
    image_size: int = 96,
    steps: int = 1500,
    backend: str = "never",
    seed: int = 0,
) -> dict:
    """Load cached weights keyed by (mesh, size, steps); train if absent."""
    if weights is not None and Path(weights).exists():
        return load_detector(weights)
    n_lmk = model.lmk_faces_idx.shape[0]
    cache = default_cache_dir() / (
        f"landmark_net_v{model.n_vertices}_l{n_lmk}_s{image_size}_t{steps}.npz"
    )
    if weights is None and cache.exists():
        log.info(f"loading cached detector weights: {cache}")
        return load_detector(cache)
    log.info(f"training landmark detector ({steps} steps @ {image_size}px)...")
    params = train_detector(model, steps=steps, image_size=image_size,
                            backend=backend, seed=seed)
    save_detector(Path(weights) if weights else cache, params)
    return params


def detect(
    params: dict,
    frames: np.ndarray,              # (T, H, W, 3) uint8 or float [0,1]
    image_size: int | None = None,
    chunk: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Run the detector over a frame stack -> ((T, L, 2) px coords, valid)."""
    T, H, W = frames.shape[:3]
    S = image_size or int(np.sqrt(params["fc0/w"].shape[0]
                                  / _CHANNELS[-1])) * 2 ** len(_CHANNELS)

    @jax.jit
    def run(imgs):
        x = imgs.astype(jnp.float32)
        if frames.dtype == np.uint8:
            x = x / 255.0
        x = jax.image.resize(x, (x.shape[0], S, S, 3), "linear")
        uv = net_apply(params, x)
        return uv * jnp.array([W, H], jnp.float32)

    out = np.concatenate([
        np.asarray(run(jnp.asarray(frames[i:i + chunk])))
        for i in range(0, T, chunk)
    ])
    return out.astype(np.float32), np.ones(T, bool)
