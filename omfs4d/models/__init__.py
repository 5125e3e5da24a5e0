from omfs4d.models.flame import FlameModel, flame_forward, flame_landmarks  # noqa: F401
from omfs4d.models.assets import load_flame_asset, synthetic_flame_asset  # noqa: F401
from omfs4d.models.gaussians import GaussianAvatar, init_gaussians_on_mesh  # noqa: F401
