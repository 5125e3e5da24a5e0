from omfs4d.train.losses import l1_loss, dssim_loss, psnr  # noqa: F401
from omfs4d.train.trainer import AvatarTrainer, TrainState  # noqa: F401
from omfs4d.train.gates import run_quality_gates  # noqa: F401
