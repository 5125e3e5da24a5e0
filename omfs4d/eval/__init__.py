from omfs4d.eval.reporting import generate_report, psnr, ssim_global  # noqa: F401
from omfs4d.eval.head_coverage import evaluate_head_coverage  # noqa: F401
