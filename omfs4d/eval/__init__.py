from omfs4d.eval.reporting import generate_report, psnr, ssim_global  # noqa: F401
