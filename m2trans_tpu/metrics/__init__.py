from m2trans_tpu.metrics.psnr import calc_psnr  # noqa: F401
from m2trans_tpu.metrics.ssim import calc_ssim, ssim  # noqa: F401
from m2trans_tpu.metrics.color import rgb_to_ycbcr  # noqa: F401
from m2trans_tpu.metrics.gmsd import gmsd  # noqa: F401
from m2trans_tpu.metrics.fsim import fsim  # noqa: F401
from m2trans_tpu.metrics.eval_recipe import sr_eval_metrics  # noqa: F401
