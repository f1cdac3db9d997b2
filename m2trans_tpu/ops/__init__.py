from m2trans_tpu.ops.conv import conv2d, conv1x1, conv3x3  # noqa: F401
from m2trans_tpu.ops.norm import instance_norm  # noqa: F401
from m2trans_tpu.ops.pad import pad_to_multiple, reflect_pad_hw  # noqa: F401
from m2trans_tpu.ops.pixel_shuffle import pixel_shuffle  # noqa: F401
from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt  # noqa: F401
from m2trans_tpu.ops.halo_attention import halo_attention  # noqa: F401
