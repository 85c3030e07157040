from unidefense_tpu.ops.fft import (
    rfft2,
    irfft2,
    irfft2_packed,
    to_real_channels,
    from_real_channels,
    spectrum_channels,
    abs_angle_packed,
)
from unidefense_tpu.ops.resize import (
    bilinear_resize,
    nearest_resize,
    adaptive_avg_pool,
    global_avg_pool,
    max_pool,
)
from unidefense_tpu.ops.style import frequency_style_transfer, spatial_style_transfer
from unidefense_tpu.ops.perturb import random_noise, gaussian_blur, downscale
from unidefense_tpu.ops.coral import coral
from unidefense_tpu.ops.eig3 import sym_eig3x3
from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

__all__ = [
    "rfft2",
    "irfft2",
    "irfft2_packed",
    "abs_angle_packed",
    "to_real_channels",
    "from_real_channels",
    "spectrum_channels",
    "bilinear_resize",
    "nearest_resize",
    "adaptive_avg_pool",
    "global_avg_pool",
    "max_pool",
    "frequency_style_transfer",
    "spatial_style_transfer",
    "random_noise",
    "gaussian_blur",
    "downscale",
    "coral",
    "sym_eig3x3",
    "sfconv_freq_spatial",
]
