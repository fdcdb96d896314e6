from pde_tpu.core.grid import (
    replicate_border,
    interior_mask,
    checkerboard,
    shift_w,
    shift_e,
    shift_n,
    shift_s,
)
from pde_tpu.core.conv import (
    imfilter_replicate,
    separable_filter,
    gaussian_kernel_1d,
    gaussian_kernel_2d,
    binomial5,
)
from pde_tpu.core.resize import imresize, resize_matrix
from pde_tpu.core.pyramid import pyramid_scales, build_pyramid
from pde_tpu.core.median import medfilt2_3x3, nanmedfilt2
