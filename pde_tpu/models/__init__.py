from pde_tpu.models.tv_denoise import tv_denoise4, tv_denoise8, TVDenoise4Params, TVDenoise8Params
from pde_tpu.models.diffusion import diffusion4, Diffusion4Params
from pde_tpu.models.segmentation import (
    disp_segmentation,
    disp_segmentation_sparse,
    DispSegParams,
)
