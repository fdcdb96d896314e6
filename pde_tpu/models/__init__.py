from pde_tpu.models.flow_hs import flow_hs, FlowHSParams
from pde_tpu.models.flow_nd import (
    flow_nd, flow_nd_fused, flow_nd_sequence, FlowNDParams,
)
from pde_tpu.models.flow_ad import flow_ad, FlowADParams
from pde_tpu.models.flow_fmg import flow_fmg, flow_fmg_fused, FlowFMGParams
from pde_tpu.models.disparity import (
    disparity_nd, disparity_nd_fused, DisparityParams,
)
from pde_tpu.models.disparity_sym import disparity_sym, DisparitySymParams
from pde_tpu.models.gac import gac_a, gac_b, GACParams
from pde_tpu.models.tv_denoise import tv_denoise4, tv_denoise8, TVDenoise4Params, TVDenoise8Params
from pde_tpu.models.diffusion import diffusion4, Diffusion4Params
from pde_tpu.models.segmentation import (
    disp_segmentation,
    disp_segmentation_sparse,
    DispSegParams,
)
