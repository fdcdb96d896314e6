from pde_tpu.ops.derivatives import (
    fst_derivatives5,
    snd_derivatives5,
    rgb2grad,
    SMOOTHER5,
    FST_DERIVATOR5,
    SND_DERIVATOR5,
)
from pde_tpu.ops.warp import bilinear_warp, warp_by_flow, identity_grid
from pde_tpu.ops.weights import (
    diffusion_weights_4,
    tensor_diffusion_weights_8,
)
