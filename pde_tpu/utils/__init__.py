from pde_tpu.utils.io import load_image, load_image_pair, load_yosemite
from pde_tpu.utils.viz import flow2color
