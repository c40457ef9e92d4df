from isosurfacesuperresolution_tpu.ops.resize import (
    resize, pixel_shuffle, pixel_unshuffle)
from isosurfacesuperresolution_tpu.ops.sampling import grid_sample
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.ops.metrics import (
    psnr, ssim, msssim, MeanVariance)
