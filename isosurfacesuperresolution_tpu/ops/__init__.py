from isosurfacesuperresolution_tpu.ops.resize import (
    resize, pixel_shuffle, pixel_unshuffle)
from isosurfacesuperresolution_tpu.ops.sampling import grid_sample
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.ops.metrics import (
    psnr, ssim, msssim, MeanVariance)
from isosurfacesuperresolution_tpu.ops.separable_warp import (
    interp_matrix, scale_translate_2d, rowwise_resample, homography_warp)
from isosurfacesuperresolution_tpu.ops.warp_fast import warp_upscale_fast
from isosurfacesuperresolution_tpu.ops.pallas_conv import conv3x3
