from isosurfacesuperresolution_tpu.models.generators import (
    EnhanceNet, RCAN, TecoGAN, SubpixelNet, create_network,
    network_input_channels)
from isosurfacesuperresolution_tpu.models.videotools import (
    flatten_high, warp_upscale, initial_image)
