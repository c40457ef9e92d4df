from isosurfacesuperresolution_tpu.utils.profiling import (
    FrameTimer, trace, timed_chain)
from isosurfacesuperresolution_tpu.utils.spectral_norm import (
    spectral_normalize, SNConv, SNDense)
