from isosurfacesuperresolution_tpu.infer.pipeline import (
    InferencePipeline, FrameState, make_fused_frame, initial_state)
