from isosurfacesuperresolution_tpu.render.camera import (
    CameraParams, OrbitCamera, Orientation, look_at, perspective, project,
    random_sphere_camera)
from isosurfacesuperresolution_tpu.render.raycast import (
    render_gbuffer, march_rays, gradient_normal, compute_ao, shade_hits,
    gbuffer_to_low_input, gbuffer_to_high_target, gbuffer_flow)
from isosurfacesuperresolution_tpu.render.sweep import render_gbuffer_sweep
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.ao_sweep import (
    bake_occlusion_sh, attach_baked_ao, ao_from_sh)
from isosurfacesuperresolution_tpu.render.shading import (
    screen_space_shading, safe_normalize)
