from isosurfacesuperresolution_tpu.render.camera import (
    CameraParams, OrbitCamera, Orientation, look_at, perspective, project,
    random_sphere_camera)
from isosurfacesuperresolution_tpu.render.raycast import (
    render_gbuffer, march_rays, gradient_normal, compute_ao,
    gbuffer_to_low_input, gbuffer_to_high_target, gbuffer_flow)
