import numpy as np, jax.numpy as jnp
from isosurfacesuperresolution_tpu.volume import analytic
from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.infer.loadedmodel import LoadedModel
from isosurfacesuperresolution_tpu.ops.resize import resize
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.raycast import gbuffer_to_high_target, gbuffer_to_low_input
from isosurfacesuperresolution_tpu.train.trainer import clamp_output

grid = analytic.interface_volume(128)
cam = CameraParams.create((0.9, 0.9, 0.9))
lo = RenderConfig(width=64, height=64, isovalue=0.5, ao_samples=0)
hi = lo.replace(width=256, height=256)
fr_lo = render_frame_gbuffer(grid, cam, cam, lo)
fr_hi = render_frame_gbuffer(grid, cam, cam, hi)
low = gbuffer_to_low_input(fr_lo)[None]
gt = gbuffer_to_high_target(fr_hi)[None]
loaded = LoadedModel.from_run_dir("artifacts/run00001")
pred = clamp_output(loaded.inference(low, None, jnp.zeros(low.shape[:3]+(2,))))
up = resize(low, scale=4.0, method="bilinear")
gtm = np.asarray(gt[0,...,0]) > 0.0
from scipy import ndimage
dist = ndimage.distance_transform_edt(gtm)
for name, x in (("bilinear", up), ("net", pred)):
    en = np.linalg.norm(np.asarray(x[0,...,1:4]) - np.asarray(gt[0,...,1:4]), axis=-1)
    print(f"{name}: interior mean {en[gtm].mean():.4f} p90 {np.percentile(en[gtm],90):.4f} p99 {np.percentile(en[gtm],99):.4f}")
    for lo_d, hi_d in ((0,2),(2,6),(6,16),(16,999)):
        m = gtm & (dist>=lo_d) & (dist<hi_d)
        if m.sum(): print(f"  dist[{lo_d},{hi_d}): mean {en[m].mean():.4f} n={int(m.sum())}")
import imageio.v2 as imageio
def nrm_img(x): return np.asarray((np.clip(np.asarray(x[0,...,1:4])*0.5+0.5,0,1)*255)).astype(np.uint8)
imageio.imwrite("/tmp/iface_gt_n.png", nrm_img(gt))
imageio.imwrite("/tmp/iface_net_n.png", nrm_img(pred))
imageio.imwrite("/tmp/iface_bil_n.png", nrm_img(up))
print("saved /tmp/iface_*_n.png")
