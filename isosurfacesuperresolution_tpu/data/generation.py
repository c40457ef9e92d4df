"""Training-sequence generation: the renderer-in-the-loop data pipeline.

Parity target: `DataGenerator/DataGeneratorVideo.py` / `DataGeneratorVideo2.py`
- randomized camera paths between two nearby points on a sphere
(maxDist 0.3), random isovalue per dataset range, random material/light,
high-res frames with world-space AO (256 samples, radius 1.0), low-res frames
*re-rendered* at 1/4 resolution (not filtered), flow inpainted over the
background.

Design difference (SURVEY.md section 7): the reference shells out to
`GPURenderer.exe --animation` and round-trips EXR files; here the JAX
renderer produces the arrays directly on-device and the result is either kept
in memory or saved as ``.npy`` in the same layout family the reference uses
(``low_%05d.npy`` etc.), so reference-style datasets remain loadable.

Flow convention: frame t stores flow w.r.t. frame t-1's camera (frame 0:
zero flow); the trainer warps with the *current* frame's flow.  This is the
exact-warp convention documented in `render/raycast.py`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.config import RenderConfig
from isosurfacesuperresolution_tpu.ops.inpaint import inpaint_flow
from isosurfacesuperresolution_tpu.render.camera import CameraParams
from isosurfacesuperresolution_tpu.render.api import render_frame_gbuffer
from isosurfacesuperresolution_tpu.render.raycast import (
    gbuffer_flow, gbuffer_to_high_target, gbuffer_to_low_input)
from isosurfacesuperresolution_tpu.volume.grid import BrickGrid


@dataclass
class SequenceConfig:
    """Randomization ranges (parity: `DataGeneratorVideo.py:13-27,130-137`)."""

    num_frames: int = 10
    high_res: int = 512
    downscaling: int = 4
    max_dist: float = 0.3              # max camera movement over the clip
    distance_range: Tuple[float, float] = (0.6, 1.0)
    look_at_jitter: float = 0.1
    iso_range: Tuple[float, float] = (0.36, 0.36)
    ao_samples: int = 256
    # world-space AO falloff radius.  0.2 on the [-1,1]^3 analytic box gives
    # strong contact shadows with clear crevice structure; the previous
    # default of 1.0 (half the volume!) combined with the old radius/2
    # sampling floor in bake_occlusion_sh produced a near-constant-1.0 AO
    # channel (rmse vs 1.0 as low as 9e-4 across the round-2 clip cache).
    ao_radius: float = 0.2
    fov_y_degrees: float = 45.0
    camera_light_prob: float = 0.7
    inpaint_iterations: int = 8


def _random_point_on_sphere(rng: np.random.RandomState,
                            lower_hemisphere: bool = True) -> np.ndarray:
    v = rng.randn(3)
    v /= np.linalg.norm(v)
    if lower_hemisphere:
        v[2] = -abs(v[2])              # parity: DataGeneratorVideo.py:32-35
    return v


def random_camera_path(rng: np.random.RandomState, cfg: SequenceConfig
                       ) -> List[CameraParams]:
    """Interpolated path between two nearby sphere points
    (parity: `DataGeneratorVideo.py:120-136`, `renderAnimation` interpolation
    `GPURenderer.cpp:803-822`)."""
    d0 = rng.uniform(*cfg.distance_range)
    origin_start = _random_point_on_sphere(rng) * d0
    look_start = _random_point_on_sphere(rng) * cfg.look_at_jitter
    while True:
        origin_end = _random_point_on_sphere(rng) * rng.uniform(
            *cfg.distance_range)
        if np.linalg.norm(origin_end - origin_start) < cfg.max_dist:
            break
    look_end = _random_point_on_sphere(rng) * cfg.look_at_jitter
    up = np.array([0.0, 0.0, -1.0])    # parity: DataGeneratorVideo.py:127
    cams = []
    n = cfg.num_frames
    for t in range(n):
        a = t / (n - 1) if n > 1 else 0.0
        eye = origin_start * (1 - a) + origin_end * a
        look = look_start * (1 - a) + look_end * a
        cams.append(CameraParams.create(eye, look, up, cfg.fov_y_degrees))
    return cams


def random_render_settings(rng: np.random.RandomState, cfg: SequenceConfig,
                           base: RenderConfig):
    """Random isovalue / material / light
    (parity: `DataGeneratorVideo.py:129-137`).

    Returns ``(static_cfg, rp)``: only the camera-light BRANCH lives in the
    static config (two compilations at most); every numeric knob goes into
    the traced `RenderParams` so each random sequence reuses the same
    compiled renderer."""
    from isosurfacesuperresolution_tpu.render.params import RenderParams
    iso = rng.uniform(*cfg.iso_range)
    diffuse = tuple(rng.uniform(0.2, 1.0, 3).tolist())
    spec = float(rng.uniform(0, 1) ** 3 * 0.3)
    exponent = float(rng.randint(4, 65))
    camera_light = bool(rng.uniform(0, 1) < cfg.camera_light_prob)
    light_dir = tuple(_random_point_on_sphere(rng).tolist())
    static_cfg = base.replace(camera_light=camera_light)
    rp = RenderParams.from_config(static_cfg).replace(
        isovalue=iso, diffuse_color=diffuse,
        specular_color=(spec, spec, spec),
        specular_exponent=exponent, light_direction=light_dir)
    return static_cfg, rp


def render_sequence(grid: BrickGrid, cams: Sequence[CameraParams],
                    render_cfg: RenderConfig, seq_cfg: SequenceConfig,
                    rp=None) -> Dict[str, np.ndarray]:
    """Render one clip: dict with

    - ``low``  (T, h, w, 5)  [mask in [-1,1], normal, depth]
    - ``high`` (T, H, W, 6)  [mask, normal, depth, ao]
    - ``flow`` (T, h, w, 2)  inpainted, w.r.t. the previous frame's camera

    High-res frames carry AO; low-res frames are re-rendered without AO
    (parity: `renderAnimation`, `GPURenderer.cpp:807-855` - "low-res is
    re-rendered, not filtered").
    """
    H = seq_cfg.high_res
    h = H // seq_cfg.downscaling
    cfg_high = render_cfg.replace(width=H, height=H,
                                  ao_samples=seq_cfg.ao_samples,
                                  ao_radius=seq_cfg.ao_radius)
    cfg_low = render_cfg.replace(width=h, height=h, ao_samples=0)

    # bake the SH occlusion field once per clip (isovalue is fixed within a
    # clip) so high-res AO renders at sweep speed instead of hemisphere-ray
    # speed (render/ao_sweep.py)
    if (seq_cfg.ao_samples > 0
            and cfg_high.renderer in ("sweep", "sweep_pallas")
            and cfg_high.ao_mode in ("auto", "volume")
            and grid.ao_sh is None
            and getattr(grid, "ao_per_axis", None) is None
            and hasattr(grid, "values")):   # bake needs dense values
        from isosurfacesuperresolution_tpu.render.ao_sweep import (
            attach_baked_ao)
        iso_bake = (cfg_high.isovalue if rp is None
                    else rp.isovalue)
        grid = attach_baked_ao(grid, iso_bake, cfg_high.ao_radius)

    lows, highs, flows = [], [], []
    for t, cam in enumerate(cams):
        cam_prev = cams[t - 1] if t > 0 else cam
        fr_hi = render_frame_gbuffer(grid, cam, cam_prev, cfg_high, rp)
        fr_lo = render_frame_gbuffer(grid, cam, cam_prev, cfg_low, rp)
        highs.append(gbuffer_to_high_target(fr_hi))
        lows.append(gbuffer_to_low_input(fr_lo))
        flow = gbuffer_flow(fr_lo)[None]
        mask = fr_lo[None, ..., 3:4]
        flow = inpaint_flow(flow, mask,
                            iterations=seq_cfg.inpaint_iterations)[0]
        flows.append(flow)
    return {
        "low": np.stack([np.asarray(x) for x in lows]),
        "high": np.stack([np.asarray(x) for x in highs]),
        "flow": np.stack([np.asarray(x) for x in flows]),
    }


def generate_sequences(grids: Sequence[Tuple[BrickGrid, Tuple[float, float]]],
                       num_sequences: int,
                       seq_cfg: SequenceConfig,
                       base_render_cfg: Optional[RenderConfig] = None,
                       seed: int = 0,
                       out_dir: Optional[str] = None,
                       ) -> List[Dict[str, np.ndarray]]:
    """Generate ``num_sequences`` random clips over a volume collection.

    grids: list of (volume, (min_iso, max_iso)) like the descriptor file of
    `DataGeneratorVideo2.py:99-121`.  With ``out_dir`` the clips are also
    saved as ``low_%05d.npy`` / ``high_%05d.npy`` / ``flow_%05d.npy`` in the
    reference's NCHW layout for interchange.
    """
    rng = np.random.RandomState(seed)
    base = base_render_cfg or RenderConfig()
    out = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for i in range(num_sequences):
        grid, iso_range = grids[rng.randint(len(grids))]
        cfg = dataclass_replace_iso(seq_cfg, iso_range)
        cams = random_camera_path(rng, cfg)
        rcfg, rp = random_render_settings(rng, cfg, base)
        seq = render_sequence(grid, cams, rcfg, cfg, rp)
        out.append(seq)
        if out_dir:
            # reference interchange layout: (T, C, H, W)
            np.save(os.path.join(out_dir, "low_%05d.npy" % i),
                    seq["low"].transpose(0, 3, 1, 2))
            np.save(os.path.join(out_dir, "high_%05d.npy" % i),
                    seq["high"].transpose(0, 3, 1, 2))
            np.save(os.path.join(out_dir, "flow_%05d.npy" % i),
                    seq["flow"].transpose(0, 3, 1, 2))
    return out


def dataclass_replace_iso(cfg: SequenceConfig,
                          iso_range: Tuple[float, float]) -> SequenceConfig:
    import dataclasses
    return dataclasses.replace(cfg, iso_range=tuple(iso_range))
