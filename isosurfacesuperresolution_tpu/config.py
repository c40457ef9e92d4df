"""Configuration tree for the TPU isosurface super-resolution framework.

One dataclass hierarchy replaces the reference's three config mechanisms
(argparse in `mainVideoUnshaded.py:33-160`, CLI11 in `CPURenderer.cpp:119-217`,
and the `setParameter` pipe protocol of `GPURendererDirect.cpp:395-428`).
The loss specification keeps the reference's DSL string format
(`"l1:mask:1,temp-l2:color:0.1"`, parsed in `lossnet_unshaded.py:30`) for CLI
parity.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# G-buffer channel layout (reference: render_kernel.cu:254-265)
# ---------------------------------------------------------------------------

# Full renderer frame: 12 channels per pixel.
CH_RGB = slice(0, 3)       # shaded color
CH_MASK = 3                # 1 = hit, 0 = background
CH_NORMAL = slice(4, 7)    # view-space normal
CH_DEPTH = 7               # NDC depth of the hit
CH_FLOW = slice(8, 10)     # screen-space flow (current -> next camera)
CH_AO = 10                 # ambient occlusion (1 = unoccluded)
CH_SHADOW = 11             # unused, always 1 (parity: render_kernel.cu:220)
NUM_RENDER_CHANNELS = 12

# Training tensors (reference: mainVideoUnshaded.py:210-214):
#   low-res input:   5 ch  [mask in [-1,1], nx, ny, nz, depth]
#   high-res target: 6 ch  [mask, nx, ny, nz, depth, ao]
LOW_CHANNELS = 5
HIGH_CHANNELS = 6


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RenderConfig:
    """Ray-march + shading settings.

    Mirrors the constants the reference renderer uploads per frame
    (`GPURendererDirect.cpp:309-365`, `render_kernel.cu:20-43`).
    """

    width: int = 320
    height: int = 240
    fov_degrees: float = 45.0          # vertical field of view
    z_near: float = 0.1
    z_far: float = 10.0

    # renderer backend: "sweep" = gather-free shear-warp sweep (TPU fast
    # path); "march" = per-ray lattice marching (reference-faithful; also
    # the CPU/test oracle)
    renderer: str = "sweep"
    sweep_oversample: float = 1.5      # intermediate grid resolution factor
    sweep_z_supersample: int = 2       # slice planes per voxel along the axis
    # view-adaptive oversampling: rays hitting the slice planes obliquely
    # (diagonal views, the shear-warp's worst case) smear the 2-tap
    # resample; concrete-camera callers scale the intermediate grid by the
    # axis obliquity 1/max|f| (bucketed to 0.5 so the compile count stays
    # bounded).  Traced-camera callers (the fused interactive frame) keep
    # the static base factor - shapes must be static under jit.
    # Measured (tests/test_sweep.py): diagonal-view mask IoU vs the march
    # oracle 0.91 -> 0.97.
    sweep_adaptive_oversample: bool = True
    sweep_max_oversample: float = 3.5
    # occupancy-gated tiled Pallas march (render/sweep_pallas_tiled.py)
    # for large sparse volumes: 0 = auto (tile when the permuted slice
    # plane reaches 512 on an axis), -1 = never, >0 = forced tile size
    sweep_tile: int = 0
    # dtype of the per-slice resample matmuls (accumulation is always f32).
    # bfloat16 doubles the MXU rate of the sweep's dominant cost; the
    # density quantization (~3e-3 relative) is below the isosurface
    # refinement's half-voxel sampling error.  float32 = reference-exact.
    sweep_dtype: str = "float32"

    # direct volume rendering (`render/volume_render.py`): transfer-function
    # opacity multiplier per unit voxel of path length
    volume_alpha_scale: float = 1.0

    isovalue: float = 0.36
    step_voxels: float = 0.25          # march step in voxel units
                                       # (reference uses 0.05: GPURendererDirect.cpp:365;
                                       #  we default coarser + rely on 10+ binary steps)
    binary_search_steps: int = 10      # render_kernel.cu:21
    max_march_steps: int = 4096        # safety bound on fine steps

    # Ambient occlusion (render_kernel.cu:31-43; ray-sampled mode)
    ao_samples: int = 0                # 0 disables AO (=> ao channel = 1)
    ao_mode: str = "auto"              # auto: baked SH field if the grid
                                       # carries one (render/ao_sweep.py),
                                       # hemisphere rays otherwise;
                                       # "ray" | "volume" force a backend
    ao_radius: float = 0.1             # world-space falloff radius
    ao_bias: float = 1e-3              # backtrack along the ray to avoid acne
    ao_rotations: int = 4              # 4x4 grid of random rotation vectors
    ao_ray_steps: int = 128            # fine-step budget for each AO ray

    # In-kernel Phong shading of the RGB channels (render_kernel.cu:232-237)
    light_direction: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    camera_light: bool = True          # light from the camera (GPURendererDirect.cpp:341-343)
    ambient_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    diffuse_color: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    specular_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    specular_exponent: int = 16

    # Focus-of-context viewport clipping (minX, minY, maxX, maxY);
    # None = full frame (render_kernel.cu:222).
    viewport: Optional[Tuple[int, int, int, int]] = None

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ShadingConfig:
    """Screen-space deferred shading (reference: utils/shading.py)."""

    ambient_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    diffuse_color: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    specular_color: Tuple[float, float, float] = (0.02, 0.02, 0.02)
    specular_exponent: int = 16
    enable_specular: bool = False      # loss shading disables specular
                                       # (lossnet_unshaded.py:122)
    light_direction: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    material_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    ao_strength: float = 1.0
    inverse_ao: bool = False
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def replace(self, **kw) -> "ShadingConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Generator configuration (reference: models/__init__.py:21-49)."""

    model: str = "EnhanceNet"
    upscale_factor: int = 4
    input_channels: int = LOW_CHANNELS
    output_channels: int = HIGH_CHANNELS
    # channels of the input that take part in the residual reconstruction
    channel_mask: Tuple[int, ...] = (0, 1, 2, 3, 4)
    upsample: str = "bilinear"         # nearest | bilinear | bicubic | pixelShuffle
    recon_type: str = "residual"       # residual | direct
    use_bn: bool = False
    # spectral normalization of every generator conv kernel (the reference's
    # --useSN applies torch's spectral_norm to generator AND discriminators,
    # mainVideoUnshaded.py:334-339); implemented as a stateless param
    # transform at apply time (utils/spectral_norm.apply_sn_tree)
    use_sn: bool = False
    num_residual_blocks: int = 10
    num_features: int = 64
    compute_dtype: str = "float32"     # "bfloat16" for the fast path
    # Fold `upsample x2 -> conv` into one low-res conv + pixel shuffle
    # (ops/fused_upsample.py): same parameters, exact in the interior, only
    # the 1-px high-res border differs.  Off for training (keeps the
    # reference's border semantics bit-for-bit); the fused inference
    # pipeline and bench turn it on.
    fused_upsample: bool = False
    # planar engine: run post3 as two row-phase convs (2/3 the dense MACs,
    # full-lane outputs) instead of one dense planar conv
    # (infer/planar.planar_tail_conv_split)
    planar_split_tail: bool = False
    # planar engine: run post3 through the 2-D-blocked Pallas phase
    # kernel (minimal-FLOP phase matmuls, VMEM-resident f32 accumulators;
    # ops/phase_conv.phase_conv3x3_amajor_blocked).  64-feature nets only.
    planar_phase_tail: bool = False
    # planar engine: post-training int8 quantization of the trunk/post convs
    # (per-output-channel weight scales, dynamic per-tensor activation
    # scales, s8 x s8 -> s32 MXU convs; the final `out` conv and the
    # residual reconstruction stay full precision for depth fidelity).
    # Inference-only - training ignores it.  See infer/planar._conv.
    planar_int8: bool = False


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

VALID_LOSS_NAMES = (
    "mse", "l2", "l2_loss", "l1", "l1_loss", "tl2", "temp-l2",
    "l2-ds", "l1-ds", "perceptual", "texture", "adv", "gan", "tgan", "sgan",
    "gdl",   # gradient-difference loss (rebuild addition, builder.py)
)
VALID_LOSS_TARGETS = ("mask", "normal", "color", "ao", "depth", "all")

_CANONICAL = {"l2": "mse", "l2_loss": "mse", "l1_loss": "l1",
              "tl2": "temp-l2", "gan": "adv"}


def parse_loss_dsl(spec: str) -> Dict[Tuple[str, str], float]:
    """Parse the reference's loss DSL ``"<loss>:<target>:<weight>,..."``.

    Returns a dict mapping ``(canonical_name, target) -> weight``.
    Parity: `losses/lossnet_unshaded.py:30-107`.
    """
    weights: Dict[Tuple[str, str], float] = {}
    for token in spec.split(","):
        token = token.strip()
        if not token:
            continue
        parts = token.split(":")
        if len(parts) < 2:
            raise ValueError(f"illegal format for loss list entry: {token!r}")
        name, target = parts[0], parts[1]
        weight = float(parts[2]) if len(parts) > 2 else 1.0
        if name not in VALID_LOSS_NAMES:
            raise ValueError(f"unknown loss {name!r}")
        if target not in VALID_LOSS_TARGETS:
            raise ValueError(f"Unknown target: {target}")
        name = _CANONICAL.get(name, name)
        if name in ("adv", "tgan", "sgan") and target != "all":
            raise ValueError(f"{name} loss requires target 'all'")
        weights[(name, target)] = weight
    return weights


def parse_layer_weights(spec: str) -> List[Tuple[str, float]]:
    """Parse VGG layer lists like ``"conv_1:0.03,conv_5:1.0"``.

    Parity: `lossnet_unshaded.py:72-77`.
    """
    out: List[Tuple[str, float]] = []
    for token in spec.split(","):
        token = token.strip()
        if not token:
            continue
        if ":" in token:
            name, w = token.split(":")
            out.append((name, float(w)))
        else:
            out.append((token, 1.0))
    return out


@dataclass(frozen=True)
class LossConfig:
    """Loss-stack configuration (reference: mainVideoUnshaded.py:70-90)."""

    losses: str = "l1:mask:1,l1:ao:1,l1:normal:10,l1:depth:10,temp-l2:color:0.1"
    # VGG layer weights; defaults derived by VGGAnalysis.py in the reference
    # reference defaults derived with VGGAnalysis.py
    # (mainVideoUnshaded.py:75-78): per-layer inverse-response weights over
    # all 16 convs of the trimmed VGG-19
    perceptual_loss_layers: str = (
        "conv_1:0.026423,conv_2:0.009285,conv_3:0.006710,conv_4:0.004898,"
        "conv_5:0.003910,conv_6:0.003956,conv_7:0.003813,conv_8:0.002968,"
        "conv_9:0.002997,conv_10:0.003631,conv_11:0.004147,conv_12:0.005765,"
        "conv_13:0.007442,conv_14:0.009666,conv_15:0.012586,conv_16:0.013377")
    texture_loss_layers: str = "conv_1:1,conv_3:1,conv_5:1"
    discriminator: str = "enhanceNetLarge"
    # shading constants used inside the loss (lossnet_unshaded.py:116-126)
    loss_ambient: float = 0.1
    loss_diffuse: float = 1.0
    loss_specular: float = 0.0
    loss_ao: float = 1.0
    padding: int = 16                  # border zeroing in pixels
    gan_type: str = "bce"              # bce | wgan | wgan-gp
    wgan_lambda: float = 10.0

    def weight_dict(self) -> Dict[Tuple[str, str], float]:
        return parse_loss_dsl(self.losses)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    """Training operating point (reference: README.md:50-71, mainVideoUnshaded.py)."""

    batch_size: int = 16
    crop_size: int = 32                # low-res crop; high-res = 4x
    num_frames: int = 10               # frames per clip (BPTT length)
    samples: int = 500                 # crops sampled per epoch
    test_fraction: float = 0.2
    epochs: int = 1000
    learning_rate: float = 1e-4
    optimizer: str = "adam"            # adam | rmsprop | rprop (reference --optim)
    lr_gamma: float = 0.5
    lr_step: int = 500
    beta1: float = 0.9
    beta2: float = 0.999
    # global-norm gradient clipping (0 = off): bounds the occasional
    # outlier-batch spikes of the 10x-weighted masked losses
    grad_clip: float = 1.0
    seed: int = 42
    initial_image_mode: str = "zero"   # zero | unshaded | input
    disable_temporal: bool = False
    ao_inverted: bool = False
    min_fill_rate: float = 0.5         # crop acceptance (datasetVideo.py:266-301)
    augment: bool = False
    # adversarial training
    adv_training: bool = False
    discr_steps: int = 1
    gen_steps: int = 1
    discr_lr: float = 1e-4
    # checkpointing / logging
    run_dir_base: str = "runs"
    checkpoint_every: int = 1
    remat: bool = False                # jax.checkpoint each frame of the scan


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout for multi-chip runs.

    The reference is single-GPU (SURVEY.md section 2.5); here the batch/camera
    axis shards across a `jax.sharding.Mesh` over ICI.
    """

    data_axis: str = "data"
    data_parallel: int = 1             # number of devices on the batch axis


@dataclass(frozen=True)
class Config:
    render: RenderConfig = field(default_factory=RenderConfig)
    shading: ShadingConfig = field(default_factory=ShadingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def flatten_config(cfg: Any, prefix: str = "") -> Dict[str, Any]:
    """Flatten a (nested) config dataclass into dotted keys for logging."""
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v):
            out.update(flatten_config(v, prefix=key + "."))
        else:
            out[key] = v
    return out
