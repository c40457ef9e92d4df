"""Generator zoo: EnhanceNet, RCAN, TecoGAN, SubpixelNet in Flax (NHWC).

Parity targets: `models/enhancenet.py`, `models/rcan.py`, `models/tecogan.py`,
`models/subpixelnet.py` and the factory contract of `models/__init__.py:21-49`:
every generator maps a low-res input (B, H, W, Cin) to
``(output (B, rH, rW, Cout), residual)`` where Cin includes the flattened
warped previous frame (5 + 6*16 = 101 channels for the unshaded video nets,
`mainVideoUnshaded.py:210-214`).

TPU notes: all convs are NHWC so XLA tiles them onto the MXU directly;
``compute_dtype='bfloat16'`` runs the conv stack in bf16 with f32 params
(the residual reconstruction and outputs stay f32).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.config import ModelConfig
from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle, resize


def _orthogonal_relu_init(scale: float = 1.0):
    """Orthogonal init with the ReLU gain sqrt(2), times ``scale``.

    Parity: `enhancenet.py:127-133` (`torch.nn.init.orthogonal_` with
    `calculate_gain('relu')`).
    """
    import math
    return nn.initializers.orthogonal(scale=scale * math.sqrt(2.0))


def _branch_scale(num_blocks: int) -> float:
    """Init scale for the SECOND conv of each residual block.

    The reference initializes both block convs at the full ReLU gain
    (`enhancenet.py:127-133`); with ``N`` unnormalized additive skips the
    trunk variance then grows ~2x per block (measured: activation std
    0.17 -> 29 over 10 blocks at init).  Early training resolves the
    explosion by driving the first post-upsample ReLU 99.95% dead, which
    zeroes the interior residual AND every upstream gradient - the run
    freezes at the bilinear identity (the round-1/2 quality plateau).
    Scaling the branch output conv by 1/sqrt(N) keeps trunk variance
    growth bounded by (1 + 1/N)^N < e, so the post-block stays in its
    active regime and gradients reach the trunk throughout training.
    """
    import math
    return 1.0 / math.sqrt(max(num_blocks, 1))


def _recon_image(inputs: jnp.ndarray, outputs: jnp.ndarray,
                 channel_mask_len: int, output_channels: int,
                 recon_type: str, upsample: str
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual reconstruction (parity: `enhancenet.py:51-90`).

    The first ``channel_mask_len`` input channels are upsampled and added to
    the matching leading output channels; extra output channels (e.g. the AO
    channel absent from the 5-channel input) pass through unchanged.
    """
    method = upsample if upsample != "pixelShuffle" else "bilinear"
    resized = resize(inputs[..., :channel_mask_len],
                     size=(outputs.shape[-3], outputs.shape[-2]),
                     method=method)
    if recon_type == "residual":
        if channel_mask_len == output_channels:
            recon = resized + outputs
        elif channel_mask_len < output_channels:
            recon = jnp.concatenate(
                [resized + outputs[..., :channel_mask_len],
                 outputs[..., channel_mask_len:]], axis=-1)
        else:
            raise ValueError("number of output channels must be at least the"
                             " number of masked input channels")
    else:
        recon = outputs
    return recon, outputs


class _Upsample2x(nn.Module):
    """x2 upsampling by interpolation or pixel shuffle."""

    mode: str
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "pixelShuffle":
            x = nn.Conv(self.features * 4, (3, 3), padding=1,
                        dtype=self.dtype)(x)
            return pixel_shuffle(x, 2)
        return resize(x, scale=2.0, method=self.mode)


class _FusedUpConv(nn.Module):
    """`upsample x2 -> conv3x3` as ONE low-res conv + pixel shuffle.

    Parameter tree ({kernel, bias}, same shapes/init as the plain post-conv
    `nn.Conv`) is interchangeable with the unfused path, so checkpoints load
    either way.  The interpolation stencil is composed into the kernel at
    trace time (`ops/fused_upsample.compose_up2x_conv3x3`): identical maths
    in the interior, ~2x faster on TPU because the conv runs at the low
    resolution with 4x output channels and the resize disappears.
    """

    features: int
    method: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from isosurfacesuperresolution_tpu.ops.fused_upsample import (
            compose_up2x_conv3x3, up2x_conv_bias)
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        kc = compose_up2x_conv3x3(kernel, self.method).astype(self.dtype)
        bc = up2x_conv_bias(bias).astype(self.dtype)
        # edge padding reproduces the resize's clamped borders; only the
        # high-res conv's own zero-pad row/col differs from the unfused path
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, kc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pixel_shuffle(y + bc, 2)


class EnhanceNet(nn.Module):
    """EnhanceNet generator (parity: `models/enhancenet.py:92-145`).

    3x3 conv -> 64 pre-block, ``num_residual_blocks`` residual blocks
    (conv-ReLU-conv, optional BN) with additive skips, post-block of two
    (upsample x2 + conv + ReLU) stages + conv + ReLU + output conv, then
    residual reconstruction against the bilinear-upsampled masked input.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, dtype=dtype,
                                       name=name)
        x = inputs.astype(dtype)
        feat = nn.relu(conv(cfg.num_features, "pre")(x))
        for i in range(cfg.num_residual_blocks):
            y = nn.Conv(cfg.num_features, (3, 3), padding=1, dtype=dtype,
                        kernel_init=_orthogonal_relu_init(),
                        name=f"block{i}_conv1")(feat)
            if cfg.use_bn:
                y = nn.BatchNorm(use_running_average=not train,
                                 dtype=dtype, name=f"block{i}_bn1")(y)
            y = nn.relu(y)
            y = nn.Conv(cfg.num_features, (3, 3), padding=1, dtype=dtype,
                        kernel_init=_orthogonal_relu_init(
                            _branch_scale(cfg.num_residual_blocks)),
                        name=f"block{i}_conv2")(y)
            if cfg.use_bn:
                y = nn.BatchNorm(use_running_average=not train,
                                 dtype=dtype, name=f"block{i}_bn2")(y)
            feat = feat + y

        # upsampling stages: one (x2 + conv + ReLU) per factor of 2.  The
        # reference hard-asserts 4x (`enhancenet.py:16`); this generalizes to
        # any power of two (the 8x stretch config of BASELINE.json).
        import math as _math
        u = cfg.upscale_factor
        stages = int(_math.log2(u))
        assert 2 ** stages == u, f"upscale factor must be a power of 2: {u}"
        up_mode = cfg.upsample
        # bicubic's 4-tap stencil exceeds the composed 3x3 support
        fuse = cfg.fused_upsample and up_mode in ("nearest", "bilinear")
        y = feat
        for si in range(stages):
            if fuse:
                y = nn.relu(_FusedUpConv(cfg.num_features, up_mode, dtype,
                                         name=f"post{si + 1}")(y))
            else:
                y = _Upsample2x(up_mode, cfg.num_features, dtype,
                                name=f"up{si + 1}")(y)
                y = nn.relu(conv(cfg.num_features, f"post{si + 1}")(y))
        y = nn.relu(conv(cfg.num_features, f"post{stages + 1}")(y))
        # Output-conv init: standard lecun scale, like the reference's
        # default conv init (`enhancenet.py` leaves the out conv at
        # PyTorch's kaiming-uniform).  Two traps were measured on the way
        # here: an exact ZERO init kills upstream gradients permanently
        # (the readout shrinks back to the identity), and a small-variance
        # (0.01) init starves the trunk - its gradients scale with the
        # out-kernel norm, measured 1000x smaller than the readout's, so
        # the network froze at the residual identity after ~2 epochs.
        # O(1) init costs a noisy first epoch (the residual reconstruction
        # still centers the output at the bilinear baseline) but trains.
        # Extra channels beyond the residual mask (the AO channel in the
        # unshaded config) get bias 1: the no-occlusion default.
        n_extra = cfg.output_channels - len(cfg.channel_mask)

        def out_bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if n_extra > 0:
                b = b.at[-n_extra:].set(1.0)
            return b

        outputs = nn.Conv(cfg.output_channels, (3, 3), padding=1, dtype=dtype,
                          bias_init=out_bias_init,
                          name="out")(y).astype(jnp.float32)

        return _recon_image(inputs.astype(jnp.float32), outputs,
                            len(cfg.channel_mask), cfg.output_channels,
                            cfg.recon_type, cfg.upsample)


class RCAN(nn.Module):
    """Residual-channel-attention network (parity: `models/rcan.py:12-121`).

    G=10 residual groups x B=20 RCAB blocks, C=64 features, reduction 16,
    PixelShuffle x4 upsampling, clamped output, residual = output minus
    bilinear-upsampled masked input.
    """

    cfg: ModelConfig
    num_groups: int = 10
    num_blocks: int = 20
    reduction: int = 16

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        c = cfg.num_features

        def rcab(x, name):
            y = nn.Conv(c, (3, 3), padding=1, dtype=dtype,
                        name=f"{name}_conv1")(x)
            y = nn.leaky_relu(y)
            y = nn.Conv(c, (3, 3), padding=1, dtype=dtype,
                        name=f"{name}_conv2")(y)
            # channel attention: global average pool -> squeeze -> excite
            z = jnp.mean(y, axis=(-3, -2))
            s = nn.Dense(c // self.reduction, dtype=dtype,
                         name=f"{name}_down")(z)
            s = nn.leaky_relu(s)
            s = nn.Dense(c, dtype=dtype, name=f"{name}_up")(s)
            s = nn.sigmoid(s)[:, None, None, :]
            return x + y * s

        x = inputs.astype(dtype)
        feat = nn.Conv(c, (3, 3), padding=1, dtype=dtype, name="pre")(x)
        rir_in = feat
        for g in range(self.num_groups):
            group_in = feat
            for b in range(self.num_blocks):
                feat = rcab(feat, f"g{g}_b{b}")
            feat = nn.Conv(c, (3, 3), padding=1, dtype=dtype,
                           name=f"g{g}_post")(feat)
            feat = feat + group_in
        feat = nn.Conv(c, (3, 3), padding=1, dtype=dtype, name="rir_post")(feat)
        feat = feat + rir_in

        r = cfg.upscale_factor
        y = nn.Conv(c * r * r, (3, 3), padding=1, dtype=dtype, name="up")(feat)
        y = pixel_shuffle(y, r)
        outputs = nn.Conv(cfg.output_channels, (3, 3), padding=1, dtype=dtype,
                          name="post")(y).astype(jnp.float32)

        # residual diagnostic = output minus upsampled input; the reference
        # subtracts mismatched channel counts when len(channel_mask) !=
        # output_channels (rcan.py:118-120, a latent bug noted in SURVEY.md) -
        # here extra output channels (e.g. AO) pass through unchanged instead.
        cm = len(cfg.channel_mask)
        resized = resize(inputs[..., :cm].astype(jnp.float32),
                         size=(outputs.shape[-3], outputs.shape[-2]),
                         method="bilinear")
        residual = jnp.concatenate(
            [outputs[..., :cm] - resized, outputs[..., cm:]], axis=-1)
        outputs = jnp.clip(outputs, 0.0, 1.0)
        return outputs, residual


class TecoGAN(nn.Module):
    """TecoGAN-style generator (parity: `models/tecogan.py:41-81`):
    EnhanceNet body with LeakyReLU activations and learned (transposed-conv)
    x2 upsampling stages."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        c = cfg.num_features
        x = inputs.astype(dtype)
        feat = nn.leaky_relu(
            nn.Conv(c, (3, 3), padding=1, dtype=dtype, name="pre")(x))
        for i in range(cfg.num_residual_blocks):
            y = nn.Conv(c, (3, 3), padding=1, dtype=dtype,
                        name=f"block{i}_conv1")(feat)
            y = nn.leaky_relu(y)
            y = nn.Conv(c, (3, 3), padding=1, dtype=dtype,
                        kernel_init=nn.initializers.variance_scaling(
                            _branch_scale(cfg.num_residual_blocks) ** 2,
                            "fan_in", "truncated_normal"),
                        name=f"block{i}_conv2")(y)
            feat = feat + y
        # padding ((1,2),(1,2)) = the reference's ConvTranspose2d(3,
        # stride=2, padding=1, output_padding=1) alignment exactly
        # (tecogan.py:56-60); flax's default SAME is shifted by one pixel
        ct_pad = ((1, 2), (1, 2))
        y = nn.ConvTranspose(c, (3, 3), strides=(2, 2), padding=ct_pad,
                             dtype=dtype, name="up1")(feat)
        y = nn.leaky_relu(y)
        y = nn.ConvTranspose(c, (3, 3), strides=(2, 2), padding=ct_pad,
                             dtype=dtype, name="up2")(y)
        y = nn.leaky_relu(y)
        y = nn.Conv(cfg.output_channels, (3, 3), padding=1, dtype=dtype,
                    name="out")(y)
        outputs = nn.leaky_relu(y).astype(jnp.float32)
        return _recon_image(inputs.astype(jnp.float32), outputs,
                            len(cfg.channel_mask), cfg.output_channels,
                            cfg.recon_type, "bilinear")


class SubpixelNet(nn.Module):
    """ESPCN-style 5-conv net with PixelShuffle (parity:
    `models/subpixelnet.py:7-34`).  Returns (output, None)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        r = cfg.upscale_factor
        init = _orthogonal_relu_init()
        x = inputs.astype(dtype)
        x = nn.relu(nn.Conv(64, (5, 5), padding=2, dtype=dtype,
                            kernel_init=init, name="conv1")(x))
        x = nn.relu(nn.Conv(64, (5, 5), padding=2, dtype=dtype,
                            kernel_init=init, name="conv2")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dtype,
                            kernel_init=init, name="conv3")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=dtype,
                            kernel_init=init, name="conv4")(x))
        x = nn.Conv(cfg.output_channels * r * r, (3, 3), padding=1,
                    dtype=dtype,
                    kernel_init=nn.initializers.orthogonal(),
                    name="conv5")(x)
        out = pixel_shuffle(x, r).astype(jnp.float32)
        return out, None


_MODELS = {
    "enhancenet": EnhanceNet,
    "rcan": RCAN,
    "tecogan": TecoGAN,
    "subpixelnet": SubpixelNet,
}


def create_network(cfg: ModelConfig) -> nn.Module:
    """Name -> generator module (parity: `models/__init__.py:21-49`).

    With ``cfg.use_sn`` the module is wrapped so every conv kernel is
    spectrally normalized at apply time (the reference's ``--useSN`` /
    ``apply_sn(model)``, `mainVideoUnshaded.py:334-339`); the param tree
    is unchanged."""
    key = cfg.model.lower()
    if key not in _MODELS:
        raise ValueError(f"Unknown model {cfg.model}")
    module = _MODELS[key](cfg=cfg)
    if cfg.use_sn:
        from isosurfacesuperresolution_tpu.utils.spectral_norm import (
            SpectralNormalizedModule)
        return SpectralNormalizedModule(module)
    return module


def network_input_channels(cfg: ModelConfig, temporal: bool = True) -> int:
    """Total input channels: low-res channels + flattened warped previous
    high-res frame (parity: `mainVideoUnshaded.py:210-214`)."""
    if not temporal:
        return cfg.input_channels
    return cfg.input_channels + cfg.output_channels * cfg.upscale_factor ** 2
