"""Discriminator zoo for adversarial training, NHWC Flax.

Parity targets: `losses/enhancenetlarge.py`, `losses/enhancenetsmall.py`,
`losses/tecogan.py`, `losses/makelayers.py` - strided-conv pyramids that
reduce a power-of-two resolution to 4x4, followed by a 1024-unit FC head
emitting a single logit (sigmoid lives in the loss, not the model).

Weight init parity: conv = N(0, sqrt(2 / (k*k*c_out))) (He fan-out), linear =
N(0, 0.01), zero biases (`enhancenetlarge.py:38-47`).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from isosurfacesuperresolution_tpu.utils.spectral_norm import SNDense, SNConv


def _conv_init():
    # He fan-out normal: variance 2 / (k*k*out_channels)
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _linear_init():
    return nn.initializers.normal(stddev=0.01)


def _head(x: jnp.ndarray, use_sn: bool) -> jnp.ndarray:
    Dense = SNDense if use_sn else nn.Dense
    x = x.reshape(x.shape[0], -1)
    x = Dense(1024, kernel_init=_linear_init(), name="fc1")(x)
    x = nn.leaky_relu(x)
    return Dense(1, kernel_init=_linear_init(), name="fc2")(x)


class EnhanceNetLargeDiscriminator(nn.Module):
    """Per halving: two stride-1 convs + one stride-2 conv, channels doubling
    from 16 (parity: `enhancenetlarge.py:19-35`)."""

    resolution: int
    input_channels: int
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.input_channels
        assert x.shape[-3] == self.resolution and x.shape[-2] == self.resolution
        res = self.resolution
        assert res & (res - 1) == 0, \
            f"resolution is not a power of two: {res}"
        Conv = SNConv if self.use_spectral_norm else nn.Conv
        c = 8
        i = 0
        while res > 4:
            c *= 2
            res //= 2
            for stride in (1, 1, 2):
                x = Conv(c, (3, 3), strides=(stride, stride), padding=1,
                         kernel_init=_conv_init(), name=f"conv{i}")(x)
                x = nn.leaky_relu(x, 0.01)
                i += 1
        return _head(x, self.use_spectral_norm)


class EnhanceNetSmallDiscriminator(nn.Module):
    """Per halving: one stride-1 conv + one stride-2 conv
    (parity: `enhancenetsmall.py:19-35`)."""

    resolution: int
    input_channels: int
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.input_channels
        res = self.resolution
        assert res & (res - 1) == 0
        Conv = SNConv if self.use_spectral_norm else nn.Conv
        c = 8
        i = 0
        while res > 4:
            c *= 2
            res //= 2
            for stride in (1, 2):
                x = Conv(c, (3, 3), strides=(stride, stride), padding=1,
                         kernel_init=_conv_init(), name=f"conv{i}")(x)
                x = nn.leaky_relu(x, 0.01)
                i += 1
        return _head(x, self.use_spectral_norm)


class TecoGANDiscriminator(nn.Module):
    """4x4 stride-2 conv pyramid to 256x4x4 + single-logit FC
    (parity: `losses/tecogan.py:17-45`)."""

    resolution: int
    input_channels: int
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.input_channels
        res = self.resolution
        assert res & (res - 1) == 0
        Conv = SNConv if self.use_spectral_norm else nn.Conv
        i = 0
        while res > 32:
            res //= 2
            x = Conv(64, (4, 4), strides=(2, 2), padding=1, use_bias=False,
                     kernel_init=_conv_init(), name=f"pre{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            i += 1
        for c, name in ((128, "c128"), (256, "c256a"), (256, "c256b")):
            x = Conv(c, (4, 4), strides=(2, 2), padding=1, use_bias=False,
                     kernel_init=_conv_init(), name=name)(x)
            x = nn.leaky_relu(x, 0.2)
        Dense = SNDense if self.use_spectral_norm else nn.Dense
        x = x.reshape(x.shape[0], -1)
        return Dense(1, kernel_init=_linear_init(), name="fc")(x)


def build_discriminator(model: str, resolution: int, input_channels: int,
                        use_spectral_norm: bool = False) -> nn.Module:
    """Name -> discriminator (parity: `lossbuilder.py:306-322`)."""
    key = model.lower()
    if key == "enhancenetsmall":
        return EnhanceNetSmallDiscriminator(resolution, input_channels,
                                            use_spectral_norm)
    if key == "enhancenetlarge":
        return EnhanceNetLargeDiscriminator(resolution, input_channels,
                                            use_spectral_norm)
    if key == "tecogan":
        return TecoGANDiscriminator(resolution, input_channels,
                                    use_spectral_norm)
    raise ValueError(f"Unsupported discriminator model: {model}")
