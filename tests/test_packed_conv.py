"""Pixel-pair-packed Pallas conv vs XLA conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.ops.packed_conv import (
    pack_pairs, packed_conv3x3, unpack_pairs)


def _xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def test_pack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 6, 8, 64).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_pairs(pack_pairs(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("relu", [False, True])
def test_packed_conv_matches_xla(relu):
    rng = np.random.RandomState(1)
    h, w = 10, 16
    x = jnp.asarray(
        (rng.randint(-8, 8, (1, h, w, 64)) / 8.0).astype(np.float32))
    k = jnp.asarray(
        (rng.randint(-4, 4, (3, 3, 64, 64)) / 16.0).astype(np.float32))
    b = jnp.asarray((rng.rand(64) - 0.5).astype(np.float32))
    ref = _xla_conv(x, k, b)
    if relu:
        ref = jax.nn.relu(ref)
    got = unpack_pairs(packed_conv3x3(
        pack_pairs(x).astype(jnp.bfloat16), k, b, relu=relu, th=4,
        out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
