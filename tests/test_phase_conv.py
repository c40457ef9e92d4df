"""Pallas phase-conv vs the XLA dense planar tail conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isosurfacesuperresolution_tpu.infer.planar import (
    _amajor_cols, planar_tail_conv)
from isosurfacesuperresolution_tpu.ops.phase_conv import (
    bmajor_from_amajor_cols, phase_conv3x3_amajor)


def _to_cmajor(out_b):
    """B-major kernel output -> c-major planar."""
    amaj = _amajor_cols(64)              # idxA -> c-major idx
    bperm = bmajor_from_amajor_cols()    # A -> B
    # x_B = x_A[..., bperm]; x_A = x_C[..., amaj]  =>  x_C = x_B[..., inv]
    comp = np.asarray(amaj)[np.asarray(bperm)]   # x_B = x_C[..., comp]
    inv = np.empty_like(comp)
    inv[comp] = np.arange(comp.size)
    return out_b[..., inv]


@pytest.mark.parametrize("relu", [False, True])
def test_phase_conv_matches_dense(relu):
    rng = np.random.RandomState(0)
    h, w = 10, 16
    x_c = jnp.asarray((rng.rand(1, h, w, 256) - 0.5).astype(np.float32))
    k3 = jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5).astype(np.float32)
                     ) * 0.2
    bias = jnp.asarray(rng.rand(64).astype(np.float32))

    ref = planar_tail_conv(x_c, k3, bias, jnp.float32)     # c-major in/out
    if relu:
        ref = jax.nn.relu(ref)

    amaj = _amajor_cols(64)
    inv = np.empty_like(amaj)
    inv[amaj] = np.arange(amaj.size)
    x_a = x_c[..., np.asarray(amaj) * 0 + amaj]            # c -> A-major
    got_b = phase_conv3x3_amajor(x_a.astype(jnp.bfloat16), k3, bias,
                                 relu=relu, th=4, out_dtype=jnp.float32,
                                 interpret=True)
    got_c = _to_cmajor(got_b)
    d = np.abs(np.asarray(ref) - np.asarray(got_c))
    # bf16 inputs -> ~1e-2 absolute on O(1) outputs
    assert d.max() < 0.05, d.max()
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(got_c).ravel())[0, 1]
    assert corr > 0.999


def test_phase_conv_f32_inputs_tight():
    """With f32-representable-in-bf16 inputs the match is exact."""
    rng = np.random.RandomState(1)
    h, w = 6, 8
    x_c = jnp.asarray(
        (rng.randint(-8, 8, (1, h, w, 256)) / 8.0).astype(np.float32))
    k3 = jnp.asarray(
        (rng.randint(-4, 4, (3, 3, 64, 64)) / 16.0).astype(np.float32))
    bias = jnp.zeros((64,), jnp.float32)
    ref = planar_tail_conv(x_c, k3, bias, jnp.float32)
    amaj = _amajor_cols(64)
    inv = np.empty_like(amaj)
    inv[amaj] = np.arange(amaj.size)
    got = _to_cmajor(phase_conv3x3_amajor(
        x_c[..., amaj].astype(jnp.bfloat16), k3, bias, th=2,
        out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("relu", [False, True])
def test_phase_conv_blocked_matches_dense(relu):
    """2-D-blocked variant (VMEM-resident accumulators) vs the XLA dense
    planar tail conv, odd sizes exercising row+col padding."""
    from isosurfacesuperresolution_tpu.ops.phase_conv import (
        phase_conv3x3_amajor_blocked)
    rng = np.random.RandomState(2)
    h, w = 11, 21
    x_c = jnp.asarray((rng.rand(1, h, w, 256) - 0.5).astype(np.float32))
    k3 = jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5).astype(np.float32)
                     ) * 0.2
    bias = jnp.asarray(rng.rand(64).astype(np.float32))

    ref = planar_tail_conv(x_c, k3, bias, jnp.float32)
    if relu:
        ref = jax.nn.relu(ref)

    amaj = _amajor_cols(64)
    x_a = x_c[..., np.asarray(amaj)]
    got_b = phase_conv3x3_amajor_blocked(
        x_a.astype(jnp.bfloat16), k3, bias, relu=relu, th=4, wb=8,
        out_dtype=jnp.float32, interpret=True)
    got_c = _to_cmajor(got_b)
    assert got_c.shape == ref.shape
    d = np.abs(np.asarray(ref) - np.asarray(got_c))
    assert d.max() < 0.05, d.max()
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(got_c).ravel())[0, 1]
    assert corr > 0.999
