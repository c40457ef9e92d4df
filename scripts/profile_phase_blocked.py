"""A/B the 2-D-blocked phase conv (VMEM-resident accumulators) on-chip.

VERDICT r3 item 8: post3 (540p, 256 planar channels) is the single
biggest line in the frame (~6 ms as a dense composed conv at 4x the
minimal FLOPs).  The round-3 row-band phase kernel lost its 3x MAC
advantage to accumulator spill (its f32 accumulators were ~16 MB each,
the whole VMEM).  This measures the round-4 blocked variant across tile
sizes against both the dense XLA conv and the row-band kernel.

Run on the real chip via the queue:
  python scripts/profile_phase_blocked.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.infer.planar import planar_tail_conv
from isosurfacesuperresolution_tpu.ops.phase_conv import (
    phase_conv3x3_amajor, phase_conv3x3_amajor_blocked)
from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20, flops=None):
    dt = timed_chain(step, carry0, n=n)
    extra = f"   {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:52s} {1000 * dt:8.2f} ms{extra}", flush=True)
    return dt


def parity_check(rng) -> None:
    """On-chip numerical parity of the REAL Mosaic lowering (round-4
    advisor: the unit tests run the blocked kernel in interpret mode
    only, so the actual DMA sequencing at non-128-aligned column
    origins was exercised only for speed, never for values).  Same
    construction as tests/test_phase_conv.py::
    test_phase_conv_blocked_matches_dense but with interpret left at
    its backend default (False on TPU) and at the real operating point
    plus an odd-size case."""
    from isosurfacesuperresolution_tpu.infer.planar import _amajor_cols
    from isosurfacesuperresolution_tpu.ops.phase_conv import (
        bmajor_from_amajor_cols)
    amaj = np.asarray(_amajor_cols(64))
    bmaj = np.asarray(bmajor_from_amajor_cols())
    inv_b = np.empty_like(bmaj)
    inv_b[np.asarray(amaj)[bmaj]] = np.arange(256)
    for (h, w, th, wb) in ((540, 960, 8, 160), (67, 203, 8, 160)):
        x_c = jnp.asarray((rng.rand(1, h, w, 256) - 0.5)
                          .astype(np.float32))
        k3 = jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5)
                         .astype(np.float32)) * 0.2
        bias = jnp.asarray(rng.rand(64).astype(np.float32))
        ref = np.asarray(planar_tail_conv(x_c, k3, bias, jnp.float32))
        got_b = phase_conv3x3_amajor_blocked(
            x_c[..., amaj].astype(jnp.bfloat16), k3, bias, th=th, wb=wb,
            out_dtype=jnp.float32)
        got_c = np.asarray(got_b)[..., inv_b]
        d = np.abs(ref - got_c)
        corr = np.corrcoef(ref.ravel(), got_c.ravel())[0, 1]
        ok = d.max() < 0.05 and corr > 0.999
        print(f"parity {h}x{w} th={th} wb={wb}: max|d|={d.max():.4f} "
              f"corr={corr:.6f} -> {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            raise SystemExit("blocked phase kernel PARITY FAILURE on "
                             "the real Mosaic lowering")


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    H, W = 540, 960

    parity_check(rng)
    if "--parity-only" in sys.argv:
        print("parity-only run complete", flush=True)
        return

    x = jnp.asarray((rng.rand(1, H, W, 256) - 0.5).astype(np.float32)
                    ).astype(bf)
    k3 = jnp.asarray((rng.rand(3, 3, 64, 64) - 0.5).astype(np.float32)
                     ) * 0.05
    bias = jnp.zeros((64,), jnp.float32)
    kd = jnp.asarray((rng.rand(3, 3, 256, 256) - 0.5).astype(np.float32)
                     ).astype(bf) * 0.05

    gf_dense = 2 * 9 * 256 * 256 * H * W      # what the dense conv does
    gf_min = gf_dense // 4                     # minimal (structural zeros)

    def conv_xla(c):
        return jax.lax.conv_general_dilated(
            c, kd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t("XLA dense composed (3,3,256,256)@540p", conv_xla, x, flops=gf_dense)

    for th in (8, 16):
        try:
            t(f"row-band phase kernel th={th} (r3)",
              lambda c, th=th: phase_conv3x3_amajor(c, k3, bias, th=th),
              x, flops=gf_min)
        except Exception as e:
            print(f"row-band th={th} failed: {type(e).__name__}: {e}",
                  flush=True)

    for th, wb in ((8, 160), (8, 320), (16, 160), (8, 128), (16, 320),
                   (32, 160)):
        try:
            t(f"blocked phase kernel th={th} wb={wb}",
              lambda c, th=th, wb=wb: phase_conv3x3_amajor_blocked(
                  c, k3, bias, th=th, wb=wb),
              x, flops=gf_min)
        except Exception as e:
            print(f"blocked th={th} wb={wb} failed: "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
