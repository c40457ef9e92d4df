"""Find the fastest planar-RGB -> full-res interleave on the chip.

Carry trick: each step ends by sub-sampling back to the carry shape with a
strided slice of the FULL result plus a dependency on a far corner, so the
transpose cannot be dead-code-eliminated (the slice needs the materialized
high-res array... XLA could still fuse; we also fold in a sum).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isosurfacesuperresolution_tpu.utils.profiling import timed_chain


def t(name, step, carry0, n=20):
    dt = timed_chain(step, carry0, n=n)
    print(f"{name:52s} {1000 * dt:8.2f} ms", flush=True)
    return dt


def back(c, hi):
    """Map a high-res result back onto the carry with full dependency."""
    s = jnp.sum(hi) * 1e-12
    return c * (1.0 + s)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    h, w = 270, 480
    rng = np.random.RandomState(0)
    x48 = jnp.asarray(rng.rand(1, h, w, 48).astype(np.float32))

    # V1: current single 8-d transpose -> planes (3, 1080, 1920)
    def v1(c):
        x = c.reshape(1, h, w, 3, 2, 2, 2, 2)
        x = x.transpose(0, 3, 1, 6, 4, 2, 7, 5)
        hi = x.reshape(1, 3, 4 * h, 4 * w)
        return back(c, hi)
    t("V1 single transpose -> planes", v1, x48)

    # V2: channel perm -> W-merge reshape -> transpose -> planes
    # nested channels (c,a2,b2,a1,b1); reorder to (b1,b2, c,a1,a2)
    def mkperm(order):
        # order: tuple of 5 strings naming bit sources msb->lsb
        bits = {"c": 0, "a2": 0, "b2": 0, "a1": 0, "b1": 0}
        idx = np.arange(48)
        c_, rem = idx // 16, idx % 16
        a2, b2 = (rem >> 3) & 1, (rem >> 2) & 1
        a1, b1 = (rem >> 1) & 1, rem & 1
        vals = {"c": c_, "a2": a2, "b2": b2, "a1": a1, "b1": b1}
        sizes = {"c": 3, "a2": 2, "b2": 2, "a1": 2, "b1": 2}
        tgt = np.zeros(48, np.int64)
        for name in order:
            tgt = tgt * sizes[name] + vals[name]
        perm = np.empty(48, np.int64)
        perm[tgt] = idx
        return perm

    p1 = mkperm(("b1", "b2", "c", "a1", "a2"))
    def v2(c):
        y = c[..., p1]                              # (h, w, (b1,b2,c,a1,a2))
        y = y.reshape(1, h, w * 4, 12)              # pure reshape W-merge
        y = y.reshape(1, h, w * 4, 4, 3)            # ((a1,a2), c)? -> no:
        # channels now (c, a1, a2); need ((a1,a2) out rows, c plane)
        y = y.reshape(1, h, w * 4, 3, 4)            # (c, (a1,a2))
        y = y.transpose(0, 3, 1, 4, 2)              # (1, 3, h, 4, 1920)
        hi = y.reshape(1, 3, 4 * h, 4 * w)
        return back(c, hi)
    t("V2 perm + W-merge reshape + transpose", v2, x48)

    # V3: HWC two-stage pixel shuffle
    from isosurfacesuperresolution_tpu.ops.resize import pixel_shuffle
    def v3(c):
        # nested order (c,a2,b2,a1,b1) is exactly two-stage-PS ready:
        # stage 1 interleaves (a1,b1), stage 2 (a2,b2)
        y = pixel_shuffle(c, 2)                     # (540, 960, 12)
        hi = pixel_shuffle(y, 2)                    # (1080, 1920, 3) HWC
        return back(c, hi)
    t("V3 two-stage PS to HWC", v3, x48)

    # V4: per-plane transposes
    def v4(c):
        planes = []
        for ch in range(3):
            y = c[..., ch * 16:(ch + 1) * 16].reshape(1, h, w, 2, 2, 2, 2)
            y = y.transpose(0, 1, 5, 3, 2, 6, 4)    # (1,h,a1,a2,w,b1,b2)
            planes.append(y.reshape(1, 4 * h, 4 * w))
        hi = jnp.stack(planes, axis=1)
        return back(c, hi)
    t("V4 three per-plane transposes", v4, x48)

    # V5: bf16 V1
    def v5(c):
        x = c.astype(jnp.bfloat16).reshape(1, h, w, 3, 2, 2, 2, 2)
        x = x.transpose(0, 3, 1, 6, 4, 2, 7, 5)
        hi = x.reshape(1, 3, 4 * h, 4 * w)
        return back(c, hi.astype(jnp.float32))
    t("V5 bf16 single transpose", v5, x48)

    # V6: W-merge reshape only then H via second perm+reshape trick:
    # after W-merge: (h, 1920, (c,a1,a2)); reorder to (a1,a2,c) then
    # reshape cannot merge h.. -> use transpose h<->(a1,a2)? same as V2.
    # Instead: planes via W-merge on (b-bits) AND H-merge via a second
    # W-merge after a (h<->w) transpose. Skipped.

    # V7: V2 variant emitting bf16
    def v7(c):
        y = c.astype(jnp.bfloat16)[..., p1]
        y = y.reshape(1, h, w * 4, 12)
        y = y.reshape(1, h, w * 4, 3, 4)
        y = y.transpose(0, 3, 1, 4, 2)
        hi = y.reshape(1, 3, 4 * h, 4 * w)
        return back(c, hi.astype(jnp.float32))
    t("V7 V2 in bf16", v7, x48)


if __name__ == "__main__":
    main()
