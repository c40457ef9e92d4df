"""Train the learned texture-feature encoder (losses/learned_features).

Self-supervised restoration on the repo's own rendered data: shaded
GT crops are degraded with the SR-shaped corruption (4x bilinear
down->up + noise) and the encoder+decoder restore them.  The encoder
weights become the committed non-random feature space for the texture
evidence harness (VERDICT r4 item 9; reference analogue: the pretrained
VGG feature space of `lossbuilder.py:169-230`).

Usage:
  python -m isosurfacesuperresolution_tpu.apps.train_texenc \
      --dataset /tmp/isosr_clips_mix4cd --steps 2000 \
      --output artifacts/texenc/texenc.npz
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   help="npy clip dir (a --cacheDataset directory)")
    p.add_argument("--cropSize", type=int, default=32,
                   help="crop size in LOW-res pixels (x4 in the crops)")
    p.add_argument("--samples", type=int, default=800)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batchSize", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", type=str,
                   default="artifacts/texenc/texenc.npz")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from isosurfacesuperresolution_tpu.config import ShadingConfig
    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset, load_reference_npy_dir)
    from isosurfacesuperresolution_tpu.losses.learned_features import (
        TexDecoder, TexEncoder, degrade, save_texenc_params)
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)

    sequences = load_reference_npy_dir(args.dataset)
    ds = VideoDataset(sequences)
    rng = np.random.RandomState(args.seed)
    samples = ds.collect_samples(args.samples, args.cropSize, 0.5, rng)
    train = DatasetFromSamples(ds, samples, args.cropSize, test=False,
                               test_fraction=0.2)
    shading_cfg = ShadingConfig()
    highs = np.stack([train[i][2][-1] for i in range(len(train))])
    clean = np.asarray(screen_space_shading(jnp.asarray(highs),
                                            shading_cfg), np.float32)
    print(f"training crops: {clean.shape}")

    enc = TexEncoder()
    dec = TexDecoder()
    key = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1,) + clean.shape[1:])
    pe = enc.init(key, x0)["params"]
    pd = dec.init(key, enc.apply({"params": pe}, x0)["conv_4"])["params"]
    params = {"enc": pe, "dec": pd}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            noisy = degrade(batch, key)
            feats = enc.apply({"params": p["enc"]}, noisy)
            out = dec.apply({"params": p["dec"]}, feats["conv_4"])
            return jnp.mean((out - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    clean_j = jnp.asarray(clean)
    n = clean.shape[0]
    t0 = time.time()
    loss = None
    for i in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (args.batchSize,), 0, n)
        params, opt_state, loss = step(params, opt_state,
                                       clean_j[idx], k2)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    save_texenc_params(params["enc"], args.output)
    print("wrote", args.output)

    # sanity: the learned features must separate sharp from blurred
    # (gram distance of blurred-vs-clean >> clean-vs-clean == 0)
    from isosurfacesuperresolution_tpu.losses.builder import texture_loss
    feats_c = enc.apply({"params": params["enc"]}, clean_j[:64])
    blur = jax.image.resize(jax.image.resize(
        clean_j[:64], (64, clean.shape[1] // 4, clean.shape[2] // 4, 3),
        "linear"), clean_j[:64].shape, "linear")
    feats_b = enc.apply({"params": params["enc"]}, blur)
    k = "conv_3"
    d = float(texture_loss(feats_c[k], feats_b[k]))
    print(f"gram(clean, blurred) at {k}: {d:.3e} (must be > 0)")


if __name__ == "__main__":
    main()
