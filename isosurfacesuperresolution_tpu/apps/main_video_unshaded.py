"""CLI trainer for unshaded video super-resolution networks.

Parity target: `mainVideoUnshaded.py` - same CLI vocabulary (losses DSL,
model zoo, initial-image modes, adversarial options, run-dir numbering,
tensorboard scalars, per-epoch checkpoints), re-hosted on the JAX training
stack.  Data can come from (a) reference-format npy clip directories, or
(b) the built-in renderer-in-the-loop generator over analytic volumes or
RAW/.dat files - no external renderer process (SURVEY.md section 7).

Usage examples:
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset analytic:blobs --samples 200 --epochs 5
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset /path/to/clips --losses l1:mask:1,l1:normal:10
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Tuple

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Video super-resolution trainer (unshaded nets)")
    # dataset (reference: --dataset, mainVideoUnshaded.py:37-44)
    p.add_argument("--dataset", type=str, default="analytic:blobs",
                   help="npy clip dir / index file, or analytic:<name> "
                        "(sphere|torus|gyroid|blobs|mix), or a .dat/.raw volume")
    p.add_argument("--numberOfImages", type=int, default=8,
                   help="sequences to generate for analytic datasets")
    p.add_argument("--aoSamples", type=int, default=64,
                   help="AO sample budget for generated training targets "
                        "(reference DataGeneratorVideo.py --aosamples 256; "
                        "0 disables AO in the generated clips)")
    p.add_argument("--cameraDistance", type=str, default="0.95,1.3",
                   help="lo,hi camera-distance range for generated analytic "
                        "clips; the eval harnesses render at the reference "
                        "default 0.6-1.0 (DataGeneratorVideo.py camera "
                        "sphere), so fine-tunes targeting those protocols "
                        "should span it, e.g. 0.6,1.3")
    p.add_argument("--testFraction", type=float, default=0.2)
    # model (reference :45-56)
    p.add_argument("--model", type=str, default="EnhanceNet")
    p.add_argument("--upsample", type=str, default="bilinear")
    p.add_argument("--reconType", type=str, default="residual")
    p.add_argument("--useBN", action="store_true")
    p.add_argument("--useSN", action="store_true",
                   help="spectral normalization in the generator and "
                        "discriminator (reference --useSN / apply_sn)")
    p.add_argument("--numResidualLayers", type=int, default=10)
    p.add_argument("--numFeatures", type=int, default=64,
                   help="trunk feature width (the reference hardcodes "
                        "64, enhancenet.py:92-145; exposed here for the "
                        "quality-vs-frame-cost width sweep)")
    p.add_argument("--upscaleFactor", type=int, default=4)
    p.add_argument("--computeDtype", type=str, default="float32")
    # training (reference :57-69)
    p.add_argument("--samples", type=int, default=500)
    p.add_argument("--cropSize", type=int, default=32)
    p.add_argument("--numFrames", type=int, default=10)
    p.add_argument("--batchSize", type=int, default=16)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--optim", type=str, default="Adam",
                   help="Adam (default), RMSprop or Rprop "
                        "(reference --optim)")
    p.add_argument("--gradClip", type=float, default=1.0,
                   help="global-norm gradient clip; 0 disables")
    p.add_argument("--lrGamma", type=float, default=0.5)
    p.add_argument("--lrStep", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--initialImage", type=str, default="zero",
                   choices=["zero", "unshaded", "input"])
    p.add_argument("--disableTemporal", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--minFillRate", type=float, default=0.5,
                   help="crop acceptance fill ratio (datasetVideo.py:266-"
                        "301 uses 0.5; lower it to expose the net to "
                        "silhouette/empty crops, e.g. for all-angle "
                        "full-view robustness)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the frame body (memory vs flops)")
    # losses (reference :70-90)
    p.add_argument("--losses", type=str,
                   default="l1:mask:1,l1:ao:1,l1:normal:10,l1:depth:10,"
                           "temp-l2:color:0.1")
    # defaults found with VGGAnalysis (reference: mainVideoUnshaded.py:75-78)
    p.add_argument("--perceptualLossLayers", type=str,
                   default="conv_1:0.026423,conv_2:0.009285,conv_3:0.006710,"
                           "conv_4:0.004898,conv_5:0.003910,conv_6:0.003956,"
                           "conv_7:0.003813,conv_8:0.002968,conv_9:0.002997,"
                           "conv_10:0.003631,conv_11:0.004147,"
                           "conv_12:0.005765,conv_13:0.007442,"
                           "conv_14:0.009666,conv_15:0.012586,"
                           "conv_16:0.013377")
    p.add_argument("--textureLossLayers", type=str,
                   default="conv_1:1,conv_3:1,conv_5:1")
    p.add_argument("--discriminator", type=str, default="enhanceNetLarge")
    p.add_argument("--lossAmbient", type=float, default=0.1)
    p.add_argument("--lossDiffuse", type=float, default=1.0)
    p.add_argument("--lossSpecular", type=float, default=0.0)
    p.add_argument("--lossAO", type=float, default=1.0)
    p.add_argument("--lossBorderPadding", type=int, default=16)
    # adversarial (reference :91-101)
    p.add_argument("--advTraining", action="store_true")
    p.add_argument("--pretrainedDiscr", type=str, default=None,
                   help="run dir: initialize the DISCRIMINATOR from its "
                        "latest checkpoint (reference --pretrainedDiscr)")
    p.add_argument("--ganType", type=str, default="bce",
                   choices=["bce", "wgan", "wgan-gp"],
                   help="adversarial objective (reference: adv vs wgan/"
                        "wgan-gp loss names, lossbuilder.py:232-304)")
    p.add_argument("--advDiscrLr", type=float, default=1e-4)
    p.add_argument("--advDiscrMaxSteps", type=int, default=1)
    p.add_argument("--advGenMaxSteps", type=int, default=1)
    # run management (reference :102-116, 181-195)
    p.add_argument("--runDir", type=str, default="runs")
    p.add_argument("--restore", type=str, default=None,
                   help="run dir to restore from")
    p.add_argument("--restoreEpoch", type=int, default=None)
    p.add_argument("--pretrained", type=str, default=None,
                   help="run dir or params .npz: initialize the GENERATOR "
                        "only, optimizers/discriminator fresh (the "
                        "stage-2 adversarial handoff; reference "
                        "--pretrained)")
    p.add_argument("--imageEvery", type=int, default=10,
                   help="log test image panels to tensorboard every N "
                        "epochs (0 disables; reference logs each epoch, "
                        "mainVideoUnshaded.py:728-797)")
    p.add_argument("--checkpointEvery", type=int, default=1)
    # parallel
    p.add_argument("--dataParallel", type=int, default=1,
                   help="devices on the batch axis (mesh size)")
    p.add_argument("--dataDtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of the device-resident dataset; "
                        "bfloat16 halves its HBM footprint")
    p.add_argument("--hostData", action="store_true",
                   help="force host-side batching (default: device-resident"
                        " dataset when it fits)")
    p.add_argument("--volumeDtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "uint8"],
                   help="HBM storage dtype of imported volumes (uint8 = "
                        "quarter footprint; RAW UCHAR stays bit-exact)")
    p.add_argument("--cacheDataset", type=str, default=None,
                   help="directory to cache generated clips (reference npy "
                        "layout); reused on the next run")
    return p


def make_config(args) -> "Config":
    from isosurfacesuperresolution_tpu.config import (
        Config, LossConfig, ModelConfig, ParallelConfig, TrainConfig)
    return Config(
        model=ModelConfig(
            model=args.model, upscale_factor=args.upscaleFactor,
            upsample=args.upsample, recon_type=args.reconType,
            use_bn=args.useBN, use_sn=args.useSN,
            num_residual_blocks=args.numResidualLayers,
            num_features=args.numFeatures,
            compute_dtype=args.computeDtype),
        loss=LossConfig(
            losses=args.losses,
            perceptual_loss_layers=args.perceptualLossLayers,
            texture_loss_layers=args.textureLossLayers,
            discriminator=args.discriminator,
            loss_ambient=args.lossAmbient, loss_diffuse=args.lossDiffuse,
            loss_specular=args.lossSpecular, loss_ao=args.lossAO,
            padding=args.lossBorderPadding,
            gan_type=args.ganType),
        train=TrainConfig(
            batch_size=args.batchSize, crop_size=args.cropSize,
            num_frames=args.numFrames, samples=args.samples,
            test_fraction=args.testFraction, epochs=args.epochs,
            learning_rate=args.lr, optimizer=args.optim.lower(),
            lr_gamma=args.lrGamma,
            lr_step=args.lrStep, grad_clip=args.gradClip, seed=args.seed,
            initial_image_mode=args.initialImage,
            disable_temporal=args.disableTemporal, augment=args.augment,
            min_fill_rate=args.minFillRate,
            adv_training=args.advTraining, discr_lr=args.advDiscrLr,
            discr_steps=args.advDiscrMaxSteps,
            gen_steps=args.advGenMaxSteps, remat=args.remat,
            run_dir_base=args.runDir,
            checkpoint_every=args.checkpointEvery),
        parallel=ParallelConfig(data_parallel=args.dataParallel),
    )


def _camera_distance(args):
    lo, hi = (float(v) for v in args.cameraDistance.split(","))
    if not (0.0 < lo <= hi):
        raise SystemExit(f"bad --cameraDistance {args.cameraDistance!r}")
    return (lo, hi)


def load_sequences(args, cfg):
    """Dataset resolution: npy dirs, analytic generator, or RAW volumes."""
    from isosurfacesuperresolution_tpu.config import RenderConfig
    from isosurfacesuperresolution_tpu.data.dataset import (
        load_reference_npy_dir)
    from isosurfacesuperresolution_tpu.data.generation import (
        SequenceConfig, generate_sequences)
    from isosurfacesuperresolution_tpu.volume import analytic

    spec = args.dataset
    if spec.startswith("analytic:"):
        name = spec.split(":", 1)[1]
        makers = {"sphere": analytic.sphere_volume,
                  "torus": analytic.torus_volume,
                  "gyroid": analytic.gyroid_volume,
                  "blobs": analytic.blobs_volume,
                  "turbulence": analytic.turbulence_volume,
                  "ejecta": analytic.ejecta_volume,
                  "interface": analytic.interface_volume,
                  "skull": analytic.skull_volume,
                  "thorax": analytic.thorax_volume}
        mixes = ("mix", "mix2", "mix3", "mix4")
        if name not in makers and name not in mixes:
            raise SystemExit(f"unknown analytic volume {name}")
        if name in mixes:
            grids = [(analytic.blobs_volume(128, num_blobs=8), (0.5, 0.5)),
                     (analytic.torus_volume(128), (0.5, 0.5)),
                     (analytic.gyroid_volume(128), (0.45, 0.55)),
                     (analytic.blobs_volume(128, num_blobs=14, seed=7),
                      (0.4, 0.6))]
            if name in ("mix2", "mix3", "mix4"):
                # round-2 zoo: reference-dataset analogues (Clouds / Ejecta /
                # RM, mainPSNR3_AllStats.py:29-40) at doubled resolution for
                # high-frequency training content
                grids += [
                    (analytic.turbulence_volume(256, seed=1), (0.45, 0.55)),
                    (analytic.turbulence_volume(256, seed=2, beta=3.0),
                     (0.45, 0.55)),
                    (analytic.ejecta_volume(256, seed=3), (0.3, 0.5)),
                    (analytic.ejecta_volume(256, seed=4,
                                            num_particles=700), (0.3, 0.5)),
                    (analytic.interface_volume(256, seed=5), (0.45, 0.55)),
                ]
            if name in ("mix3", "mix4"):
                # mix2 + extra smooth-surface exposure: the band-limited
                # families showed the speckle-trained net adds spurious
                # normal detail on resolvable surfaces; weight the slab /
                # smooth-sheet family higher so it learns that smooth
                # stays smooth
                grids += [
                    (analytic.interface_volume(256, seed=6,
                                               roughness=0.18),
                     (0.45, 0.55)),
                    (analytic.interface_volume(256, seed=7,
                                               roughness=0.08),
                     (0.45, 0.55)),
                    (analytic.turbulence_volume(256, seed=8, beta=4.0),
                     (0.45, 0.55)),
                ]
            if name == "mix4":
                # round-3 zoo: the remaining two reference-eval analogues
                # (Skull / Thorax, mainPSNR3_AllStats.py:29-40) join the
                # training distribution - thin curved shells with
                # silhouette holes and sub-pixel repeated ribs, both
                # absent from mix3.  The makers are deterministic (no
                # seed), so every zoo entry jitters structural
                # parameters away from the defaults - the held-out stats
                # volumes (default makers at 256) are never trained on.
                grids += [
                    (analytic.skull_volume(256, shell_thickness=0.018,
                                           sharpness=9.0), (0.48, 0.52)),
                    (analytic.skull_volume(192, shell_thickness=0.03,
                                           sharpness=12.0), (0.48, 0.52)),
                    (analytic.thorax_volume(256, num_ribs=8,
                                            sharpness=10.0), (0.48, 0.52)),
                    (analytic.thorax_volume(192, num_ribs=6,
                                            sharpness=14.0), (0.48, 0.52)),
                ]
            seq_cfg = SequenceConfig(
                num_frames=args.numFrames,
                high_res=args.cropSize * args.upscaleFactor * 4,
                ao_samples=args.aoSamples,
                distance_range=_camera_distance(args))
            base = RenderConfig(step_voxels=0.5)
            print(f"Generating {args.numberOfImages} sequences from "
                  f"analytic:mix ...")
            return generate_sequences(grids, args.numberOfImages, seq_cfg,
                                      base_render_cfg=base, seed=args.seed)
        grid = makers[name](128)
        seq_cfg = SequenceConfig(
            num_frames=args.numFrames,
            high_res=args.cropSize * args.upscaleFactor * 4,
            ao_samples=args.aoSamples,
            distance_range=_camera_distance(args))
        base = RenderConfig(isovalue=0.5, step_voxels=0.5)
        print(f"Generating {args.numberOfImages} sequences from "
              f"analytic:{name} ...")
        return generate_sequences([(grid, (0.5, 0.5))],
                                  args.numberOfImages, seq_cfg,
                                  base_render_cfg=base, seed=args.seed)
    if spec.startswith("descriptor:"):
        # descriptor file listing "volume_path min_iso max_iso" per line
        # (parity: DataGeneratorVideo2.py:99-121)
        from isosurfacesuperresolution_tpu.volume.importers import (
            import_npy, import_raw, load_cvol)
        path = spec.split(":", 1)[1]
        base_dir = os.path.dirname(os.path.abspath(path))
        grids = []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 3 or parts[0].startswith("#"):
                    continue
                vp = os.path.join(base_dir, parts[0])
                if vp.endswith(".dat"):
                    g = import_raw(vp)
                elif vp.endswith(".npz"):
                    g = load_cvol(vp)
                else:
                    g = import_npy(vp)
                grids.append((g, (float(parts[1]), float(parts[2]))))
        if not grids:
            raise SystemExit(f"no volumes in descriptor {path}")
        seq_cfg = SequenceConfig(
            num_frames=args.numFrames,
            high_res=args.cropSize * args.upscaleFactor * 4,
            ao_samples=args.aoSamples)
        base = RenderConfig(step_voxels=0.5)
        return generate_sequences(grids, args.numberOfImages, seq_cfg,
                                  base_render_cfg=base, seed=args.seed)
    if spec.endswith((".dat", ".raw")):
        from isosurfacesuperresolution_tpu.volume.importers import import_raw
        grid = import_raw(spec, store_dtype=args.volumeDtype)
        seq_cfg = SequenceConfig(
            num_frames=args.numFrames,
            high_res=args.cropSize * args.upscaleFactor * 4,
            ao_samples=args.aoSamples)
        base = RenderConfig(step_voxels=0.5)
        return generate_sequences([(grid, (0.3, 0.6))],
                                  args.numberOfImages, seq_cfg,
                                  base_render_cfg=base, seed=args.seed)
    return load_reference_npy_dir(spec)


def _log_test_images(writer, cfg, predict_clip, params, batch, epoch):
    """Tensorboard image panels for one fixed test clip (parity:
    `mainVideoUnshaded.py:728-797`): input / prediction / GT side by side
    for the shaded color and each unshaded channel, last frame."""
    import jax.numpy as jnp

    from isosurfacesuperresolution_tpu.ops.resize import resize
    from isosurfacesuperresolution_tpu.render.shading import (
        screen_space_shading)

    low, flow, high = batch
    low, flow, high = low[:1], flow[:1], high[:1]
    pred = predict_clip(params, low, flow)[0, -1]       # (H, W, C)
    gt = high[0, -1]
    hh, ww = gt.shape[0], gt.shape[1]
    inp = resize(low[:, -1], size=(hh, ww),
                 method=cfg.model.upsample)[0][..., :gt.shape[-1]]

    def panel(x):                                       # -> (3, H, 3W)
        x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return np.transpose(x, (2, 0, 1))

    triple = {}
    for name, buf in (("input", inp), ("prediction", pred), ("gt", gt)):
        buf = jnp.asarray(buf)
        shaded = screen_space_shading(buf[None], cfg.shading)[0]
        triple.setdefault("shaded", []).append(panel(shaded))
        triple.setdefault("mask", []).append(
            panel((np.asarray(buf[..., 0]) + 1.0) / 2.0))
        triple.setdefault("normal", []).append(
            panel((np.asarray(buf[..., 1:4]) + 1.0) / 2.0))
        triple.setdefault("depth", []).append(panel(np.asarray(buf[..., 4])))
        if buf.shape[-1] >= 6:
            triple.setdefault("ao", []).append(
                panel(np.asarray(buf[..., 5])))
    for name, panels in triple.items():
        writer.add_image(f"test/{name}", np.concatenate(panels, axis=2),
                         epoch)
    residual = np.abs(np.asarray(pred) - np.asarray(gt)).mean(-1)
    writer.add_image("test/residual", panel(residual * 4.0), epoch)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = make_config(args)

    import jax
    from tensorboardX import SummaryWriter

    from isosurfacesuperresolution_tpu.data.dataset import (
        DatasetFromSamples, VideoDataset)
    from isosurfacesuperresolution_tpu.losses.lossnet_unshaded import (
        LossNetUnshaded)
    from isosurfacesuperresolution_tpu.models.generators import (
        create_network)
    from isosurfacesuperresolution_tpu.parallel.mesh import (
        make_mesh, make_sharded_train_step, replicate)
    from isosurfacesuperresolution_tpu.train.checkpoint import (
        CheckpointManager, next_run_dir, save_params_npz, write_info)
    from isosurfacesuperresolution_tpu.train.trainer import (
        create_train_state, epoch_learning_rate, make_adv_train_steps,
        make_eval_step, make_optimizer, make_train_step)

    t = cfg.train
    rng = np.random.RandomState(t.seed)

    if args.cacheDataset and os.path.exists(
            os.path.join(args.cacheDataset, "low_00000.npy")):
        from isosurfacesuperresolution_tpu.data.dataset import (
            load_reference_npy_dir)
        print("loading cached dataset from", args.cacheDataset)
        sequences = load_reference_npy_dir(args.cacheDataset)
    else:
        sequences = load_sequences(args, cfg)
        if args.cacheDataset:
            os.makedirs(args.cacheDataset, exist_ok=True)
            for i, seq in enumerate(sequences):
                np.save(os.path.join(args.cacheDataset,
                                     "low_%05d.npy" % i),
                        seq["low"].transpose(0, 3, 1, 2))
                np.save(os.path.join(args.cacheDataset,
                                     "high_%05d.npy" % i),
                        seq["high"].transpose(0, 3, 1, 2))
                np.save(os.path.join(args.cacheDataset,
                                     "flow_%05d.npy" % i),
                        seq["flow"].transpose(0, 3, 1, 2))
            print("cached dataset to", args.cacheDataset)
    dataset = VideoDataset(sequences, upscale_factor=cfg.model.upscale_factor)
    samples = dataset.collect_samples(t.samples, t.crop_size,
                                      t.min_fill_rate, rng,
                                      augment=t.augment)
    train_set = DatasetFromSamples(dataset, samples, t.crop_size,
                                   test=False, test_fraction=t.test_fraction)
    test_set = DatasetFromSamples(dataset, samples, t.crop_size,
                                  test=True, test_fraction=t.test_fraction)
    print(f"#sequences: {len(sequences)}, train crops: {len(train_set)}, "
          f"test crops: {len(test_set)}")

    # device-resident batching: upload all clips once and slice crops on
    # device (through the tunneled TPU transport, per-batch host uploads
    # dominate the epoch time otherwise); host batching remains for
    # augmentation and oversized datasets
    device_data = None
    if (not t.augment and cfg.parallel.data_parallel <= 1
            and not args.hostData):
        import jax.numpy as jnp
        from isosurfacesuperresolution_tpu.train.device_data import (
            DeviceVideoDataset)
        dd = DeviceVideoDataset(sequences,
                                upscale_factor=cfg.model.upscale_factor,
                                store_dtype=jnp.dtype(args.dataDtype))
        if dd.nbytes() < 6 * 1024 ** 3:
            device_data = dd
            print(f"device-resident dataset: "
                  f"{dd.nbytes() / 1e9:.2f} GB in HBM")

    model = create_network(cfg.model)
    criterion = LossNetUnshaded(
        cfg.loss, high_res=t.crop_size * cfg.model.upscale_factor,
        use_spectral_norm=args.useSN)
    optimizer = make_optimizer(cfg)
    discr_optimizer = make_optimizer(cfg) if t.adv_training else None
    state = create_train_state(cfg, model, criterion, optimizer,
                               jax.random.PRNGKey(t.seed),
                               discr_optimizer=discr_optimizer)

    if t.adv_training:
        d_step, g_step = make_adv_train_steps(cfg, model, criterion,
                                              optimizer, discr_optimizer)
    else:
        train_step = make_train_step(cfg, model, criterion, optimizer)
    eval_step = make_eval_step(cfg, model, criterion)
    from isosurfacesuperresolution_tpu.train.trainer import make_predict_clip
    predict_clip = make_predict_clip(cfg, model)

    if cfg.parallel.data_parallel > 1:
        mesh = make_mesh(cfg.parallel.data_parallel)
        state = replicate(mesh, state)
        if not t.adv_training:
            train_step = make_sharded_train_step(train_step, mesh)

    run_dir = next_run_dir(t.run_dir_base)
    write_info(run_dir, cfg)
    ckpt = CheckpointManager(run_dir)
    writer = SummaryWriter(os.path.join(run_dir, "tensorboard"))
    print("run dir:", run_dir)

    start_epoch = 1
    if args.restore:
        restore_mgr = CheckpointManager(args.restore)
        state, epoch = restore_mgr.restore(state, args.restoreEpoch)
        start_epoch = epoch + 1
        print(f"restored epoch {epoch} from {args.restore}")
    elif args.pretrained:
        # generator weights only; optimizer/discriminator start fresh
        # (reference --pretrained, mainVideoUnshaded.py:317-327 - the
        # stage-1 -> adversarial-stage-2 handoff)
        if args.pretrained.endswith(".npz"):
            from isosurfacesuperresolution_tpu.train.checkpoint import (
                load_params_npz)
            state = state._replace(
                params=load_params_npz(args.pretrained, state.params))
            print(f"pretrained generator from {args.pretrained}")
        elif (not os.path.isdir(os.path.join(args.pretrained, "checkpoints"))
              and os.path.exists(os.path.join(args.pretrained,
                                              "params.npz"))):
            # committed-artifact run dir (params.npz only; see ckpt.save)
            from isosurfacesuperresolution_tpu.train.checkpoint import (
                load_params_npz)
            state = state._replace(params=load_params_npz(
                os.path.join(args.pretrained, "params.npz"), state.params))
            print(f"pretrained generator from {args.pretrained}/params.npz")
        else:
            pre_mgr = CheckpointManager(args.pretrained)
            params, epoch = pre_mgr.restore_params(state.params,
                                                   args.restoreEpoch)
            state = state._replace(params=params)
            print(f"pretrained generator from {args.pretrained} "
                  f"(epoch {epoch})")
    if args.pretrainedDiscr:
        # discriminator weights only (reference --pretrainedDiscr,
        # mainVideoUnshaded.py:323-331); requires --advTraining so the
        # state carries a discriminator of matching architecture
        if not t.adv_training:
            raise SystemExit("--pretrainedDiscr requires --advTraining")
        pre_mgr = CheckpointManager(args.pretrainedDiscr)
        discr_params, depoch = pre_mgr.restore_discr_params(
            state.discr_params, args.restoreEpoch)
        state = state._replace(discr_params=discr_params)
        print(f"pretrained discriminator from {args.pretrainedDiscr} "
              f"(epoch {depoch})")

    # Checkpoint-then-exit on SIGTERM: the benchmark preempts queue
    # drivers (bench.py preempt_queues) and the host VM can be recycled;
    # both deliver SIGTERM.  The handler only sets a flag - the batch
    # loop breaks at the next step boundary (<1 s), saves a full orbax
    # checkpoint + params.npz, and exits cleanly.  The PARAMETER STATE
    # therefore loses at most the current batch; the checkpoint is saved
    # under the interrupted epoch's number and --restore resumes at
    # epoch+1, so the unprocessed remainder of that epoch's batches is
    # skipped on resume (resume rounds up to the next epoch; with
    # shuffled epochs this skews nothing, it just shortens one epoch).
    import signal
    _stop = {"sig": None}

    def _on_term(signum, frame):
        _stop["sig"] = signum
        print(f"signal {signum} received: checkpointing at the next "
              f"batch boundary, then exiting", flush=True)
    signal.signal(signal.SIGTERM, _on_term)

    recent_losses: List[float] = []   # spike-guard window
    for epoch in range(start_epoch, t.epochs + 1):
        lr = epoch_learning_rate(cfg, epoch - 1)
        from isosurfacesuperresolution_tpu.train.trainer import (
            set_learning_rate)
        set_learning_rate(state.opt_state, lr)
        t0 = time.time()
        epoch_loss, n_batches = 0.0, 0
        if device_data is not None:
            batch_iter = device_data.batches(train_set.samples,
                                             t.batch_size, t.crop_size,
                                             rng=rng)
        else:
            batch_iter = train_set.batches(t.batch_size, rng=rng)
        for low, flow, high in batch_iter:
            if _stop["sig"] is not None:
                break
            if t.adv_training:
                for _ in range(t.discr_steps):
                    state, d_loss, gt_s, pred_s = d_step(
                        state, low, flow, high,
                        jax.random.PRNGKey(rng.randint(1 << 31)))
                for _ in range(t.gen_steps):
                    state, loss = g_step(state, low, flow, high)
                writer.add_scalar("train/discr_loss", float(d_loss), epoch)
                writer.add_scalar("train/gt_score", float(gt_s), epoch)
                writer.add_scalar("train/pred_score", float(pred_s), epoch)
            else:
                prev_state = state
                state, loss = train_step(state, low, flow, high)
                lossf = float(loss)
                if not np.isfinite(lossf) or (
                        len(recent_losses) >= 20
                        and lossf > 5.0 * np.median(recent_losses)):
                    # NaN/spike guard (the reference's benchmarks scan for
                    # NaNs, mainPSNR2_AllAngles.py:258-262; outlier batches
                    # additionally destabilize training for many epochs,
                    # so the update is rolled back)
                    print(f"WARNING: loss {lossf:.3g} at epoch {epoch}, "
                          f"batch {n_batches} (median "
                          f"{np.median(recent_losses) if recent_losses else 0:.3g}); "
                          f"skipping batch")
                    state = prev_state
                    continue
                recent_losses.append(lossf)
                if len(recent_losses) > 200:
                    recent_losses.pop(0)
            epoch_loss += float(loss)
            n_batches += 1
        if _stop["sig"] is not None:
            ckpt.save(epoch, state)
            save_params_npz(os.path.join(run_dir, "params.npz"),
                            jax.device_get(state.params))
            print(f"preempted at epoch {epoch} ({n_batches} batches): "
                  f"checkpoint + params.npz saved to {run_dir}",
                  flush=True)
            break
        epoch_loss /= max(n_batches, 1) * t.num_frames
        writer.add_scalar("train/total_loss", epoch_loss, epoch)
        writer.add_scalar("train/lr", lr, epoch)

        # test pass (parity: mainVideoUnshaded.py:639-726)
        test_loss, test_psnr, n_test = 0.0, 0.0, 0
        if device_data is not None:
            test_iter = device_data.batches(test_set.samples, t.batch_size,
                                            t.crop_size, shuffle=False,
                                            drop_last=True)
        else:
            test_iter = test_set.batches(t.batch_size, shuffle=False,
                                         drop_last=False)
        first_test = None
        for low, flow, high in test_iter:
            if first_test is None:
                first_test = (low, flow, high)
            l, p = eval_step(state.params, state.aux_params, low, flow, high)
            test_loss += float(l)
            test_psnr += float(p)
            n_test += 1
        if n_test:
            writer.add_scalar("test/total_loss", test_loss / n_test, epoch)
            writer.add_scalar("test/psnr", test_psnr / n_test, epoch)
        if (args.imageEvery and epoch % args.imageEvery == 0
                and first_test is not None):
            _log_test_images(writer, cfg, predict_clip, state.params,
                             first_test, epoch)
        print(f"===> Epoch {epoch}: train loss {epoch_loss:.4f}, "
              f"test psnr {test_psnr / max(n_test, 1):.2f} dB "
              f"({time.time() - t0:.1f}s)")

        if epoch % t.checkpoint_every == 0:
            ckpt.save(epoch, state)
            # small git-committable artifact next to the orbax tree: the
            # host VM can be recycled between sessions (wiping anything
            # uncommitted), and config.json + params.npz is all inference
            # needs (LoadedModel.from_run_dir falls back to it)
            save_params_npz(os.path.join(run_dir, "params.npz"),
                            jax.device_get(state.params))
    save_params_npz(os.path.join(run_dir, "params.npz"),
                    jax.device_get(state.params))
    writer.close()
    print("done; checkpoints in", run_dir)


if __name__ == "__main__":
    main()
