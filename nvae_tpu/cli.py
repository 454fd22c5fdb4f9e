"""Command-line entry point — full flag parity with the reference CLI
(``train.py:145-297``) plus TPU-native extras.

Modes:
  train   — run the jitted training loop with checkpoints + image hooks
  test    — full evaluation suite (IWAE NLL, FID, precision/recall, PPL)
  sample  — write sample PNGs at temperatures {0.7, 0.8, 0.9, 1.0}
  serve   — dynamic-batching HTTP sampling service on the latest checkpoint
            (the deployment surface the reference lacks; serving_http.py)

Usage:
  python -m nvae_tpu.cli --mode train --dataset synthetic --debug --epochs 2
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # -- reference flags (train.py:145-297), same names and defaults --------
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=144)
    p.add_argument("--mode", type=str,
                   choices=["train", "test", "sample", "serve"],
                   default="train")
    p.add_argument("--n_encoder_channels", type=int, default=32)
    p.add_argument("--n_decoder_channels", type=int, default=32)
    p.add_argument("--res_cells_per_group", type=int, default=1)
    p.add_argument("--n_preprocess_blocks", type=int, default=2)
    p.add_argument("--n_preprocess_cells", type=int, default=3)
    p.add_argument("--n_postprocess_blocks", type=int, default=2)
    p.add_argument("--n_postprocess_cells", type=int, default=3)
    p.add_argument("--n_latent_per_group", type=int, default=20)
    p.add_argument("--n_groups_per_scale", nargs="+", type=int, default=[5, 10])
    p.add_argument("--sr_lambda", type=float, default=0.01)
    p.add_argument("--scale_factor", type=int, default=2)
    # Default None (= mnist without a preset) so an explicit "--dataset
    # mnist" can override a preset's dataset.
    p.add_argument("--dataset", type=str, default=None,
                   choices=["mnist", "fashion_mnist", "omniglot", "cifar10",
                            "celeba", "synthetic", "synthetic_rgb",
                            "synthetic_rgb64"])
    p.add_argument("--cpu", action="store_true", help="Force CPU execution")
    p.add_argument("--debug", action="store_true",
                   help="Use only the first 4 batches of data")
    p.add_argument("--n_samples", type=int, default=10)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--model_save_dir", type=str, default="models")
    p.add_argument("--sample_dir", type=str, default="results")
    p.add_argument("--resume_from", type=int, default=0)
    p.add_argument("--tensorboard_log_dir", type=str, default="logs")
    p.add_argument("--sample_frequency", type=int, default=5)
    p.add_argument("--evaluate_frequency", type=int, default=10)
    p.add_argument("--log_frequency", type=int, default=1)
    p.add_argument("--binary_eval", action="store_true")
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--model_save_frequency", type=int, default=10)
    p.add_argument("--step_based_warmup", action="store_true")
    p.add_argument("--workers", type=int, default=1,
                   help="Accepted for reference CLI parity; host pipeline is "
                        "single-threaded by design (device does the work)")
    p.add_argument("--multiprocessing", action="store_true",
                   help="Accepted for reference CLI parity; no-op")
    p.add_argument("--seed", type=int, default=1)
    # -- TPU-native extras --------------------------------------------------
    p.add_argument("--data_dir", type=str, default="",
                   help="Directory with local dataset files")
    p.add_argument("--spectral_mode", type=str, default="projection",
                   choices=["projection", "forward", "penalty", "none"],
                   help="projection=SN in optimizer (fast), forward=per-call "
                        "SN (reference parity), penalty=spectral reg (SR "
                        "variant), none")
    # Default None (not "float32") so a preset's own dtype choice is only
    # overridden when the flag is explicitly passed (same pattern as
    # --dataset).
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--bn_apply_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="BatchNorm normalization-apply dtype (stats stay "
                        "fp32); bfloat16 removes the fp32 islands between "
                        "bf16 convs")
    p.add_argument("--likelihood", type=str, default="",
                   help="bernoulli|dml; default picks by dataset")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="Devices on the data mesh axis (0 = all)")
    p.add_argument("--fsdp", action="store_true",
                   help="Shard params + Adamax moments 1/N over the data "
                        "axis (ZeRO-3 layout) instead of replicating — for "
                        "configs that outgrow one chip's HBM")
    p.add_argument("--profile_dir", type=str, default="",
                   help="Write a jax.profiler trace of one epoch here")
    p.add_argument("--parity_binarize_255", action="store_true",
                   help="Reproduce the reference's >0-threshold binarization")
    p.add_argument("--parity_frozen_norm", action="store_true",
                   help="Reproduce the reference's training-mode defect: its "
                        "train_step calls the model with no training flag "
                        "(models.py:117), so BN moving stats stay frozen at "
                        "init and spectral normalization never runs (proven "
                        "by tools/reference_oracle.py phase D/E1)")
    p.add_argument("--temperature_all_groups", action="store_true",
                   help="Apply sampling temperature to every latent group "
                        "(the reference only scales z0)")
    p.add_argument("--scale_temperatures", nargs="+", type=float,
                   default=None, metavar="T",
                   help="Annealed sampling: one temperature per decoder "
                        "scale, top-down (e.g. 0.6 0.9 for a 2-scale model)."
                        " In sample mode, writes an extra t_annealed/ "
                        "directory with this schedule (the multi-scale "
                        "sampling control SURVEY §7 names for the CelebA "
                        "config)")
    p.add_argument("--preset", type=str, default="",
                   help="Named experiment preset (see nvae_tpu/presets.py): "
                        "mnist_step_sn | mnist_step_sn_parity | mnist_step_sr "
                        "| mnist_epoch_sn | omniglot_deep | fashion_mnist_deep"
                        " | cifar10_dml | celeba64. The preset fixes the "
                        "architecture/dataset/warmup; runtime flags (epochs, "
                        "dirs, seed, debug, ...) still apply.")
    p.add_argument("--scan_epochs", action="store_true",
                   help="Run each epoch as one XLA program over a device-"
                        "resident dataset (fastest path; dataset must fit HBM)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize residual cells (activation-memory "
                        "saver for deep/high-res configs)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="Exponential moving average of the params inside "
                        "the optimizer (NVAE-paper style, e.g. 0.9999); "
                        "0 disables. Evaluate/sample on the average with "
                        "--use_ema")
    p.add_argument("--use_ema", action="store_true",
                   help="test/sample/serve modes: run on the EMA weights "
                        "from the checkpoint (requires --ema_decay training)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="Microbatches per optimizer step (gradient "
                        "accumulation inside the jitted step; activation "
                        "memory scales with batch_size/grad_accum); "
                        "composes with --fsdp and multi-device meshes")
    p.add_argument("--pp_stages", type=int, default=1,
                   help="Pipeline parallelism (GPipe): split the model's "
                        "stage modules over this many devices (2-4); each "
                        "stage holds 1/S of params+optimizer. With "
                        "--data_parallel N, N devices per stage. Excludes "
                        "--scan_epochs/--grad_accum/--fsdp")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per optimizer step (0 = "
                        "pp_stages); the pipeline's gradient accumulation")
    p.add_argument("--pp_schedule", choices=("1f1b", "gpipe"), default="1f1b",
                   help="Pipeline dispatch order: 1f1b bounds the "
                        "boundary-activation stash at O(stages); gpipe is "
                        "classic fill-drain (O(microbatches)). Bitwise "
                        "identical results either way")
    p.add_argument("--postprocess_depthwise", action="store_true",
                   help="Depthwise postprocess 5x5 (the form the reference "
                        "intended but left commented out, postprocess.py:76; "
                        "~2x faster steps, non-parity)")
    p.add_argument("--use_pallas", action="store_true",
                   help="Fused swish->depthwise-5x5 Pallas kernels on the "
                        "hot spots (same math; TPU only, interpret elsewhere)")
    # Serving (--mode serve): the HTTP front end over the dynamic-batching
    # sampler (serving_http.py); batch_size is the packing target, and with
    # --data_parallel > 1 the sampler shards rows over the mesh
    # (serving.build_mesh_sampler — bitwise-equal output either way).
    p.add_argument("--serve_host", type=str, default="127.0.0.1")
    p.add_argument("--serve_port", type=int, default=8000)
    p.add_argument("--serve_max_delay_ms", type=float, default=10.0,
                   help="Launch a partial batch once the oldest queued "
                        "request has waited this long (latency/throughput "
                        "knob; 0 = full batches only)")
    p.add_argument("--serve_batches", type=int, nargs="*", default=None,
                   help="Additional (smaller) serving batch shapes beside "
                        "--batch_size: partial dispatches run the smallest "
                        "pre-compiled shape covering the backlog, so light "
                        "load pays small-batch latency instead of padding "
                        "the big program (multi-shape serving; live-model "
                        "servers only)")
    p.add_argument("--serve_fetch_workers", type=int, default=2,
                   help="Threads overlapping device->host result transfers "
                        "(the serving bottleneck through a remote TPU "
                        "runtime; measured ladder in README)")
    p.add_argument("--serve_follow_s", type=float, default=0.0,
                   help="Poll the checkpoint dir every N seconds and "
                        "hot-reload newer steps automatically (deploy "
                        "follows training); 0 = reload only on POST "
                        "/reload or SIGHUP")
    p.add_argument("--serve_dtype", type=str, default="",
                   choices=["", "bfloat16", "int8"],
                   help="Weight serving dtype: bfloat16 casts params, int8 "
                        "quantizes large kernels (serving.quantize_params_"
                        "int8; measured 0.998x throughput, README)")
    p.add_argument("--serve_output", type=str, default="",
                   choices=["", "uint8"],
                   help="Serve uint8 pixel values (round(p*255) computed "
                        "on the device): 4x less device->host transfer per "
                        "dispatch — the serving bottleneck through a remote "
                        "TPU runtime.  npy responses carry the dtype in "
                        "their header; png output is identical either way")
    # Evaluation protocol (reference hardcodes 10 attempts / {0.6,0.8,1.0} /
    # 10,000 FID samples at evaluate.py:58-156; configurable here).
    p.add_argument("--eval_attempts", type=int, default=10)
    p.add_argument("--eval_temperatures", nargs="+", type=float,
                   default=[0.6, 0.8, 1.0])
    p.add_argument("--fid_sample_size", type=int, default=10000)
    p.add_argument("--feature_backbone", type=str, default="vgg16",
                   choices=["vgg16", "inception", "random_conv"],
                   help="P&R/PPL feature space (reference evaluate.py:209 "
                        "uses Keras VGG16)")
    p.add_argument("--fid_backbone", type=str, default="inception",
                   choices=["vgg16", "inception", "random_conv"],
                   help="FID feature space (the reference FIDs with the "
                        "frozen Inception pool_3 graph, fid_utils.py:245-316"
                        " — published FIDs are only comparable there)")
    # Metric-protocol parity switches (see PARITY.md "Evaluation parity
    # switches"); --eval_parity turns all of them on at once.
    p.add_argument("--pr_parity_accounting", action="store_true",
                   help="Reproduce the reference's [0,2]-scaled P&R "
                        "accounting (sums 2 microbatches per batch)")
    p.add_argument("--pr_parity_orientation", action="store_true",
                   help="Reproduce the reference's swapped P&R argument "
                        "order (its 'precision' is textbook recall)")
    p.add_argument("--parity_resize_299", action="store_true",
                   help="Nearest-neighbor resize to 299x299 before the "
                        "feature backbone, like the reference")
    p.add_argument("--parity_fid_uint8", action="store_true",
                   help="uint8-quantize images before FID features (the "
                        "reference's PNG disk round-trip)")
    p.add_argument("--parity_unit_input", action="store_true",
                   help="Feed raw [0,1] images to the backbone (the "
                        "reference applies no preprocessing)")
    p.add_argument("--eval_parity", action="store_true",
                   help="Enable every metric-protocol parity switch: "
                        "bit-faithful reference protocol given real weights")
    return p.parse_args(argv)


def build_configs(args, bundle):
    from nvae_tpu.config import ModelConfig, TrainConfig

    likelihood = args.likelihood or (
        "dml" if bundle.channels == 3 else "bernoulli"
    )
    target = 32 if bundle.image_size <= 32 else bundle.image_size
    model_cfg = ModelConfig(
        image_size=target,
        in_channels=bundle.channels,
        n_encoder_channels=args.n_encoder_channels,
        n_decoder_channels=args.n_decoder_channels,
        res_cells_per_group=args.res_cells_per_group,
        n_preprocess_blocks=args.n_preprocess_blocks,
        n_preprocess_cells=args.n_preprocess_cells,
        n_postprocess_blocks=args.n_postprocess_blocks,
        n_postprocess_cells=args.n_postprocess_cells,
        n_latent_per_group=args.n_latent_per_group,
        n_groups_per_scale=tuple(args.n_groups_per_scale),
        scale_factor=args.scale_factor,
        sr_lambda=args.sr_lambda,
        likelihood=likelihood,
        spectral_mode=args.spectral_mode,
        compute_dtype=args.compute_dtype or "float32",
        bn_apply_dtype=args.bn_apply_dtype or "float32",
        temperature_all_groups=args.temperature_all_groups,
        remat=args.remat,
        postprocess_5x5_depthwise=args.postprocess_depthwise,
        use_pallas_kernels=args.use_pallas,
    )
    train_cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        dataset=args.dataset,
        seed=args.seed,
        step_based_warmup=args.step_based_warmup,
        parity_binarize_255=args.parity_binarize_255,
        parity_frozen_norm=args.parity_frozen_norm,
        binary=likelihood == "bernoulli",
        debug=args.debug,
        sample_frequency=args.sample_frequency,
        evaluate_frequency=args.evaluate_frequency,
        log_frequency=args.log_frequency,
        model_save_frequency=args.model_save_frequency,
        patience=args.patience or 0,
        resume_from=args.resume_from,
        n_samples=args.n_samples,
        binary_eval=args.binary_eval,
        model_save_dir=args.model_save_dir,
        sample_dir=args.sample_dir,
        tensorboard_log_dir=args.tensorboard_log_dir,
        data_dir=args.data_dir,
        scan_epochs=args.scan_epochs,
        # --use_ema alone (test/sample/serve on an EMA checkpoint) must
        # still build an optimizer chain WITH the EmaState slot, or the
        # orbax restore template won't match the on-disk tree; the decay
        # value itself is irrelevant outside training updates.
        ema_decay=args.ema_decay or (0.9999 if args.use_ema else 0.0),
        grad_accum=args.grad_accum,
        data_parallel=args.data_parallel,
        pipeline_stages=args.pp_stages,
        pipeline_microbatches=args.pp_microbatches,
        pipeline_schedule=args.pp_schedule,
    )
    return model_cfg, train_cfg


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    print(f"Args: {vars(args)}")

    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax

    # Plugin sitecustomize files (e.g. the axon TPU tunnel) force-set
    # jax_platforms at import, silently overriding the JAX_PLATFORMS env
    # var — re-assert the caller's explicit non-plugin choice so --cpu and
    # JAX_PLATFORMS=cpu actually land on CPU (same fix as
    # __graft_entry__._honor_env_platform).
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    from nvae_tpu.data import load_dataset, make_iterators
    from nvae_tpu.parallel import data_sharding, make_mesh
    from nvae_tpu.train.trainer import Trainer
    from nvae_tpu.utils.compile_cache import enable_compile_cache
    from nvae_tpu.utils.logging import MetricsLogger

    enable_compile_cache()

    if args.preset:
        import dataclasses as _dc

        from nvae_tpu.presets import get_preset

        model_cfg, preset_train = get_preset(args.preset)
        # Performance switches compose with presets (same math / same param
        # tree — they are not part of a preset's architecture identity).
        # Only fields the user explicitly passed override the preset: the
        # dtype flags default to None, and the store_true flags can only
        # turn a feature ON (a preset that enables one is never clobbered
        # back off by an argparse default).
        model_cfg = _dc.replace(
            model_cfg,
            compute_dtype=args.compute_dtype or model_cfg.compute_dtype,
            bn_apply_dtype=args.bn_apply_dtype or model_cfg.bn_apply_dtype,
            postprocess_5x5_depthwise=(
                model_cfg.postprocess_5x5_depthwise
                or args.postprocess_depthwise
            ),
            use_pallas_kernels=(
                model_cfg.use_pallas_kernels or args.use_pallas
            ),
            remat=model_cfg.remat or args.remat,
        )
        # An explicitly passed --dataset overrides the preset's (e.g.
        # --preset cifar10_dml --dataset synthetic_rgb drives the DML
        # architecture without local CIFAR files).  argparse default is
        # None so `--dataset mnist` is distinguishable from "not given".
        preset_ds = args.dataset or preset_train.dataset
        bundle = load_dataset(preset_ds, args.data_dir)
        train_cfg = _dc.replace(
            preset_train,
            dataset=preset_ds,
            epochs=args.epochs,
            seed=args.seed,
            debug=args.debug,
            sample_frequency=args.sample_frequency,
            evaluate_frequency=args.evaluate_frequency,
            log_frequency=args.log_frequency,
            model_save_frequency=args.model_save_frequency,
            patience=args.patience or 0,
            resume_from=args.resume_from,
            n_samples=args.n_samples,
            model_save_dir=args.model_save_dir,
            sample_dir=args.sample_dir,
            tensorboard_log_dir=args.tensorboard_log_dir,
            data_dir=args.data_dir,
            scan_epochs=args.scan_epochs,
            grad_accum=args.grad_accum,
            data_parallel=args.data_parallel,
            pipeline_stages=args.pp_stages,
            pipeline_microbatches=args.pp_microbatches,
            pipeline_schedule=args.pp_schedule,
        )
        args.dataset = train_cfg.dataset
        args.batch_size = train_cfg.batch_size
    else:
        args.dataset = args.dataset or "mnist"
        bundle = load_dataset(args.dataset, args.data_dir)
        model_cfg, train_cfg = build_configs(args, bundle)

    if args.scale_temperatures is not None and len(
        args.scale_temperatures
    ) != model_cfg.n_latent_scales:
        raise SystemExit(
            f"--scale_temperatures needs one value per decoder scale "
            f"({model_cfg.n_latent_scales} for this config), got "
            f"{len(args.scale_temperatures)}"
        )

    mesh = None
    sharding = None
    if args.pp_stages > 1:
        # Pipeline mode does its own per-stage placement (no GSPMD mesh);
        # --data_parallel becomes the DP width within each stage.
        if args.fsdp or args.scan_epochs:
            raise SystemExit(
                "--pp_stages excludes --fsdp/--scan_epochs (per-stage "
                "placement vs whole-mesh GSPMD layouts)"
            )
        print(f"Pipeline: {args.pp_stages} stages x "
              f"dp={args.data_parallel or len(jax.devices()) // args.pp_stages}")
    elif args.data_parallel != 1 and len(jax.devices()) > 1:
        mesh = make_mesh(n_data=args.data_parallel)
        sharding = data_sharding(mesh)
        print(f"Mesh: {mesh}")

    train_iter, test_iter = make_iterators(
        bundle,
        args.batch_size,
        target_size=model_cfg.image_size,
        binarize=train_cfg.binary if args.mode == "train" else args.binary_eval,
        parity_binarize_255=args.parity_binarize_255,
        seed=args.seed,
        sharding=sharding,
        debug=args.debug,
    )
    print(
        f"Dataset {bundle.name}: {len(bundle.train_x)} train / "
        f"{len(bundle.test_x)} test, {len(train_iter)} batches/epoch"
    )

    logger = MetricsLogger(args.tensorboard_log_dir)
    trainer = Trainer(
        model_cfg, train_cfg, steps_per_epoch=len(train_iter), mesh=mesh,
        logger=logger,
        param_sharding="fsdp" if (args.fsdp and mesh is not None) else
        "replicated",
    )

    if args.mode == "train":
        result = trainer.fit(
            train_iter, test_iter, profile_dir=args.profile_dir or None
        )
        last = result.history[-1] if result.history else {}
        print(
            f"Training done: best_loss={result.best_loss:.3f} "
            f"last_throughput={last.get('images_per_sec', 0):.1f} img/s"
        )
    elif args.mode == "test":
        start = trainer.maybe_resume()
        if args.use_ema:
            trainer.swap_in_ema()
        print(f"Evaluating checkpoint at epoch {start}"
              f"{' (EMA weights)' if args.use_ema else ''}")
        from nvae_tpu.eval.evaluate import evaluate_model

        evaluation = evaluate_model(
            trainer,
            test_iter,
            batch_size=args.batch_size,
            n_attempts=args.eval_attempts,
            binary=args.binary_eval,
            temperatures=tuple(args.eval_temperatures),
            fid_sample_size=args.fid_sample_size,
            feature_backbone=args.feature_backbone,
            fid_backbone=args.fid_backbone,
            pr_parity_accounting=(
                args.pr_parity_accounting or args.eval_parity
            ),
            pr_parity_orientation=(
                args.pr_parity_orientation or args.eval_parity
            ),
            parity_resize_299=args.parity_resize_299 or args.eval_parity,
            parity_fid_uint8=args.parity_fid_uint8 or args.eval_parity,
            parity_unit_input=args.parity_unit_input or args.eval_parity,
            mesh=mesh,
        )
        print(f"Negative log likelihood: {evaluation.nll}")
        print(evaluation)
        with open(os.path.join(args.tensorboard_log_dir, "evaluation.json"), "w") as f:
            json.dump(evaluation.to_dict(), f, indent=2)
    elif args.mode == "sample":
        trainer.maybe_resume()
        if args.use_ema:
            trainer.swap_in_ema()
        from nvae_tpu.utils.images import sample_sweep_to_dirs, sample_to_dir

        # The whole T sweep rides one batched dispatch per batch index
        # (per-sample temperature vector) — see sample_sweep_to_dirs.
        written = sample_sweep_to_dirs(
            lambda n_, t_, b: np.asarray(trainer.sample_images(n_, t_)[0]),
            args.batch_size,
            args.n_samples,
            [0.7, 0.8, 0.9, 1.0],
            args.sample_dir,
        )
        for t, n in written.items():
            print(
                f"Wrote {n} samples at T={t} to "
                f"{os.path.join(args.sample_dir, f't_{t:.1f}')}"
            )
        if args.scale_temperatures:
            st = tuple(args.scale_temperatures)
            out_dir = os.path.join(args.sample_dir, "t_annealed")
            n = sample_to_dir(
                lambda n_, t_, b: np.asarray(
                    trainer.sample_images(
                        n_, t_, scale_temperatures=st
                    )[0]
                ),
                args.batch_size,
                args.n_samples,
                1.0,
                out_dir,
            )
            print(
                f"Wrote {n} annealed samples (per-scale T={st}) to {out_dir}"
            )
    elif args.mode == "serve":
        start = trainer.maybe_resume()
        if args.use_ema:
            trainer.swap_in_ema()
        print(f"Serving checkpoint at epoch {start} "
              f"(untrained weights if 0 and no checkpoint)"
              f"{' (EMA weights)' if args.use_ema else ''}")
        call, reloader_factory, batches = _build_serve_call(
            args, trainer, mesh)
        from nvae_tpu.serving_http import serve

        print(f"serving on http://{args.serve_host}:{args.serve_port} "
              f"(batch{'es' if len(batches) > 1 else ''} "
              f"{'/'.join(str(b) for b in batches)}, "
              f"max_delay {args.serve_max_delay_ms} ms"
              f"{', reloadable' if reloader_factory else ''})", flush=True)
        serve(call, batches if len(batches) > 1 else args.batch_size,
              host=args.serve_host,
              port=args.serve_port, max_delay_ms=args.serve_max_delay_ms,
              seed=args.seed, drain_signals=True,
              reloader_factory=reloader_factory,
              follow_seconds=args.serve_follow_s,
              fulfill_workers=args.serve_fetch_workers)
    logger.close()


def _build_serve_call(args, trainer, mesh):
    """The ``(key_data, f32[B]) -> images`` sampler for ``--mode serve``,
    plus its hot-reload factory (``POST /reload`` / SIGHUP pull the latest
    checkpoint the trainer wrote — zero-downtime deploy-follows-training).

    Single-device serving uses :class:`~nvae_tpu.serving.ReloadableSampler`
    (weights are a jit argument; a reload is a device transfer, not a
    recompile).  Mesh serving (``--data_parallel``) keeps the fixed-weight
    ``build_mesh_sampler`` program and returns no reloader.
    ``--serve_dtype`` applies the weight-only serving casts (bf16 / int8)
    on startup and on every reload."""
    import jax
    import jax.numpy as jnp

    from nvae_tpu.serving import (
        ReloadableSampler,
        build_mesh_sampler,
        make_checkpoint_reloader,
        variables_from_state,
    )

    state = trainer.state
    # params already hold the EMA average here if --use_ema (swap_in_ema
    # ran in the serve-mode prologue); reloads re-extract it per request.
    variables = variables_from_state(state)
    st = tuple(args.scale_temperatures) if args.scale_temperatures else None
    B = args.batch_size
    batches = sorted(set((args.serve_batches or []) + [B]))
    reloader_factory = None
    if mesh is not None:
        if len(batches) > 1:
            raise SystemExit(
                "--serve_batches is for live-model single-device serving; "
                "the mesh sampler compiles one fixed shape")
        from nvae_tpu.serving import cast_params, quantize_params_int8

        if args.serve_dtype == "bfloat16":
            variables = {**variables,
                         "params": cast_params(variables["params"],
                                               jnp.bfloat16)}
        elif args.serve_dtype == "int8":
            variables = {**variables,
                         "params": quantize_params_int8(variables["params"])}
        call = build_mesh_sampler(
            trainer.model, variables, B, mesh,
            per_sample_temperature=True, scale_temperatures=st,
            output_dtype=args.serve_output,
        )
    else:
        call = ReloadableSampler(
            trainer.model, variables, B, scale_temperatures=st,
            serve_dtype=args.serve_dtype, output_dtype=args.serve_output,
        )
        call.step = int(state.step)
        reloader = make_checkpoint_reloader(
            call, trainer.ckpt_dir, state, use_ema=args.use_ema
        )
        reloader_factory = lambda _sampler: reloader  # noqa: E731
    # Warm every serving shape's compile before accepting traffic.
    kd = jax.random.key_data(jax.random.PRNGKey(9))
    for b in batches:
        float(jnp.asarray(call(kd, jnp.ones((b,), jnp.float32))).mean())
    return call, reloader_factory, batches


if __name__ == "__main__":
    main()
