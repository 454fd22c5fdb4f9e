#!/usr/bin/env python
"""Wall-clock one COMPLETE reference evaluation protocol on-chip
(VERDICT r4 #5).

The reference's eval cost is part of BASELINE: its k-NN P&R pass alone ran
>10 h and PPL ~5 h (project PDF §4.1.2), on top of FID-10k and the IWAE
NLL (reference ``evaluate.py:48-163``).  Individual passes here are
benchmarked elsewhere (bench.py pr mode, PROFILE.md); this tool times ONE
full ``evaluate_model`` protocol — 3 temperatures x ``--attempts``
sampling attempts with microbatched P&R + PPL, FID over
``--fid_sample_size`` generated images, IWAE-10 NLL over the full test
set — against a trained checkpoint, and prints a single JSON line.

The feature backbones run at the reference's architectures (VGG16 224^2 /
InceptionV3 299^2); with no local ImageNet npz they carry fixed-seed
random weights — identical FLOPs and memory traffic, so the TIMING is
representative even though metric values are framework-internal
(ModelEvaluation records the provenance).

Usage (after ``python tools/parity_run.py`` produced its checkpoint):

  python tools/bench_eval_protocol.py --ckpt results/parity_run/ckpt \
      [--n_test 10000] [--fid_sample_size 10000] [--attempts 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", default="results/parity_run/ckpt")
    ap.add_argument("--preset", default="mnist_step_sn_parity")
    ap.add_argument("--batch_size", type=int, default=144)
    ap.add_argument("--n_test", type=int, default=10000,
                    help="Test-set size (MNIST test = 10,000)")
    ap.add_argument("--n_train_for_steps", type=int, default=15000,
                    help="Training-set size the checkpoint was trained on "
                         "(fixes steps_per_epoch for restore)")
    ap.add_argument("--fid_sample_size", type=int, default=10000)
    ap.add_argument("--attempts", type=int, default=10)
    ap.add_argument("--temperatures", nargs="+", type=float,
                    default=[0.6, 0.8, 1.0])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import dataclasses

    import jax

    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from nvae_tpu.data import make_iterators, synthetic_dataset
    from nvae_tpu.eval.evaluate import evaluate_model
    from nvae_tpu.presets import get_preset
    from nvae_tpu.train.trainer import Trainer

    log(f"devices: {jax.devices()}")
    model_cfg, train_cfg = get_preset(args.preset)
    steps_per_epoch = args.n_train_for_steps // args.batch_size
    train_cfg = dataclasses.replace(
        train_cfg,
        batch_size=args.batch_size,
        model_save_dir=args.ckpt,
        sample_frequency=10**9, evaluate_frequency=10**9,
        model_save_frequency=10**9,
    )
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch)
    start_epoch = trainer.maybe_resume()
    if start_epoch == 0:
        log("WARNING: no checkpoint restored — timing an untrained model "
            "(wall-clock is architecture-bound, still representative)")
    else:
        log(f"restored checkpoint at epoch {start_epoch}")

    bundle = synthetic_dataset(n_train=args.batch_size, n_test=args.n_test)
    _, test_iter = make_iterators(bundle, args.batch_size)
    n_test = args.n_test // args.batch_size * args.batch_size

    t0 = time.time()
    evaluation = evaluate_model(
        trainer, test_iter,
        batch_size=args.batch_size,
        n_attempts=args.attempts,
        temperatures=tuple(args.temperatures),
        fid_sample_size=args.fid_sample_size,
        feature_backbone="vgg16",
        fid_backbone="inception",
    )
    wall = time.time() - t0
    log(f"full protocol: {wall:.1f}s "
        f"({len(args.temperatures)} T x {args.attempts} attempts, "
        f"FID {args.fid_sample_size}, IWAE-10 NLL over {n_test})")
    for m in evaluation.sample_metrics:
        log(f"  T={m.temperature}: fid={m.fid:.2f} p={m.precision} "
            f"r={m.recall} ppl={m.ppl}")
    log(f"  nll: {evaluation.nll}")

    # Reference protocol cost: >10 h P&R + ~5 h PPL (PDF §4.1.2) before
    # FID/NLL — call it >=15 h = 54,000 s.
    result = {
        "metric": "full_eval_protocol_wall",
        "value": round(wall, 1),
        "unit": "seconds",
        "vs_baseline": round(54000.0 / wall, 1),
        "n_test": n_test,
        "fid_sample_size": args.fid_sample_size,
        "attempts": args.attempts,
        "temperatures": args.temperatures,
        "checkpoint_epoch": start_epoch,
        "backbone_weights": evaluation.feature_backbone_weights,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {**result, "evaluation": evaluation.to_dict()}, f, indent=2
            )


if __name__ == "__main__":
    main()
