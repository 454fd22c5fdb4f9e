#!/usr/bin/env python
"""One-command reproduction of the reference's headline MNIST numbers
(VERDICT r2 item 3): train the chosen variant for the reference's 400
epochs, run BOTH the corrected and the bug-for-bug (``--eval_parity``)
evaluation protocols, and print a comparison table against BASELINE.md
(reference ``README.md:29-42``).

The absolute numbers are only comparable when two local artifacts exist
(this environment has no network egress):

- real MNIST:   ``--data_dir`` containing ``mnist.npz`` (or IDX files);
- real backbone weights: ``$NVAE_TPU_WEIGHTS`` (or ``--weights_dir``)
  containing ``inception_v3.npz`` + ``vgg16.npz`` from
  ``tools/convert_backbone_weights.py``.

With those in place the full run is:

  python tools/reproduce_baseline.py --data_dir /path/to/mnist \
      --weights_dir /path/to/backbones

Everything else is defaulted to the reference protocol: 400 epochs, batch
144, step-based KL warm-up, forward (per-call) spectral normalization, the
reference's >0-threshold binarization, IWAE-10 NLL / FID-10k at T=1.0 /
P&R / PPL per ``evaluate.py:48-123``.

Smoke mode (CI-level, no data needed):

  python tools/reproduce_baseline.py --debug --dataset synthetic
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Reference numbers per variant (BASELINE.md / reference README.md:29-42).
BASELINE = {
    "step_sn": {
        "nll": (87.06, 2.18), "fid": 8.87,
        "precision": (0.8950, 0.0999), "recall": (0.9227, 0.0879),
        "ppl": (7.351e6, 6.31e5), "train_hours": 49.0,
    },
    "step_sr": {
        "nll": (80.33, 2.01), "fid": 30.37,
        "precision": (0.8559, 0.0608), "recall": (0.8803, 0.0546),
        "ppl": (7.391e6, 5.88e5), "train_hours": 104.0,
    },
    "epoch_sn": {
        "nll": (98.92, 1.83), "fid": 20.85,
        "precision": (0.7541, 0.152), "recall": (0.8828, 0.114),
        "ppl": (6.602e6, 5.30e5), "train_hours": 71.0,
    },
}

PRESET = {
    "step_sn": "mnist_step_sn_parity",  # forward SN + parity binarization
    "step_sr": "mnist_step_sr",
    "epoch_sn": "mnist_epoch_sn",
}


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--variant", choices=sorted(BASELINE), default="step_sn")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=144)
    ap.add_argument("--dataset", type=str, default="mnist")
    ap.add_argument("--data_dir", type=str, default="")
    ap.add_argument("--weights_dir", type=str, default="",
                    help="Directory with inception_v3.npz / vgg16.npz "
                         "(sets $NVAE_TPU_WEIGHTS)")
    ap.add_argument("--out", type=str, default="results/reproduce_baseline")
    ap.add_argument("--eval_attempts", type=int, default=10)
    ap.add_argument("--fid_sample_size", type=int, default=10000)
    ap.add_argument("--debug", action="store_true",
                    help="Smoke mode: 2 epochs, 4 batches, tiny eval, "
                         "random_conv backbones")
    ap.add_argument("--tiny_model", action="store_true",
                    help="Swap the preset's architecture for the tiny debug "
                         "config (same spectral mode) — pipeline-rehearsal "
                         "only, numbers are meaningless "
                         "(tests/test_reproduce_baseline.py runs the whole "
                         "tool this way in the CI quick tier)")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    if args.weights_dir:
        os.environ["NVAE_TPU_WEIGHTS"] = args.weights_dir
    have_weights = all(
        os.path.exists(
            os.path.join(os.environ.get("NVAE_TPU_WEIGHTS", ""), f)
        )
        for f in ("inception_v3.npz", "vgg16.npz")
    )
    if not have_weights:
        log(
            "WARNING: no converted backbone weights found "
            "($NVAE_TPU_WEIGHTS/{inception_v3,vgg16}.npz) — FID/P&R/PPL "
            "will use fixed-seed random backbones and are NOT comparable "
            "to the reference's absolute numbers."
        )

    import jax

    # Plugin sitecustomize files (axon) force jax_platforms at import and
    # silently override the JAX_PLATFORMS env var — re-assert it (same fix
    # as __graft_entry__._honor_env_platform) so CI smokes really run on CPU.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    import numpy as np

    from nvae_tpu.data import load_dataset, make_iterators, synthetic_dataset
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from nvae_tpu.eval.evaluate import evaluate_model
    from nvae_tpu.presets import get_preset
    from nvae_tpu.train.trainer import Trainer
    from nvae_tpu.utils.logging import MetricsLogger

    os.makedirs(args.out, exist_ok=True)
    model_cfg, train_cfg = get_preset(PRESET[args.variant])
    if args.tiny_model:
        from nvae_tpu.config import debug_config

        model_cfg = debug_config(spectral_mode=model_cfg.spectral_mode)
    epochs = 2 if args.debug else args.epochs
    train_cfg = dataclasses.replace(
        train_cfg,
        dataset=args.dataset,
        epochs=epochs,
        batch_size=args.batch_size,
        seed=args.seed,
        debug=args.debug,
        scan_epochs=not args.debug,
        sample_frequency=10**9,
        evaluate_frequency=10**9,
        model_save_frequency=10**9,
        model_save_dir=os.path.join(args.out, "ckpt"),
        tensorboard_log_dir=os.path.join(args.out, "logs"),
        data_dir=args.data_dir,
    )
    log(f"devices: {jax.devices()}")
    log(f"variant {args.variant} -> preset {PRESET[args.variant]}, "
        f"{epochs} epochs, dataset {args.dataset}")

    if args.dataset == "synthetic":
        bundle = synthetic_dataset(
            n_train=576 if args.debug else 15000, n_test=288
        )
    else:
        bundle = load_dataset(args.dataset, args.data_dir)
    train_iter, test_iter = make_iterators(
        bundle, args.batch_size,
        binarize=train_cfg.binary,
        parity_binarize_255=train_cfg.parity_binarize_255,
        seed=train_cfg.seed,
        debug=args.debug,
    )
    logger = MetricsLogger(train_cfg.tensorboard_log_dir)
    trainer = Trainer(
        model_cfg, train_cfg, train_iter.batches_per_epoch, logger=logger
    )

    # ---- train (resumes from the final checkpoint if present) ------------
    t0 = time.time()
    result = trainer.fit(train_iter, test_iter)
    train_hours = (time.time() - t0) / 3600.0
    log(f"training: {train_hours:.2f} h, best loss {result.best_loss:.2f}")

    # ---- evaluate: corrected protocol, then bug-for-bug ------------------
    eval_kw = dict(
        batch_size=args.batch_size,
        n_attempts=1 if args.debug else args.eval_attempts,
        temperatures=(1.0,) if args.debug else (0.6, 0.8, 1.0),
        fid_sample_size=(
            args.batch_size if args.debug else args.fid_sample_size
        ),
        feature_backbone="random_conv" if args.debug else "vgg16",
        fid_backbone="random_conv" if args.debug else "inception",
    )
    log("corrected-protocol evaluation ...")
    corrected = evaluate_model(trainer, test_iter, **eval_kw)
    log("bug-for-bug (--eval_parity) evaluation ...")
    parity = evaluate_model(
        trainer, test_iter,
        pr_parity_accounting=True, pr_parity_orientation=True,
        parity_resize_299=True, parity_fid_uint8=True,
        parity_unit_input=True,
        **eval_kw,
    )
    for name, ev in (("corrected", corrected), ("parity", parity)):
        with open(os.path.join(args.out, f"evaluation_{name}.json"), "w") as f:
            json.dump(ev.to_dict(), f, indent=2)

    # ---- comparison table ------------------------------------------------
    ref = BASELINE[args.variant]
    # Reference table numbers are the T=1.0 row (FID "over 10,000 samples
    # at temperature 1.0", BASELINE.md).
    t1 = [m for m in parity.sample_metrics if m.temperature == 1.0]
    t1 = t1[0] if t1 else parity.sample_metrics[-1]
    t1c = [m for m in corrected.sample_metrics if m.temperature == 1.0]
    t1c = t1c[0] if t1c else corrected.sample_metrics[-1]

    rows = [
        ("NLL (nats)", f"{ref['nll'][0]:.2f} ± {ref['nll'][1]:.2f}",
         f"{parity.nll.mean:.2f} ± {parity.nll.stddev:.2f}",
         f"{corrected.nll.mean:.2f} ± {corrected.nll.stddev:.2f}"),
        ("FID (10k, T=1.0)", f"{ref['fid']:.2f}",
         f"{t1.fid:.2f}", f"{t1c.fid:.2f}"),
        ("Precision", f"{ref['precision'][0]:.4f} ± {ref['precision'][1]:.4f}",
         f"{t1.precision.mean:.4f} ± {t1.precision.stddev:.4f}",
         f"{t1c.precision.mean:.4f} ± {t1c.precision.stddev:.4f}"),
        ("Recall", f"{ref['recall'][0]:.4f} ± {ref['recall'][1]:.4f}",
         f"{t1.recall.mean:.4f} ± {t1.recall.stddev:.4f}",
         f"{t1c.recall.mean:.4f} ± {t1c.recall.stddev:.4f}"),
        ("PPL", f"{ref['ppl'][0]:.3g} ± {ref['ppl'][1]:.2g}",
         f"{t1.ppl.mean:.3g} ± {t1.ppl.stddev:.2g}",
         f"{t1c.ppl.mean:.3g} ± {t1c.ppl.stddev:.2g}"),
        ("Train wall (h)", f"{ref['train_hours']:.0f}",
         f"{train_hours:.2f}", "same run"),
    ]
    caveat = "" if (have_weights and args.dataset == "mnist") else (
        " (NOT comparable: "
        + ("random backbones" if not have_weights else "")
        + ("," if not have_weights and args.dataset != "mnist" else "")
        + (f" dataset={args.dataset}" if args.dataset != "mnist" else "")
        + ")"
    )
    print(f"\n## {args.variant} vs reference{caveat}\n")
    print("| Metric | Reference | Ours (bug-for-bug protocol) "
          "| Ours (corrected protocol) |")
    print("|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    print(
        f"\nArtifacts: {args.out}/evaluation_{{corrected,parity}}.json; "
        f"comparable={'yes' if have_weights and args.dataset == 'mnist' else 'no'}"
    )
    with open(os.path.join(args.out, "comparison.json"), "w") as f:
        json.dump(
            {
                "variant": args.variant,
                "comparable": have_weights and args.dataset == "mnist",
                "reference": ref,
                "train_hours": train_hours,
                "rows": rows,
            },
            f, indent=2,
        )
    logger.close()


if __name__ == "__main__":
    main()
