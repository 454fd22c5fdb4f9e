#!/usr/bin/env python
"""Full training run of the bit-parity configuration (VERDICT.md #9).

Trains the ``mnist_step_sn_parity`` preset — per-forward spectral
normalization (TFA semantics, reference ``common.py:41``) + the reference's
>0-threshold binarization (``datasets.py:13-15``) + step-based KL warm-up —
for a meaningful epoch count, tracking *held-out* ELBO pieces and IWAE-K NLL
(reference ``evaluate.py:111-123``) along the way.  Demonstrates the parity
configuration trains stably end-to-end, not merely that it compiles.

No network egress in this environment, so the dataset is ``synthetic``
(MNIST-shaped stroke blobs) unless a local MNIST file is available via
--data_dir / $NVAE_TPU_DATA.

Writes ``<out>/curves.json`` and prints a markdown table for the README.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os as _os
import sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--dataset", type=str, default="synthetic")
    ap.add_argument("--data_dir", type=str, default="")
    ap.add_argument("--eval_every", type=int, default=5)
    ap.add_argument("--nll_attempts", type=int, default=10)
    ap.add_argument("--nll_batches", type=int, default=4)
    ap.add_argument("--out", type=str, default="results/parity_run")
    ap.add_argument("--batch_size", type=int, default=144)
    ap.add_argument("--n_train", type=int, default=15000,
                    help="synthetic dataset size (ignored for file datasets)")
    ap.add_argument("--perf", action="store_true",
                    help="Train the BEST-PERF configuration instead of the "
                         "bit-parity one: mnist_step_sn (projection SN, "
                         "proper binarization) + depthwise postprocess + "
                         "bf16 compute + bf16 BN apply — the 43x bench "
                         "config, demonstrated as a real training run")
    args = ap.parse_args()

    import jax
    import numpy as np

    from nvae_tpu.data import load_dataset, make_iterators
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from nvae_tpu.eval.nll import neg_log_likelihood
    from nvae_tpu.presets import get_preset
    from nvae_tpu.train.trainer import Trainer
    from nvae_tpu.utils.logging import MetricsLogger

    os.makedirs(args.out, exist_ok=True)
    preset = "mnist_step_sn" if args.perf else "mnist_step_sn_parity"
    model_cfg, train_cfg = get_preset(preset)
    if args.perf:
        model_cfg = dataclasses.replace(
            model_cfg,
            postprocess_5x5_depthwise=True,
            compute_dtype="bfloat16",
            bn_apply_dtype="bfloat16",
        )
    train_cfg = dataclasses.replace(
        train_cfg,
        dataset=args.dataset,
        epochs=args.epochs,
        batch_size=args.batch_size,
        scan_epochs=True,
        sample_frequency=10**9,       # no image dumps in this run
        evaluate_frequency=10**9,     # NLL handled below instead
        model_save_frequency=10**9,   # final checkpoint only
        model_save_dir=os.path.join(args.out, "ckpt"),
        tensorboard_log_dir=os.path.join(args.out, "logs"),
        data_dir=args.data_dir,
    )
    log(f"devices: {jax.devices()}")
    log(f"model: {model_cfg}")
    log(f"train: {train_cfg}")

    if args.dataset == "synthetic":
        from nvae_tpu.data import synthetic_dataset

        bundle = synthetic_dataset(n_train=args.n_train, n_test=1440)
    else:
        bundle = load_dataset(args.dataset, args.data_dir)
    train_iter, test_iter = make_iterators(
        bundle, args.batch_size, binarize=train_cfg.binary,
        parity_binarize_255=train_cfg.parity_binarize_255,
        seed=train_cfg.seed,
    )
    logger = MetricsLogger(train_cfg.tensorboard_log_dir)
    trainer = Trainer(
        model_cfg, train_cfg, train_iter.batches_per_epoch, logger=logger
    )

    from nvae_tpu.train.step import make_eval_step

    eval_fn = make_eval_step(trainer.model, train_cfg)
    curves = []

    def held_out(epoch):
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
            **({"spectral": trainer.state.spectral}
               if trainer.state.spectral else {}),
        }
        test_batches = []
        for i, b in enumerate(test_iter.epoch(0)):
            if i >= args.nll_batches:
                break
            test_batches.append(b)
        em = eval_fn(
            trainer.state, test_batches[0],
            jax.random.fold_in(trainer.state.rng, 997 + epoch),
        )
        elbo = {k: float(np.asarray(v)) for k, v in em.items()}
        t0 = time.time()
        nll_mean, nll_std = neg_log_likelihood(
            trainer.model, variables, test_batches,
            jax.random.fold_in(jax.random.PRNGKey(31), epoch),
            n_attempts=args.nll_attempts,
        )
        log(f"  [epoch {epoch}] held-out ELBO={elbo.get('elbo', float('nan')):.2f} "
            f"IWAE-{args.nll_attempts} NLL={nll_mean:.2f}±{nll_std:.2f} "
            f"({time.time() - t0:.0f}s)")
        return {"epoch": epoch, "nll": nll_mean, "nll_std": nll_std, **elbo}

    def on_epoch_end(epoch, tr, means):
        log(f"epoch {epoch}: loss={means['loss']:.2f} "
            f"recon={means.get('reconstruction_loss', float('nan')):.2f} "
            f"kl={means.get('kl_loss', float('nan')):.2f} "
            f"{means['images_per_sec']:.0f} img/s")
        if epoch % args.eval_every == 0 or epoch == args.epochs - 1:
            curves.append(held_out(epoch))
            with open(os.path.join(args.out, "curves.json"), "w") as f:
                json.dump({"curves": curves, "history_len": epoch + 1}, f,
                          indent=2)

    t0 = time.time()
    result = trainer.fit(train_iter, test_iter, on_epoch_end=on_epoch_end)
    wall = time.time() - t0
    hist = result.history
    with open(os.path.join(args.out, "curves.json"), "w") as f:
        json.dump(
            {
                "curves": curves,
                "history": hist,
                "wall_seconds": wall,
                "config": preset + ("+perf" if args.perf else ""),
                "dataset": args.dataset,
            },
            f, indent=2,
        )

    # Markdown table for the README.
    print("\n| epoch | train loss | train recon | train KL | held-out ELBO "
          f"| held-out IWAE-{args.nll_attempts} NLL |")
    print("|---|---|---|---|---|---|")
    for c in curves:
        e = c["epoch"]
        h = hist[e] if e < len(hist) else {}
        print(f"| {e} | {h.get('loss', float('nan')):.1f} "
              f"| {h.get('reconstruction_loss', float('nan')):.1f} "
              f"| {h.get('kl_loss', float('nan')):.1f} "
              f"| {c.get('elbo', float('nan')):.1f} "
              f"| {c['nll']:.1f} ± {c['nll_std']:.1f} |")
    log(f"total wall: {wall:.0f}s for {args.epochs} epochs "
        f"({result.best_loss:.2f} best train loss)")


if __name__ == "__main__":
    main()
