#!/usr/bin/env python
"""Capture + analyze an xplane trace of the jitted NVAE train step.

Usage:
  python tools/profile_step.py capture [--outdir /tmp/xprof] [--steps 8] \
      [--compute_dtype float32] [--postprocess_depthwise] [--use_pallas]
  python tools/profile_step.py analyze [--outdir /tmp/xprof] [--top 40]

``capture`` runs the default 40M-param MNIST config train step on whatever
jax.devices() provides and writes a jax.profiler trace.  ``analyze`` parses the
xplane.pb directly (tensorflow.core.profiler xplane proto) and prints per-op
and per-category device-time attribution — the breakdown that backs PROFILE.md.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import os as _os
import sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def capture(args):
    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    log(f"devices: {jax.devices()}")
    model_cfg = ModelConfig(
        compute_dtype=args.compute_dtype,
        bn_apply_dtype=args.bn_apply_dtype,
        postprocess_5x5_depthwise=args.postprocess_depthwise,
        use_pallas_kernels=args.use_pallas,
    )
    train_cfg = TrainConfig(batch_size=args.batch_size, step_based_warmup=True)
    total_steps = 400 * (60000 // args.batch_size)
    t0 = time.time()
    model, state, tx = create_train_state(model_cfg, train_cfg, total_steps)
    log(f"init: {time.time() - t0:.1f}s")
    step_fn = make_train_step(
        model, tx, train_cfg, total_steps,
        steps_per_epoch=60000 // args.batch_size, donate=False,
    )
    rng = jax.random.PRNGKey(0)
    batch = (jax.random.uniform(rng, (args.batch_size, 32, 32, 1)) > 0.7).astype(
        jnp.float32
    )
    t0 = time.time()
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    log(f"compile+warmup: {time.time() - t0:.1f}s")

    t0 = time.time()
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch)
        float(metrics["loss"])
    dt = time.time() - t0
    log(f"traced {args.steps} steps in {dt:.2f}s "
        f"({dt / args.steps * 1e3:.1f} ms/step incl. host)")
    log(f"trace dir: {args.outdir}")


def _find_xplane(outdir):
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    return paths[-1]


def _md_stats(md, stat_meta):
    out = {}
    for s in md.stats:
        nm = stat_meta[s.metadata_id].name
        out[nm] = (
            s.str_value if s.str_value
            else (s.int64_value or s.uint64_value or s.double_value)
        )
    return out


def _module_key(tf_op: str, depth: int) -> str:
    """Collapse a jit(step_fn)/transpose(...)/.../Module_0/... scope path to a
    coarse model-region key at the given depth, tagging backward-pass ops."""
    if not tf_op:
        return "?"
    parts = tf_op.split("/")
    bwd = any(p.startswith("transpose") for p in parts)
    # Drop jit(...) / transpose(...) / vjp wrappers and param names.
    keep = [p for p in parts
            if not (p.startswith("jit(") or p.startswith("transpose(")
                    or p == "jvp(step_fn)" or not p)]
    keep = keep[:depth]
    tag = " [bwd]" if bwd else ""
    return "/".join(keep) + tag if keep else "?" + tag


def analyze(args):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = _find_xplane(args.outdir)
    log(f"parsing {path}")
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    plane = next(p for p in space.planes if p.name == "/device:TPU:0")
    ev_meta = plane.event_metadata
    stat_meta = plane.stat_metadata

    mods = next((l for l in plane.lines if l.name == "XLA Modules"), None)
    n_steps = len(mods.events) if mods else 1
    if mods:
        tot = sum(e.duration_ps for e in mods.events)
        print(f"XLA module time: {tot / 1e9:.1f} ms over {n_steps} runs "
              f"= {tot / 1e9 / n_steps:.2f} ms/step")

    line = next(l for l in plane.lines if l.name == "XLA Ops")
    by_cat = collections.Counter()
    flops_by_cat = collections.Counter()
    bytes_by_cat = collections.Counter()
    by_mod = collections.Counter()
    by_op = collections.Counter()
    op_info = {}
    md_cache = {}
    total_ps = 0
    for e in line.events:
        mid = e.metadata_id
        if mid not in md_cache:
            md = ev_meta[mid]
            st = _md_stats(md, stat_meta)
            md_cache[mid] = (
                st.get("hlo_category", "?"),
                _module_key(str(st.get("tf_op", "")), args.depth),
                md.display_name or md.name,
                int(st.get("flops", 0) or 0),
                int(st.get("bytes_accessed", 0) or 0),
                str(st.get("tf_op", "")),
                str(st.get("source", "")),
            )
        cat, mod, disp, flops, nbytes, tf_op, src = md_cache[mid]
        d = e.duration_ps
        total_ps += d
        by_cat[cat] += d
        flops_by_cat[cat] += flops
        bytes_by_cat[cat] += nbytes
        by_mod[mod] += d
        by_op[mid] += d
        op_info[mid] = (disp, cat, tf_op, src, flops, nbytes)

    ms = 1e9 * n_steps  # ps -> ms/step
    print(f"\nTotal op time: {total_ps / ms:.2f} ms/step "
          f"({len(line.events)} events)")
    print(f"\n== by hlo_category (ms/step | TFLOP/s | GB/s) ==")
    for cat, ps in by_cat.most_common(30):
        t_s = ps / 1e12  # total seconds across all traced steps
        fl = flops_by_cat[cat] / max(t_s, 1e-12) / 1e12
        bw = bytes_by_cat[cat] / max(t_s, 1e-12) / 1e9
        print(f"  {ps / ms:8.3f} ms  {100 * ps / total_ps:5.1f}%  "
              f"{fl:8.2f} TF/s  {bw:8.1f} GB/s  {cat}")

    print(f"\n== by model region (depth {args.depth}) ==")
    for mod, ps in by_mod.most_common(args.top):
        print(f"  {ps / ms:8.3f} ms  {100 * ps / total_ps:5.1f}%  {mod}")

    print(f"\n== top individual ops ==")
    for mid, ps in by_op.most_common(args.top):
        disp, cat, tf_op, src, flops, nbytes = op_info[mid]
        t_s = ps / 1e12 / n_steps  # per-step seconds; nbytes is per-occurrence
        bw = nbytes / max(t_s, 1e-12) / 1e9
        print(f"  {ps / ms:8.3f} ms  {bw:7.0f} GB/s [{cat[:14]:14s}] "
              f"{disp[:40]:40s} {tf_op[-70:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["capture", "analyze"])
    ap.add_argument("--outdir", default="/tmp/xprof")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=144)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--bn_apply_dtype", default="float32")
    ap.add_argument("--postprocess_depthwise", action="store_true")
    ap.add_argument("--use_pallas", action="store_true")
    args = ap.parse_args()
    if args.cmd == "capture":
        capture(args)
    else:
        analyze(args)


if __name__ == "__main__":
    main()
