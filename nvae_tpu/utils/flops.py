"""Analytic FLOP counting for MFU reporting.

Counts 2 x MAC for every convolution and matmul in a traced function by
walking its jaxpr — the "count MACs x 2 per conv from the shape trace"
derivation (VERDICT r3 #2) done mechanically from ``ModelConfig`` via the
model's own trace, so it stays exact under every config switch (depthwise
postprocess, DML head, grad accumulation, remat) and covers the backward
pass for free (grad-of-conv traces as more convs).

Only MXU ops (conv_general_dilated / dot_general) are counted: MFU is a
systolic-array utilization metric, and the elementwise/VPU work in this
model is a rounding error next to the convs (PROFILE.md finding 1).

Peak figures: one TPU v5e chip sustains 197 TFLOP/s in bf16 and 98.5
TFLOP/s in fp32-accumulated bf16x3 (the HIGHEST-precision MXU mode).
``bench.py`` reports MFU against ``PEAK_FLOPS_BF16`` for every config —
a deliberately conservative denominator for fp32 runs (their true ceiling
is lower, so real utilization is higher than printed).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.extend.core  # noqa: F401  (ClosedJaxpr/Jaxpr live here)

# One TPU v5e chip (Google spec: 197 TOPS bf16, 394 TOPS int8).
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_FP32 = 98.5e12  # bf16x3 fp32-accumulate passes (approximate)
# One TPU v5e chip HBM bandwidth (Google spec: 819 GB/s).
PEAK_HBM_BYTES_PER_S = 819e9


def _prod(xs) -> int:
    return int(math.prod(int(x) for x in xs))


def _eqn_flops(eqn) -> int:
    """MXU flops of one jaxpr equation (0 for non-conv/dot primitives)."""
    name = eqn.primitive.name
    if name == "conv_general_dilated":
        out_shape = eqn.outvars[0].aval.shape
        rhs_shape = eqn.invars[1].aval.shape
        dn = eqn.params["dimension_numbers"]
        # rhs_spec = (out_feature, in_feature_per_group, *spatial): the
        # in-feature dim of the kernel is already C_in / feature_groups,
        # so grouped/depthwise convs count correctly with no special case.
        cin_per_group = rhs_shape[dn.rhs_spec[1]]
        k_spatial = _prod(rhs_shape[d] for d in dn.rhs_spec[2:])
        return 2 * _prod(out_shape) * cin_per_group * k_spatial
    if name == "dot_general":
        (lhs_contract, _), _ = eqn.params["dimension_numbers"]
        lhs_shape = eqn.invars[0].aval.shape
        out_shape = eqn.outvars[0].aval.shape
        k = _prod(lhs_shape[d] for d in lhs_contract)
        return 2 * _prod(out_shape) * k
    return 0


def _jaxpr_flops(jaxpr) -> int:
    """Recursive flop count: scan bodies multiply by trip count; pjit /
    remat / custom-vjp / cond bodies recurse once (cond takes the max
    branch — both branches trace, one runs)."""
    total = 0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        name = eqn.primitive.name
        if name == "scan":
            length = int(eqn.params["length"])
            total += length * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # Trip count is dynamic; count one body iteration (the model
            # uses no while loops on the hot path).
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(
                (_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]),
                default=0,
            )
        else:
            for v in eqn.params.values():
                total += _sub_jaxpr_flops(v)
    return total


def _sub_jaxpr_flops(v: Any) -> int:
    """Recurse into any ClosedJaxpr/Jaxpr hiding in an eqn param (pjit's
    ``jaxpr``, custom_vjp's ``call_jaxpr``/``fun_jaxpr``, remat bodies)."""
    if isinstance(v, jax.extend.core.ClosedJaxpr):
        return _jaxpr_flops(v.jaxpr)
    if isinstance(v, jax.extend.core.Jaxpr):
        return _jaxpr_flops(v)
    if isinstance(v, (tuple, list)):
        return sum(_sub_jaxpr_flops(x) for x in v)
    return 0


def traced_flops(fn, *args, **kwargs) -> int:
    """Total MXU flops (2 x MAC of every conv/matmul, backward included if
    ``fn`` contains grads) of one call of ``fn`` on these arguments —
    derived purely from traced shapes; nothing is compiled or executed."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.result_type(x)),
        tree,
    )


def _aval_bytes(var) -> int:
    aval = var.aval
    try:
        return _prod(aval.shape) * aval.dtype.itemsize
    except (AttributeError, TypeError):
        return 0


def _eqn_bytes(eqn) -> int:
    """HBM bytes of one jaxpr equation under the roofline fusion model:
    only MXU ops (conv/dot) touch HBM — each reads its operands and writes
    its result.  Elementwise chains between convs are assumed fully fused
    into the producing/consuming conv (what XLA does on this model,
    PROFILE.md finding 4), so they add no traffic of their own."""
    if eqn.primitive.name in ("conv_general_dilated", "dot_general"):
        return sum(_aval_bytes(v) for v in eqn.invars) + sum(
            _aval_bytes(v) for v in eqn.outvars
        )
    return 0


def _jaxpr_bytes(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        total += _eqn_bytes(eqn)
        name = eqn.primitive.name
        if name == "scan":
            total += int(eqn.params["length"]) * _jaxpr_bytes(
                eqn.params["jaxpr"].jaxpr
            )
        elif name == "while":
            total += _jaxpr_bytes(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(
                (_jaxpr_bytes(b.jaxpr) for b in eqn.params["branches"]),
                default=0,
            )
        else:
            for v in eqn.params.values():
                total += _sub_jaxpr_bytes(v)
    return total


def _sub_jaxpr_bytes(v: Any) -> int:
    if isinstance(v, jax.extend.core.ClosedJaxpr):
        return _jaxpr_bytes(v.jaxpr)
    if isinstance(v, jax.extend.core.Jaxpr):
        return _jaxpr_bytes(v)
    if isinstance(v, (tuple, list)):
        return sum(_sub_jaxpr_bytes(x) for x in v)
    return 0


def tree_bytes(tree) -> int:
    """Total storage bytes of a pytree of arrays/ShapeDtypeStructs."""
    import numpy as np

    return sum(
        _prod(jax.numpy.shape(x))
        * np.dtype(jax.numpy.result_type(x)).itemsize
        for x in jax.tree.leaves(tree)
    )


def traced_mxu_bytes(fn, *args, **kwargs) -> int:
    """Analytic HBM traffic of the conv/matmul ops in one call of ``fn``
    (operands + results, fused-elementwise model; see ``_eqn_bytes``)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_bytes(closed.jaxpr)


def compiled_bytes_accessed(fn, *args) -> float:
    """XLA's own post-fusion 'bytes accessed' of the compiled program —
    the authoritative HBM-traffic estimate when the backend reports it
    (returns 0.0 when it doesn't, e.g. some experimental backends)."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return float(cost.get("bytes accessed", 0.0))
    except Exception:
        return 0.0


def train_step_bytes(
    model, tx, train_cfg, state, batch_size: int,
    total_steps: int = 100, steps_per_epoch: int = 100,
) -> int:
    """Analytic HBM bytes of ONE training step: conv/dot operand+result
    traffic from the traced jaxpr, plus the optimizer's state sweep (every
    step reads and writes params + opt-state + batch-stats once — all
    elementwise, so invisible to the MXU walk).  Companion to
    :func:`train_step_flops`; ``bench.py`` divides by measured step time
    and ``PEAK_HBM_BYTES_PER_S`` to report bandwidth utilization
    (VERDICT r4 #2)."""
    from nvae_tpu.train.step import make_train_step

    step = make_train_step(
        model, tx, train_cfg, total_steps=total_steps,
        steps_per_epoch=steps_per_epoch, donate=False,
    )
    cfg = model.cfg
    batch = jax.ShapeDtypeStruct(
        (batch_size, cfg.image_size, cfg.image_size, cfg.in_channels),
        jax.numpy.float32,
    )
    mxu = traced_mxu_bytes(
        lambda s, b: step(s, b), _abstract(state), batch
    )
    sweep = 2 * (
        tree_bytes(state.params)
        + tree_bytes(state.opt_state)
        + tree_bytes(state.batch_stats)
    )
    return mxu + sweep


def train_step_flops(
    model, tx, train_cfg, state, batch_size: int,
    total_steps: int = 100, steps_per_epoch: int = 100,
) -> int:
    """Analytic MXU flops of ONE training step (fwd + bwd + optimizer
    update) at this model/optimizer/config, traced shape-only from the
    caller's already-built ``state`` (abstracted to ShapeDtypeStructs —
    nothing is executed)."""
    from nvae_tpu.train.step import make_train_step

    step = make_train_step(
        model, tx, train_cfg, total_steps=total_steps,
        steps_per_epoch=steps_per_epoch, donate=False,
    )
    cfg = model.cfg
    batch = jax.ShapeDtypeStruct(
        (batch_size, cfg.image_size, cfg.image_size, cfg.in_channels),
        jax.numpy.float32,
    )
    return traced_flops(lambda s, b: step(s, b), _abstract(state), batch)
