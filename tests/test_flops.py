"""Analytic FLOP counter tests (utils/flops.py — the MFU numerator).

Closed-form cases pin the MAC x 2 arithmetic for convs (grouped/depthwise
included), matmuls, and scan multiplicity; the cross-check test bounds the
counter against XLA's own HLO cost analysis on a small model forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.utils.flops import traced_flops


def test_conv_flops_closed_form():
    # NHWC 2x8x8x4 * HWIO 3x3x4x16, SAME -> out 2x8x8x16.
    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 16))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    got = traced_flops(f, x, w)
    want = 2 * (2 * 8 * 8 * 16) * 4 * 9  # 2 * prod(out) * cin * k
    assert got == want


def test_depthwise_conv_counts_per_group():
    # feature_group_count = C: kernel in-dim is 1, so MACs drop by C.
    x = jnp.zeros((2, 8, 8, 16))
    w = jnp.zeros((5, 5, 1, 16))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )

    got = traced_flops(f, x, w)
    want = 2 * (2 * 8 * 8 * 16) * 1 * 25
    assert got == want


def test_dot_general_flops():
    a = jnp.zeros((32, 64))
    b = jnp.zeros((64, 128))
    got = traced_flops(lambda a, b: a @ b, a, b)
    assert got == 2 * 32 * 128 * 64


def test_scan_multiplies_by_length():
    a = jnp.zeros((8, 16, 16))  # 8 scan steps of a 16x16 matmul
    w = jnp.zeros((16, 16))

    def f(a, w):
        def body(c, x):
            return c, x @ w

        _, ys = jax.lax.scan(body, 0.0, a)
        return ys

    got = traced_flops(f, a, w)
    assert got == 8 * 2 * 16 * 16 * 16


def test_backward_pass_counted():
    # grad of a matmul traces two more matmuls: ~3x the forward flops.
    a = jnp.zeros((32, 64))
    w = jnp.zeros((64, 16))
    fwd = traced_flops(lambda a, w: (a @ w).sum(), a, w)

    def loss(w, a):
        return (a @ w).sum()

    both = traced_flops(lambda w, a: jax.grad(loss)(w, a), w, a)
    assert both >= 2 * fwd  # dL/dw (a^T @ ones) + recompute-free fwd


def test_model_step_flops_against_xla_cost_analysis():
    """The analytic count must bracket XLA's own HLO flop analysis of the
    same program: ours counts conv/dot only, XLA adds elementwise — so
    analytic <= XLA <= ~1.35 x analytic on this conv-dominated model."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.utils.flops import train_step_flops

    model_cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    train_cfg = TrainConfig(epochs=1, batch_size=8, step_based_warmup=True)
    model, state, tx = create_train_state(
        model_cfg, train_cfg, total_steps=4
    )
    analytic = train_step_flops(model, tx, train_cfg, state, batch_size=8)
    assert analytic > 1e8  # a real model step is >100 MFLOP even tiny

    # XLA cost analysis of the identical (donate-free) step program.
    from nvae_tpu.train.step import make_train_step

    step = make_train_step(
        model, tx, train_cfg, total_steps=4, steps_per_epoch=4,
        donate=False,
    )
    batch = jnp.zeros((8, 32, 32, 1), jnp.float32)
    cost = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile(
    ).cost_analysis()
    xla_flops = float(cost.get("flops", 0.0))
    if xla_flops <= 0:
        pytest.skip("backend reports no flops in cost_analysis")
    assert analytic <= xla_flops * 1.05, (
        f"analytic {analytic:.3e} exceeds XLA {xla_flops:.3e}"
    )
    assert xla_flops <= analytic * 1.35, (
        f"XLA {xla_flops:.3e} far above analytic {analytic:.3e} — "
        f"elementwise should be a rounding error on this model"
    )


def test_conv_bytes_closed_form():
    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 16))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    from nvae_tpu.utils.flops import traced_mxu_bytes

    got = traced_mxu_bytes(f, x, w)
    want = 4 * (2 * 8 * 8 * 4 + 3 * 3 * 4 * 16 + 2 * 8 * 8 * 16)
    assert got == want


def test_bytes_respect_dtype():
    a = jnp.zeros((32, 64), jnp.bfloat16)
    b = jnp.zeros((64, 128), jnp.bfloat16)
    from nvae_tpu.utils.flops import traced_mxu_bytes

    got = traced_mxu_bytes(lambda a, b: a @ b, a, b)
    assert got == 2 * (32 * 64 + 64 * 128 + 32 * 128)


def test_model_step_bytes_against_xla_cost_analysis():
    """The analytic HBM model is a deliberate LOWER bound: it assumes
    every elementwise chain fuses into a neighboring conv (the XLA:TPU
    behavior this roofline targets, PROFILE.md finding 4), so it must
    never exceed XLA's own 'bytes accessed' of the same (scan-free) step
    program, and it must at least cover the optimizer state sweep.  The
    upper side has no tight bracket — XLA's cost analysis charges
    elementwise ops that fusion folds away (measured ratio 0.09 at 8ch ->
    0.33 at 48ch, rising with width as convs dominate), and on scanned
    programs it counts the loop body ONCE, so ``bench.py`` reports this
    analytic model as the roofline number and logs XLA's figure as a
    diagnostic."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step
    from nvae_tpu.utils.flops import train_step_bytes, tree_bytes

    model_cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    train_cfg = TrainConfig(epochs=1, batch_size=8, step_based_warmup=True)
    model, state, tx = create_train_state(
        model_cfg, train_cfg, total_steps=4
    )
    analytic = train_step_bytes(model, tx, train_cfg, state, batch_size=8)
    floor = 2 * (
        tree_bytes(state.params)
        + tree_bytes(state.opt_state)
        + tree_bytes(state.batch_stats)
    )
    assert analytic > floor  # conv traffic on top of the state sweep
    assert analytic > 1e6  # a real step moves megabytes even tiny

    step = make_train_step(
        model, tx, train_cfg, total_steps=4, steps_per_epoch=4,
        donate=False,
    )
    batch = jnp.zeros((8, 32, 32, 1), jnp.float32)
    cost = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile(
    ).cost_analysis()
    xla_bytes = float(cost.get("bytes accessed", 0.0))
    if xla_bytes <= 0:
        pytest.skip("backend reports no bytes accessed in cost_analysis")
    assert analytic <= xla_bytes, (
        f"analytic {analytic:.3e} exceeds XLA {xla_bytes:.3e} — the fused "
        f"lower bound overcounted"
    )
