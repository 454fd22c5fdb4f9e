"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_batch_sharded_across_devices():
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = jnp.arange(n * 4 * 2, dtype=jnp.float32).reshape(n * 4, 2)
    sharded = shard_batch(batch, mesh)
    assert len(sharded.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(batch))


def test_global_reduction_over_sharded_batch():
    """A jitted global mean over a data-sharded batch equals the host value —
    XLA inserts the cross-device reduction (the framework's 'communication
    backend', SURVEY §2.7)."""
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = jax.random.normal(jax.random.PRNGKey(0), (n * 8, 16))
    sharded = shard_batch(batch, mesh)
    f = jax.jit(lambda x: jnp.mean(x * 2.0 + 1.0))
    np.testing.assert_allclose(
        float(f(sharded)), float(np.mean(np.asarray(batch) * 2 + 1)), rtol=1e-5
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))


def test_tp_param_sharding_selects_wide_kernels():
    from nvae_tpu.parallel import tp_param_sharding

    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "wide": {"sn_kernel": jnp.zeros((1, 1, 8, 64))},
        "narrow": {"sn_kernel": jnp.zeros((3, 3, 8, 8))},
        "bias": {"bias": jnp.zeros((64,))},
    }
    shardings = tp_param_sharding(params, mesh, min_features=64)
    assert "model" in str(shardings["wide"]["sn_kernel"].spec)
    assert "model" not in str(shardings["narrow"]["sn_kernel"].spec)
    assert "model" not in str(shardings["bias"]["bias"].spec)


def test_sharded_vs_unsharded_multistep_trajectory():
    """4 sharded DPxTP steps against 4 single-device steps with identical
    inputs/RNG: losses match per step, step-0 BN statistics match tightly,
    and final params stay within the Adamax update scale (sign noise on
    near-zero grads is the only legitimate divergence — see
    __graft_entry__.dryrun_multichip)."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_tp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices) // 2, n_model=2)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(epochs=1, batch_size=16, step_based_warmup=True)
    model, s0, tx = create_train_state(cfg, tc, total_steps=4)
    sharded = shard_state_tp(s0, mesh, min_features=48)
    single = jax.device_put(s0, devices[0])
    step = make_train_step(model, tx, tc, 4, 4, donate=False)

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    for i in range(4):
        batch = (
            jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i), (16, 32, 32, 1)
            )
            > 0.5
        ).astype(jnp.float32)
        sharded, ms = step(sharded, shard_batch(batch, mesh))
        single, mu = step(single, jax.device_put(batch, devices[0]))
        tol = 1e-6 if i == 0 else 2e-3
        np.testing.assert_allclose(
            float(ms["loss"]), float(mu["loss"]), rtol=tol
        )
        if i == 0:
            assert max_delta(sharded.batch_stats, single.batch_stats) < 1e-4

    lr = tc.learning_rate
    assert max_delta(sharded.params, single.params) < 3 * lr * 4
    assert max_delta(sharded.opt_state, single.opt_state) < 1.0


def test_sgd_lockstep_every_step_tight():
    """Sharded-vs-single trajectory with a LINEAR optimizer (SGD): no
    Adamax sign-noise, so every step's LOSS and GRAD NORM (both computed
    from the psum'd gradients/activations) must match to fp32
    reduction-order noise — a 0.1%-wrong collective produces a ~1e-3
    relative error at the first step it acts, against tolerances of
    1e-6/1e-5 on the early steps (VERDICT r2 #5; the collectives are
    optimizer-independent, so this is the tight complement of the
    Adamax-bounded test above).

    The lockstep lr is small (1e-5): at the training lr the raw-SGD
    trajectory is unstable on this loss (Adamax's per-coordinate
    normalization is what keeps real training bounded) and fp32 noise
    amplifies chaotically.  At 1e-5 the measured deltas stay at
    reduction-order level at every step (loss <=3e-7 rel, dparams
    <=1.2e-7, dBN <=6e-6), so the tolerances below are tight."""
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_tp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices) // 2, n_model=2)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(epochs=1, batch_size=16, step_based_warmup=True)
    model, s0, _ = create_train_state(cfg, tc, total_steps=4)
    tx = optax.sgd(1e-5)
    s0 = s0.replace(opt_state=tx.init(s0.params))
    sharded = shard_state_tp(s0, mesh, min_features=48)
    single = jax.device_put(s0, devices[0])
    step = make_train_step(model, tx, tc, 4, 4, donate=False)

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    for i in range(4):
        batch = (
            jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i), (16, 32, 32, 1)
            )
            > 0.5
        ).astype(jnp.float32)
        sharded, ms = step(sharded, shard_batch(batch, mesh))
        single, mu = step(single, jax.device_put(batch, devices[0]))
        np.testing.assert_allclose(
            float(ms["loss"]), float(mu["loss"]), rtol=1e-5,
            err_msg=f"loss step {i}",
        )
        np.testing.assert_allclose(
            float(ms["grad_norm"]), float(mu["grad_norm"]), rtol=1e-4,
            err_msg=f"grad_norm step {i}",
        )
        assert max_delta(sharded.params, single.params) < 1e-5, f"step {i}"
        assert max_delta(sharded.batch_stats, single.batch_stats) < 1e-4, (
            f"step {i}"
        )


def test_scan_epoch_runner_sharded_matches_single():
    """The lax.scan epoch runner (device-resident data + shuffle gather)
    under a data-sharded mesh reproduces the single-device epoch
    (VERDICT r2 #4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state
    from nvae_tpu.train.epoch_runner import make_epoch_runner, stage_dataset
    from nvae_tpu.train.state import create_train_state

    devices = jax.devices()
    mesh = make_mesh()
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    steps, batch = 2, 16
    tc = TrainConfig(epochs=1, batch_size=batch, step_based_warmup=True)
    model, s0, tx = create_train_state(cfg, tc, total_steps=steps)
    runner = make_epoch_runner(
        model, tx, tc, total_steps=steps, steps_per_epoch=steps,
        donate=False,
    )
    data = (
        np.random.RandomState(0).rand(steps * batch, 32, 32, 1) > 0.5
    ).astype(np.uint8) * np.uint8(255)
    st_s, m_s = runner(
        shard_state(s0, mesh),
        stage_dataset(data, NamedSharding(mesh, P("data", None, None, None))),
        jnp.asarray(0),
    )
    st_u, m_u = runner(
        jax.device_put(s0, devices[0]), stage_dataset(data), jnp.asarray(0)
    )
    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_u["loss"]), rtol=2e-3
    )
    d_bn = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(
            jax.tree.leaves(st_s.batch_stats), jax.tree.leaves(st_u.batch_stats)
        )
    )
    assert d_bn < 1e-2


def test_sharded_precision_recall_matches_single_device():
    """P&R with row-sharded feature matrices (mesh= path, incl. sentinel
    padding for non-divisible row counts) equals the single-device result."""
    from nvae_tpu.eval.precision_recall import knn_precision_recall_features

    rng = np.random.RandomState(0)
    real = rng.randn(203, 32).astype(np.float32)  # 203 % 8 != 0 -> padding
    gen = (rng.randn(157, 32) * 0.8 + 0.3).astype(np.float32)
    base = knn_precision_recall_features(real, gen, nhood_sizes=(3, 5))
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    sharded = knn_precision_recall_features(
        real, gen, nhood_sizes=(3, 5), mesh=mesh
    )
    for key in ("precision", "recall", "precision_k3", "recall_k5"):
        np.testing.assert_allclose(sharded[key], base[key], atol=1e-6)
    # Non-degenerate: both manifolds partially overlap.
    assert 0.0 < base["precision"] < 1.0


def test_dp_tp_train_step_matches_dp_only():
    """A DPxTP-sharded train step computes the same loss as DP-only —
    GSPMD collectives preserve the math."""
    import jax.numpy as jnp

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state, shard_state_tp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    model_cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    train_cfg = TrainConfig(epochs=1, batch_size=8, step_based_warmup=True)
    model, state, tx = create_train_state(model_cfg, train_cfg, 4)
    step_fn = make_train_step(model, tx, train_cfg, 4, 4, donate=False)
    batch = (
        jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 1)) > 0.5
    ).astype(jnp.float32)

    mesh_dp = make_mesh(n_data=8, n_model=1)
    s1 = shard_state(state, mesh_dp)
    b1 = shard_batch(batch, mesh_dp)
    _, m1 = step_fn(s1, b1)

    mesh_tp = make_mesh(n_data=4, n_model=2)
    s2 = shard_state_tp(state, mesh_tp, min_features=48)
    b2 = jax.device_put(batch, data_sharding(mesh_tp))
    _, m2 = step_fn(s2, b2)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )


def test_fsdp_sharding_selects_large_leaves():
    """Shape-based FSDP rule: large leaves split along their largest
    data-divisible dim, small leaves replicated, and param-congruent
    optimizer moments get IDENTICAL layouts (same pure shape rule)."""
    from nvae_tpu.parallel import fsdp_sharding

    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    params = {
        "wide": {"sn_kernel": jnp.zeros((1, 1, 16, 96))},
        "tiny": {"bias": jnp.zeros((48,))},  # below min_size -> replicated
        "odd": {"kernel": jnp.zeros((3, 3, 5, 7))},  # nothing divisible by 8
    }
    sh = fsdp_sharding(params, mesh, min_size=64)
    assert "data" in str(sh["wide"]["sn_kernel"].spec)
    # largest divisible dim is the trailing 96
    assert sh["wide"]["sn_kernel"].spec[3] == "data"
    assert sh["tiny"]["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"]["kernel"].spec == jax.sharding.PartitionSpec()
    moments = jax.tree.map(jnp.zeros_like, params)
    sh_m = fsdp_sharding(moments, mesh, min_size=64)
    assert str(sh_m["wide"]["sn_kernel"].spec) == str(
        sh["wide"]["sn_kernel"].spec
    )


def test_fsdp_state_is_memory_sharded():
    """shard_state_fsdp actually distributes params AND Adamax moments:
    per-device addressable shards of large leaves are 1/N of the leaf."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_fsdp
    from nvae_tpu.train.state import create_train_state

    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    n = mesh.shape["data"]
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(epochs=1, batch_size=16, step_based_warmup=True)
    _, s0, _ = create_train_state(cfg, tc, total_steps=4)
    st = shard_state_fsdp(s0, mesh, min_size=256)

    def count_sharded(tree):
        total, sharded = 0, 0
        for leaf in jax.tree.leaves(tree):
            if getattr(leaf, "size", 0) < 256:
                continue
            total += 1
            shard = leaf.addressable_shards[0].data
            if shard.size == leaf.size // n:
                sharded += 1
        return sharded, total

    ps, pt = count_sharded(st.params)
    os_, ot = count_sharded(st.opt_state)
    assert ps > 0 and ps == pt, f"params: {ps}/{pt} large leaves sharded"
    assert os_ > 0, f"opt_state: {os_}/{ot} large leaves sharded"


def test_fsdp_sgd_lockstep_every_step_tight():
    """FSDP-sharded (params + moments split over 'data') vs single-device
    with a LINEAR optimizer: loss, grad norm, params, and BN stats must
    match to fp32 reduction-order noise at EVERY step — the same tight
    harness that caught the replicated-over-model-axis GSPMD miscompile
    (shard_state docstring), now aimed at the FSDP layout's all-gather/
    reduce-scatter insertion."""
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_fsdp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(epochs=1, batch_size=16, step_based_warmup=True)
    model, s0, _ = create_train_state(cfg, tc, total_steps=4)
    tx = optax.sgd(1e-5)
    s0 = s0.replace(opt_state=tx.init(s0.params))
    # min_size=64: the tiny debug model's conv kernels all qualify, so the
    # dry run genuinely exercises sharded-weight forward/backward.
    sharded = shard_state_fsdp(s0, mesh, min_size=64)
    single = jax.device_put(s0, devices[0])
    step = make_train_step(model, tx, tc, 4, 4, donate=False)

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    for i in range(4):
        batch = (
            jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(7), i), (16, 32, 32, 1)
            )
            > 0.5
        ).astype(jnp.float32)
        sharded, ms = step(sharded, shard_batch(batch, mesh))
        single, mu = step(single, jax.device_put(batch, devices[0]))
        np.testing.assert_allclose(
            float(ms["loss"]), float(mu["loss"]), rtol=1e-5,
            err_msg=f"loss step {i}",
        )
        np.testing.assert_allclose(
            float(ms["grad_norm"]), float(mu["grad_norm"]), rtol=1e-4,
            err_msg=f"grad_norm step {i}",
        )
        assert max_delta(sharded.params, single.params) < 1e-5, f"step {i}"
        assert max_delta(sharded.batch_stats, single.batch_stats) < 1e-4, (
            f"step {i}"
        )


def test_fsdp_adamax_trajectory_matches_single():
    """4 Adamax steps under FSDP vs single-device: per-step losses match
    (2e-3 after step 0, Adamax sign-noise — same bounds as the DPxTP
    trajectory test), step-0 BN stats tight."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_fsdp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(epochs=1, batch_size=16, step_based_warmup=True)
    model, s0, tx = create_train_state(cfg, tc, total_steps=4)
    sharded = shard_state_fsdp(s0, mesh, min_size=64)
    single = jax.device_put(s0, devices[0])
    step = make_train_step(model, tx, tc, 4, 4, donate=False)

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    for i in range(4):
        batch = (
            jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(3), i), (16, 32, 32, 1)
            )
            > 0.5
        ).astype(jnp.float32)
        sharded, ms = step(sharded, shard_batch(batch, mesh))
        single, mu = step(single, jax.device_put(batch, devices[0]))
        tol = 1e-6 if i == 0 else 2e-3
        np.testing.assert_allclose(
            float(ms["loss"]), float(mu["loss"]), rtol=tol
        )
        if i == 0:
            assert max_delta(sharded.batch_stats, single.batch_stats) < 1e-4

    lr = tc.learning_rate
    assert max_delta(sharded.params, single.params) < 3 * lr * 4


def test_scan_epoch_runner_fsdp_matches_single():
    """The lax.scan epoch runner composes with the FSDP layout: a whole
    epoch over FSDP-sharded state (params + moments 1/N over 'data')
    reproduces the single-device epoch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state_fsdp
    from nvae_tpu.train.epoch_runner import make_epoch_runner, stage_dataset
    from nvae_tpu.train.state import create_train_state

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    steps, batch = 2, 16
    tc = TrainConfig(epochs=1, batch_size=batch, step_based_warmup=True)
    model, s0, tx = create_train_state(cfg, tc, total_steps=steps)
    runner = make_epoch_runner(
        model, tx, tc, total_steps=steps, steps_per_epoch=steps,
        donate=False,
    )
    data = (
        np.random.RandomState(1).rand(steps * batch, 32, 32, 1) > 0.5
    ).astype(np.uint8) * np.uint8(255)
    st_s, m_s = runner(
        shard_state_fsdp(s0, mesh, min_size=64),
        stage_dataset(data, NamedSharding(mesh, P("data", None, None, None))),
        jnp.asarray(0),
    )
    st_u, m_u = runner(
        jax.device_put(s0, devices[0]), stage_dataset(data), jnp.asarray(0)
    )
    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_u["loss"]), rtol=2e-3
    )
    d_bn = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(
            jax.tree.leaves(st_s.batch_stats), jax.tree.leaves(st_u.batch_stats)
        )
    )
    assert d_bn < 1e-2


def test_memory_report_fsdp_reduces_device_bytes():
    """tools/memory_report.py: FSDP's per-device state bytes are a fraction
    of the replicated layout's, while the global totals are identical."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "memory_report",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "memory_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rep = mod.main(["--layout", "replicated", "--debug", "--no_compile"])
    fsdp = mod.main(["--layout", "fsdp", "--debug", "--no_compile",
                     "--min_size", "64"])
    assert (
        rep["state_bytes_total"]["all"] == fsdp["state_bytes_total"]["all"]
    )
    # Replicated stores every param byte on device 0; FSDP a strict subset
    # (the tiny debug model still has mostly-small leaves, so just require
    # a real reduction, not the asymptotic 1/N).
    assert rep["state_bytes_device0"]["params"] == rep[
        "state_bytes_total"]["params"]
    assert (
        fsdp["state_bytes_device0"]["params"]
        < rep["state_bytes_device0"]["params"]
    )
    assert (
        fsdp["state_bytes_device0"]["opt_state"]
        < rep["state_bytes_device0"]["opt_state"]
    )


@pytest.mark.parametrize("layout", ["replicated", "fsdp"])
def test_grad_accum_on_mesh_matches_single(layout):
    """grad_accum composes with the mesh under BOTH parameter layouts:
    microbatched steps over sharded batches match the single-device
    trajectory under linear SGD at every step.

    This is the regression test for a jax 0.8 GSPMD miscompile: without
    the P(None, "data") pin that make_train_step(mesh=...) places on the
    (accum, micro, ...) reshape, the partitioner re-shards it across both
    leading dims and produces a double-counted depthwise-conv gradient
    (grad_norm 473 vs 337, the single wrong leaf being dw_kernel — same
    family as the model>1-mesh bug in parallel/mesh.py:shard_state).
    The replicated variant of this test fails without the pin."""
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state, shard_state_fsdp
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(
        epochs=1, batch_size=16, step_based_warmup=True, grad_accum=2
    )
    model, s0, _ = create_train_state(cfg, tc, total_steps=4)
    tx = optax.sgd(1e-5)
    s0 = s0.replace(opt_state=tx.init(s0.params))
    if layout == "fsdp":
        sharded = shard_state_fsdp(s0, mesh, min_size=64)
    else:
        sharded = shard_state(s0, mesh)
    single = jax.device_put(s0, devices[0])
    # Two step fns: the mesh pin bakes the 8-device mesh into the program,
    # so the single-device reference needs its own (pin-free) compilation.
    step = make_train_step(model, tx, tc, 4, 4, donate=False, mesh=mesh)
    step_1 = make_train_step(model, tx, tc, 4, 4, donate=False)

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    for i in range(3):
        batch = (
            jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(5), i), (16, 32, 32, 1)
            )
            > 0.5
        ).astype(jnp.float32)
        sharded, ms = step(sharded, shard_batch(batch, mesh))
        single, mu = step_1(single, jax.device_put(batch, devices[0]))
        np.testing.assert_allclose(
            float(ms["loss"]), float(mu["loss"]), rtol=1e-5,
            err_msg=f"loss step {i}",
        )
        np.testing.assert_allclose(
            float(ms["grad_norm"]), float(mu["grad_norm"]), rtol=1e-4,
            err_msg=f"grad_norm step {i}",
        )
        assert max_delta(sharded.params, single.params) < 1e-5, f"step {i}"


def test_grad_accum_unpinned_reshape_still_miscompiles():
    """Canary for the upstream GSPMD bug: WITHOUT the mesh pin (the old
    step construction), replicated params + the accumulation reshape on a
    multi-device mesh still produce a wrong depthwise-conv gradient.  If
    this test ever starts failing (i.e. the unpinned gradient becomes
    correct), the jax bug is fixed upstream and the with_sharding_constraint
    in make_train_step can be retired."""
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import shard_state
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n_data=len(devices), n_model=1)
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    tc = TrainConfig(
        epochs=1, batch_size=16, step_based_warmup=True, grad_accum=2
    )
    model, s0, _ = create_train_state(cfg, tc, total_steps=4)
    tx = optax.sgd(1e-5)
    s0 = s0.replace(opt_state=tx.init(s0.params))
    step = make_train_step(model, tx, tc, 4, 4, donate=False)  # no mesh pin
    batch = (
        jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(5), 0), (16, 32, 32, 1)
        )
        > 0.5
    ).astype(jnp.float32)
    _, ms = step(shard_state(s0, mesh), shard_batch(batch, mesh))
    _, mu = step(jax.device_put(s0, devices[0]),
                 jax.device_put(batch, devices[0]))
    rel = abs(float(ms["grad_norm"]) - float(mu["grad_norm"])) / float(
        mu["grad_norm"]
    )
    assert rel > 0.01, (
        f"unpinned grad_accum reshape now matches single-device "
        f"(rel {rel:.2e}) — upstream GSPMD bug fixed? The pin in "
        f"make_train_step can be retired."
    )
