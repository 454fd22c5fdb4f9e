"""One process of a coordinated multi-process CPU run.

Spawned by ``tests/test_multihost.py`` (never collected by pytest): each of
``num_processes`` workers owns 2 local CPU devices and its own block of the
global batch; together they run the REAL jitted train step over a global
("data",) mesh with gloo collectives over localhost — the same code path a
TPU pod runs over ICI+DCN, minus the hardware.

Prints one line ``RESULT {json}`` with the per-step losses and a parameter
checksum for the driver to compare across processes and against the
single-process trajectory.

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import json
import os
import sys

# Clean the inherited test-process XLA flags (8 virtual devices) — this
# process sizes its device count via jax_num_cpu_devices instead.
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Some environments force an accelerator platform in sitecustomize;
# re-assert CPU (mirrors tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from nvae_tpu.parallel import multihost

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc
    assert len(jax.local_devices()) == 2

    import numpy as np
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import make_mesh, shard_state
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    model_cfg = debug_config(
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
        n_encoder_channels=8, n_decoder_channels=8,
    )
    tc = TrainConfig(batch_size=8, step_based_warmup=True, learning_rate=1e-5)
    tx = optax.sgd(1e-5)
    model, state, _ = create_train_state(model_cfg, tc, 10, tx=tx)
    # Same seed on every process -> identical host state; device_put onto a
    # cross-process sharding takes the same-value-on-all-processes path.
    state = jax.device_get(state)
    mesh = make_mesh()  # global ("data", "model") mesh over all 2*nproc devs
    state = shard_state(state, mesh)
    step_fn = make_train_step(model, tx, tc, 10, 5, mesh=mesh, donate=False)

    rng = np.random.default_rng(0)
    losses = []
    for _ in range(3):
        full = (rng.random((8, 32, 32, 1)) > 0.5).astype("float32")
        lo, hi = multihost.process_local_rows(8)
        batch = multihost.global_batch(np.ascontiguousarray(full[lo:hi]), mesh)
        state, metrics = step_fn(state, batch)
        # loss is fully replicated -> convertible on every process
        losses.append(float(metrics["loss"]))

    csum = float(
        sum(
            float(np.abs(np.asarray(leaf.addressable_data(0))).sum())
            for leaf in jax.tree.leaves(state.params)
        )
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "primary": multihost.is_primary(),
                "losses": losses,
                "csum": csum,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
