"""Multi-process (multi-host) execution — the DCN tier of the mesh layer.

The reference is strictly single-process and single-device (SURVEY §2.7:
no ``tf.distribute``, no communication backend of any kind).  The rest of
this framework is single-controller: one Python process drives every local
chip through GSPMD shardings (``mesh.py``) or per-stage placement
(``pipeline.py``).  This module adds the multi-controller tier for TPU
pods/multi-host slices, where N identical processes (one per host) each own
a subset of the global devices and JAX's runtime stitches them into one
SPMD program — data-axis collectives ride ICI within a host's slice and DCN
across hosts, with XLA choosing the hierarchy (the reason the mesh's
``data`` axis should span hosts *outermost*, which :func:`make_mesh`'s
device order already guarantees: ``jax.devices()`` sorts by process).

Nothing else in the framework changes under multi-controller execution:

- ``make_mesh``/``shard_state``/``shard_state_fsdp`` build global meshes
  and global shardings (``jax.devices()`` is the *global* list).
- ``make_train_step``'s jitted program is SPMD — every process executes
  the same program over its addressable shards.
- Orbax checkpointing is multi-host-aware (every process saves its own
  shards; restore reassembles them).

The only genuinely new requirement is input: each process loads/owns only
its rows of the global batch, and :func:`global_batch` assembles the
``jax.Array`` view that the jitted step consumes.  That is this module.

Verified end-to-end by ``tests/test_multihost.py``: two coordinated CPU
processes (gloo collectives over localhost) train the real model with
process-local data and match the single-process trajectory bitwise.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """``jax.distributed.initialize`` with environment fallbacks.

    On Cloud TPU pods the three arguments are auto-detected from the TPU
    metadata and may all be ``None``; elsewhere (CPU/GPU clusters, tests)
    they come from the ``NVAE_TPU_COORDINATOR`` / ``NVAE_TPU_NUM_PROCESSES``
    / ``NVAE_TPU_PROCESS_ID`` environment variables or the explicit
    arguments.  Must be called before any other JAX API touches devices.
    A ``num_processes`` of 1 with no coordinator is a no-op (single-host
    runs never pay the coordination service).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "NVAE_TPU_COORDINATOR"
    )
    if num_processes is None and "NVAE_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NVAE_TPU_NUM_PROCESSES"])
    if process_id is None and "NVAE_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["NVAE_TPU_PROCESS_ID"])
    if coordinator_address is None and (num_processes or 1) == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_primary() -> bool:
    """True on the process that should write logs/samples/summary files.

    (Orbax checkpoint saves are NOT gated on this — every process must
    participate to write its addressable shards.)
    """
    return jax.process_index() == 0


def process_local_rows(n_global: int) -> Tuple[int, int]:
    """Half-open row range ``[lo, hi)`` of a global batch/dataset owned by
    this process (contiguous block partition; requires divisibility so the
    global batch shards evenly over the data axis)."""
    p, n = jax.process_index(), jax.process_count()
    if n_global % n:
        raise ValueError(
            f"global size {n_global} not divisible by {n} processes"
        )
    per = n_global // n
    return p * per, (p + 1) * per


def global_batch(local_rows: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble the global, data-sharded batch from this process's rows.

    ``local_rows`` is the block returned by :func:`process_local_rows` —
    each process passes only its own rows; the result is a global
    ``jax.Array`` sharded ``P("data")`` over the mesh, consumable by the
    jitted train step exactly like the single-controller path's
    ``shard_batch``.  No data crosses DCN here: every process's rows land
    on its own addressable devices.
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_rows)
