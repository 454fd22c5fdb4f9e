"""GPipe-style pipeline parallelism over the NVAE stage modules.

The reference is single-device (SURVEY §2.7 marks pipeline parallelism
"absent"); SURVEY originally scoped PP out because the reference model fits
one chip.  This module closes the gap the TPU-native way for configs that do
NOT fit: the model's four stage modules (preprocess / encoder / decoder /
postprocess — exactly the decomposition of ``NVAE.setup``) are placed on
separate devices (or small data-parallel submeshes), and each optimizer step
runs a GPipe fill-drain schedule over ``M`` microbatches:

- **Placement, not GSPMD:** each stage's params, BatchNorm stats, spectral
  state, and Adamax+spectral optimizer state are *committed* to that stage's
  devices — per-device HBM holds 1/S of the model and optimizer, plus only
  its own stage's activations.  Stage-boundary activations are the only
  inter-device traffic (direct device-to-device transfers; ICI on a TPU
  slice).
- **Schedule = async dispatch:** the host enqueues the per-stage jitted
  programs; XLA's asynchronous dispatch overlaps stage ``s`` on microbatch
  ``i`` with stage ``s+1`` on microbatch ``i-1`` exactly as the dependency
  DAG allows.  No hand-written scheduler thread is needed — the device
  queues *are* the pipeline.  Two dispatch orders are provided
  (``pipeline_schedule``): classic GPipe fill-drain, and the default
  **1F1B** interleave (one backward chain dispatched behind each forward
  chain) whose peak boundary-activation stash is O(stages) instead of
  O(microbatches) — same bubble, same numerics, bounded memory.
- **Backward = rematerialized VJP (GPipe's memory model):** only the stage
  *inputs* are stashed per microbatch; the backward program recomputes the
  stage forward under ``jax.vjp``.  Activation memory per device is
  O(microbatch) + O(M boundary tensors), never O(batch x depth).
- **Numerics contract:** a pipeline step with ``M`` microbatches is EXACTLY
  the ``grad_accum=M`` single-device step of ``train/step.py`` — the same
  per-microbatch RNG folds (``fold_in(fold_in(rng, step), i)``), the same
  chained BatchNorm/spectral mutation order, the same mean-of-microbatch
  gradients, and per-stage optax transforms that are tree-local (Adamax is
  per-coordinate, spectral projection per-kernel), hence identical to the
  global optimizer.  ``tests/test_pipeline.py`` lockstep-verifies this to
  fp32 reduction noise.

Stage splits (``stage_names(n)``): 2 -> (preprocess+encoder | decoder+
postprocess); 3 -> (preprocess+encoder | decoder | postprocess) — on the
default MNIST config the postprocess tower holds the dominant 5x5 conv
(PROFILE.md finding 2), so it earns its own stage; 4 -> one module each.
"""

from __future__ import annotations

import functools
import operator
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nvae_tpu.config import ModelConfig, TrainConfig
from nvae_tpu.models import NVAE
from nvae_tpu.models.nvae import ForwardOutput
from nvae_tpu.train import losses
from nvae_tpu.train.optim import make_optimizer, find_spectral_state, spectral_penalty
from nvae_tpu.train.state import TrainState

STAGE_MODULES = ("preprocess", "encoder", "decoder", "postprocess")


def stage_names(n_stages: int) -> Tuple[Tuple[str, ...], ...]:
    """Contiguous groupings of the four stage modules."""
    if n_stages == 1:
        return (STAGE_MODULES,)
    if n_stages == 2:
        return (("preprocess", "encoder"), ("decoder", "postprocess"))
    if n_stages == 3:
        return (("preprocess", "encoder"), ("decoder",), ("postprocess",))
    if n_stages == 4:
        return tuple((m,) for m in STAGE_MODULES)
    raise ValueError(f"pipeline supports 1-4 stages, got {n_stages}")


def split_tree(tree, names: Sequence[str]) -> dict:
    """Subtree of a top-level variable dict for one stage (missing keys —
    e.g. an empty 'spectral' collection in projection mode — are skipped)."""
    if not tree:
        return {}
    return {k: tree[k] for k in names if k in tree}


def merge_trees(parts: Sequence[dict]) -> dict:
    out = {}
    for p in parts:
        out.update(p)
    return out


_ALL_MODULES = frozenset(STAGE_MODULES)


def merge_opt_states(parts: Sequence):
    """Merge per-stage optimizer chain states into the single-device layout.

    Every transform in the production chain (Adamax moments, SpectralState
    u/sigma, EmaState) is tree-local: its state nests param-shaped dicts
    keyed by the four stage modules, plus step counters that advance in
    lockstep on every stage.  Merging is therefore structural: union the
    module-keyed dicts, recurse through (Named)tuples, and keep the first
    stage's copy of any shared scalar.  The result is bit-identical in
    structure to ``make_optimizer(...).init(full_params)`` — which makes a
    pipeline checkpoint restorable on ANY topology (single device, FSDP
    mesh, or a different stage count)."""
    p0 = parts[0]
    if isinstance(p0, dict):
        out: dict = {}
        for part in parts:
            for k, v in part.items():
                out[k] = merge_opt_states([out[k], v]) if k in out else v
        return out
    if isinstance(p0, tuple) and hasattr(p0, "_fields"):  # NamedTuple
        return type(p0)(
            *(merge_opt_states([getattr(p, f) for p in parts])
              for f in p0._fields)
        )
    if isinstance(p0, (tuple, list)):
        return type(p0)(
            merge_opt_states([p[i] for p in parts]) for i in range(len(p0))
        )
    return p0  # shared scalar (e.g. count): identical across stages


def split_opt_state(opt_state, names: Sequence[str]):
    """One stage's slice of a single-device optimizer chain state: the
    inverse of :func:`merge_opt_states`.  Dicts keyed purely by stage-module
    names are param-shaped — take this stage's keys; everything else
    (NamedTuple fields, chain tuples, scalars) is structural or shared."""
    names = tuple(names)

    def rec(node):
        if isinstance(node, dict):
            if node and all(k in _ALL_MODULES for k in node):
                return {k: node[k] for k in names if k in node}
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(rec(getattr(node, f)) for f in node._fields))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(opt_state)


def _stage_method(names: Tuple[str, ...], train: bool):
    """An ``NVAE.apply`` method running a contiguous slice of the forward.

    Runs through ``model.apply`` (NOT the submodule's own ``apply``) so every
    ``make_rng`` fold sees the identical module path as the full forward —
    sample noise is bit-equal to single-device training.
    """

    def run(m: NVAE, val):
        for name in names:
            if name == "preprocess":
                val = m.preprocess(val, train)
            elif name == "encoder":
                feats, trunk = m.encoder(val, train)
                # bottom-up -> top-down, reference models.py:93 (nvae.py:518)
                val = (tuple(reversed(feats)), trunk)
            elif name == "decoder":
                enc_feats, trunk = val
                f, lat, _lp, _lq = m.decoder(
                    trunk, list(enc_feats), train=train, nll=False
                )
                val = (f, tuple(lat))
            elif name == "postprocess":
                f, lat = val
                logits = m.postprocess(f, train)
                b = logits.shape[:1]
                val = ForwardOutput(
                    logits=logits, latents=list(lat),
                    log_p=jnp.zeros(b), log_q=jnp.zeros(b),
                )
            else:  # pragma: no cover
                raise ValueError(name)
        return val

    return run


def _tree_add(a, b):
    return jax.tree.map(operator.add, a, b)


class PipelineTrainer:
    """GPipe training over ``n_stages`` devices (or DP submeshes).

    Parameters
    ----------
    model, train_cfg, total_steps, steps_per_epoch:
        Same meaning as :func:`nvae_tpu.train.step.make_train_step`.
    n_stages:
        1-4 pipeline stages (see :func:`stage_names`).
    n_microbatches:
        GPipe microbatches per optimizer step (0 -> ``n_stages``).  The
        pipeline's gradient accumulation — ``train_cfg.grad_accum`` must be 1.
    devices:
        Flat device list of length ``n_stages * dp`` (default:
        ``jax.devices()`` prefix).
    dp:
        Data-parallel width *within* each stage (a one-axis ("data",) mesh
        per stage; batch rows sharded, stage params replicated across it).
    state:
        Optional pre-built full :class:`TrainState` to split (for lockstep
        tests / checkpoint restore).  Otherwise built internally.
    tx_factory:
        ``() -> optax.GradientTransformation`` per stage; defaults to the
        production optimizer (Adamax + cosine + spectral strategy).  All
        framework transforms are tree-local, so per-stage instances are
        equivalent to the global one.
    """

    def __init__(
        self,
        model: NVAE,
        train_cfg: TrainConfig,
        total_steps: int,
        steps_per_epoch: int,
        n_stages: int = 2,
        n_microbatches: int = 0,
        devices: Optional[Sequence] = None,
        dp: int = 1,
        state: Optional[TrainState] = None,
        tx_factory=None,
        schedule: Optional[str] = None,
    ):
        if getattr(train_cfg, "grad_accum", 1) > 1:
            raise ValueError(
                "pipeline microbatches ARE the gradient accumulation; "
                "set grad_accum=1 under pipeline_stages>1"
            )
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.train_cfg = train_cfg
        self.total_steps = total_steps
        self.steps_per_epoch = max(steps_per_epoch, 1)
        self.total_epochs = max(total_steps // self.steps_per_epoch, 1)
        self.n_stages = n_stages
        self.n_microbatches = n_microbatches or n_stages
        self.names = stage_names(n_stages)
        self.penalty_mode = self.cfg.spectral_mode == "penalty"
        if schedule is None:
            schedule = getattr(train_cfg, "pipeline_schedule", "1f1b")
        if schedule not in ("gpipe", "1f1b"):
            raise ValueError(
                f"pipeline_schedule must be 'gpipe' or '1f1b', got {schedule!r}"
            )
        self.schedule = schedule
        # Observability: peak number of stashed microbatch boundary tuples
        # across the last step() (gpipe: M; 1f1b: <=2 regardless of M).
        self.peak_stash = 0

        devices = list(devices) if devices is not None else jax.devices()
        need = n_stages * dp
        if len(devices) < need:
            raise ValueError(
                f"pipeline needs {need} devices ({n_stages} stages x dp={dp}),"
                f" have {len(devices)}"
            )
        self._param_shardings, self._batch_shardings = [], []
        for s in range(n_stages):
            devs = devices[s * dp : (s + 1) * dp]
            if dp == 1:
                sd = jax.sharding.SingleDeviceSharding(devs[0])
                self._param_shardings.append(sd)
                self._batch_shardings.append(sd)
            else:
                mesh = jax.sharding.Mesh(np.asarray(devs), axis_names=("data",))
                P = jax.sharding.PartitionSpec
                self._param_shardings.append(
                    jax.sharding.NamedSharding(mesh, P())
                )
                self._batch_shardings.append(
                    jax.sharding.NamedSharding(mesh, P("data"))
                )

        if state is None:
            from nvae_tpu.train.state import create_train_state

            _, state, _ = create_train_state(
                self.cfg, train_cfg, total_steps
            )
        self.load_state(state, tx_factory)
        self._build_stage_programs()

    # ---- state management --------------------------------------------------

    def load_state(self, state: TrainState, tx_factory=None,
                   restore_opt: bool = False):
        """Split a full train state across the stages (params, BN stats,
        spectral collection).  Optimizer state is rebuilt per stage, unless
        ``restore_opt`` — then ``state.opt_state`` must be the single-device
        chain layout (what :meth:`merged_state` and ``make_optimizer().init``
        both produce), and each stage takes its :func:`split_opt_state`
        slice, resuming the Adamax moments / spectral vectors / EMA exactly.
        Because the layout is topology-free, a checkpoint written by ANY
        pipeline shape (or none) restores here."""
        if tx_factory is None:
            tx_factory = lambda: make_optimizer(  # noqa: E731
                self.train_cfg, self.total_steps, self.cfg.spectral_mode
            )
        self.params, self.bstats, self.spect = [], [], []
        self.txs, self.opt = [], []
        def owned_put(tree, sharding):
            # device_put ALIASES arrays already on the target device; the
            # update programs donate params/opt, which would delete the
            # caller's arrays through the alias.  Force ownership with a
            # device-local copy (one jitted program per stage, init-only).
            moved = jax.device_put(tree, sharding)
            return jax.jit(lambda t: jax.tree.map(jnp.copy, t))(moved)

        for s, names in enumerate(self.names):
            put = functools.partial(
                jax.device_put, device=self._param_shardings[s]
            )
            p = owned_put(
                split_tree(state.params, names), self._param_shardings[s]
            )
            self.params.append(p)
            self.bstats.append(put(split_tree(state.batch_stats, names)))
            self.spect.append(put(split_tree(state.spectral, names)))
            tx = tx_factory()
            self.txs.append(tx)
            if restore_opt:
                part = split_opt_state(state.opt_state, names)
                want = jax.eval_shape(tx.init, p)
                if (jax.tree_util.tree_structure(part)
                        != jax.tree_util.tree_structure(want)):
                    raise ValueError(
                        f"stage {s} optimizer state from the checkpoint does "
                        "not match this run's optimizer chain (different "
                        "spectral_mode / ema_decay?); re-run without opt "
                        "restore or align the training config"
                    )
                self.opt.append(owned_put(part, self._param_shardings[s]))
            else:
                self.opt.append(jax.jit(tx.init)(p))
        self.step_count = int(state.step)
        self.rng = state.rng

    def merged_state(self) -> TrainState:
        """Gather the stage trees back into a full :class:`TrainState`.

        ``opt_state`` comes back in the single-device chain layout
        (:func:`merge_opt_states`), so the checkpoint a pipeline run writes
        is indistinguishable from a single-device / FSDP one: it restores
        on any topology (sample/serve hosts, a different stage count, a
        mesh), and :meth:`load_state` with ``restore_opt=True`` resumes the
        exact optimizer moments here.
        """
        return TrainState(
            step=jnp.asarray(self.step_count, jnp.int32),
            epoch=jnp.asarray(self.step_count // self.steps_per_epoch, jnp.int32),
            params=merge_trees([jax.device_get(p) for p in self.params]),
            batch_stats=merge_trees([jax.device_get(b) for b in self.bstats]),
            spectral=merge_trees([jax.device_get(sp) for sp in self.spect]),
            opt_state=merge_opt_states([jax.device_get(o) for o in self.opt]),
            rng=self.rng,
        )

    def ema_params(self):
        """Merged EMA parameter tree from the per-stage optimizer states,
        or None when the stage optimizers track no EMA (ema_decay=0).

        ``track_ema`` is tree-local (each stage's optax chain carries an
        EmaState over exactly that stage's param subtree, updated from the
        same per-step params the global chain would see), so the full
        average is the stage-wise merge — the same recomposition
        :meth:`merged_state` uses for params."""
        from nvae_tpu.train.optim import find_ema_params

        parts = [find_ema_params(o) for o in self.opt]
        if any(p is None for p in parts):
            return None
        return merge_trees([jax.device_get(p) for p in parts])

    # ---- per-stage compiled programs ----------------------------------------

    def _apply_stage(self, s: int, params, bstats, spect, ins, rng):
        variables = {"params": params, "batch_stats": bstats}
        mutable = ["batch_stats"]
        if spect:
            variables["spectral"] = spect
            mutable.append("spectral")
        outs, mutated = self.model.apply(
            variables, ins,
            method=_stage_method(self.names[s], train=True),
            rngs={"sample": rng}, mutable=mutable,
        )
        return (
            outs,
            mutated.get("batch_stats", bstats),
            mutated.get("spectral", spect),
        )

    def _stage_penalties(self, s: int, params, sn_u):
        """Param-local penalty terms owned by stage ``s`` (BN-gamma over its
        encoder/decoder towers; spectral sigma in penalty mode)."""
        pen = losses.bn_gamma_penalty(params, self.cfg.sr_lambda)
        if self.penalty_mode and sn_u is not None:
            pen = pen + spectral_penalty(params, sn_u, self.cfg.sr_lambda)
        return pen

    def _build_stage_programs(self):
        S = self.n_stages
        cfg, tc = self.cfg, self.train_cfg

        self._fwd, self._bwd, self._upd, self._acc = [], [], [], []
        for s in range(S):
            last = s == S - 1

            def fwd_fn(params, bstats, spect, ins, rng, _s=s):
                return self._apply_stage(_s, params, bstats, spect, ins, rng)

            def bwd_fn(params, bstats, spect, ins, rng, ct, sn_u, _s=s):
                def f(p, i):
                    outs, _, _ = self._apply_stage(_s, p, bstats, spect, i, rng)
                    return outs

                _, vjp = jax.vjp(f, params, ins)
                gp, gi = vjp(ct)
                pen, gpen = jax.value_and_grad(
                    lambda p: self._stage_penalties(_s, p, sn_u)
                )(params)
                return _tree_add(gp, gpen), gi, pen

            def last_fn(params, bstats, spect, ins, rng, x_mb, step, sn_u, _s=s):
                epoch = step // self.steps_per_epoch
                beta = losses.beta_schedule(
                    step, epoch, train_cfg=tc,
                    total_steps=self.total_steps,
                    total_epochs=self.total_epochs,
                )

                def f(p, i):
                    outs, nbs, nsp = self._apply_stage(
                        _s, p, bstats, spect, i, rng
                    )
                    loss, metrics = losses.elbo_loss(outs, x_mb, beta, cfg)
                    pen = self._stage_penalties(_s, p, sn_u)
                    loss = loss + pen
                    metrics["bn_loss"] = pen
                    return loss, (metrics, nbs, nsp)

                (loss, (metrics, nbs, nsp)), (gp, gi) = jax.value_and_grad(
                    f, argnums=(0, 1), has_aux=True
                )(params, ins)
                metrics["loss"] = loss
                return metrics, nbs, nsp, gp, gi

            def upd_fn(params, opt, grads, _s=s):
                grads = jax.tree.map(
                    lambda g: g / self.n_microbatches, grads
                )
                gnorm_sq = optax.global_norm(grads) ** 2
                updates, new_opt = self.txs[_s].update(grads, opt, params)
                return optax.apply_updates(params, updates), new_opt, gnorm_sq

            self._fwd.append(jax.jit(last_fn if last else fwd_fn))
            self._bwd.append(None if last else jax.jit(bwd_fn))
            self._upd.append(jax.jit(upd_fn, donate_argnums=(0, 1)))
            self._acc.append(jax.jit(_tree_add, donate_argnums=(0,)))

    # ---- one optimizer step --------------------------------------------------

    def _stage_sn_u(self, s: int):
        if not self.penalty_mode:
            return None
        st = find_spectral_state(self.opt[s])
        return st.u if st is not None else None

    def step(self, batch) -> dict:
        """One pipelined optimizer step over ``n_microbatches``.

        Matches ``make_train_step``'s ``grad_accum=n_microbatches`` step
        bit-for-bit up to fp32 reduction order (see module docstring).

        Two dispatch schedules, numerically identical (per-stage gradients
        accumulate in microbatch order under both):

        - ``gpipe``: classic fill-drain — all forward chains, then all
          backward chains.  Stashes M boundary tuples per stage at peak.
        - ``1f1b`` (default): the backward chain of microbatch ``i-1`` is
          dispatched right behind the forward chain of microbatch ``i``, so
          each non-last stage's device queue runs F0,F1,B0,F2,B1,… — one
          forward in flight ahead of the oldest unconsumed backward.  Peak
          stash is <=2 tuples per stage regardless of M (GPipe's O(M)
          activation memory becomes O(1)), with the same bubble fraction.
        """
        S, M = self.n_stages, self.n_microbatches
        B = batch.shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by microbatches {M}")
        mb = B // M
        step_dev = jax.device_put(
            jnp.asarray(self.step_count, jnp.int32), self._param_shardings[-1]
        )
        rng_step = jax.random.fold_in(self.rng, self.step_count)
        # grad_accum=1 uses the step key directly (train/step.py:100-102);
        # M>1 folds the microbatch index (train/step.py:130-136).
        keys = [
            rng_step if M == 1 else jax.random.fold_in(rng_step, i)
            for i in range(M)
        ]

        saved: List[dict] = [{} for _ in range(S - 1)]  # stage -> {mb: tuple}
        ct_last: dict = {}
        grads: List = [None] * S
        metrics_acc: List[dict] = []
        stage_pens: dict = {}  # stage -> penalty value (constant across mbs)
        self.peak_stash = 0

        def fwd_chain(i: int) -> None:
            # Forward through stages 0..S-2, fused forward+backward on the
            # last stage (it needs no cotangent from anyone).
            x_i = batch[i * mb : (i + 1) * mb]
            ins = jax.device_put(x_i, self._batch_shardings[0])
            for s in range(S - 1):
                rng_s = jax.device_put(keys[i], self._param_shardings[s])
                saved[s][i] = (ins, self.bstats[s], self.spect[s], rng_s)
                self.peak_stash = max(self.peak_stash, len(saved[s]))
                outs, self.bstats[s], self.spect[s] = self._fwd[s](
                    self.params[s], self.bstats[s], self.spect[s], ins, rng_s
                )
                ins = jax.device_put(outs, self._batch_shardings[s + 1])
            x_last = jax.device_put(x_i, self._batch_shardings[-1])
            rng_l = jax.device_put(keys[i], self._param_shardings[-1])
            m_i, self.bstats[-1], self.spect[-1], gp, gi = self._fwd[-1](
                self.params[-1], self.bstats[-1], self.spect[-1],
                ins, rng_l, x_last, step_dev, self._stage_sn_u(S - 1),
            )
            grads[-1] = gp if i == 0 else self._acc[-1](grads[-1], gp)
            ct_last[i] = gi
            metrics_acc.append(m_i)

        def bwd_chain(i: int) -> None:
            # Backward through stages S-2..0, releasing the stash as it goes.
            ct = ct_last.pop(i)
            for s in range(S - 2, -1, -1):
                ct = jax.device_put(ct, self._batch_shardings[s])
                ins_s, bs_s, sp_s, rng_s = saved[s].pop(i)
                gp, gi, pen = self._bwd[s](
                    self.params[s], bs_s, sp_s, ins_s, rng_s, ct,
                    self._stage_sn_u(s),
                )
                grads[s] = gp if i == 0 else self._acc[s](grads[s], gp)
                ct = gi
                if i == 0:
                    # Param-local penalties are constant across microbatches,
                    # so mb 0's value stands in for the mean (exactly as the
                    # scan mean over identical values does).
                    stage_pens[s] = pen

        if self.schedule == "gpipe":
            for i in range(M):
                fwd_chain(i)
            for i in range(M):
                bwd_chain(i)
        else:  # 1f1b
            for i in range(M):
                fwd_chain(i)
                if i >= 1:
                    bwd_chain(i - 1)
            bwd_chain(M - 1)
        saved = None  # release boundary stash before the updates

        gnorm_sq = 0.0
        for s in range(S):
            self.params[s], self.opt[s], gsq = self._upd[s](
                self.params[s], self.opt[s], grads[s]
            )
            gnorm_sq += float(jax.device_get(gsq))

        # Aggregate metrics exactly like the scan mean (penalty terms of the
        # non-last stages are added to loss/bn_loss — the single-device step
        # includes the full-tree penalty in every microbatch's loss).
        out = {
            k: float(np.mean([jax.device_get(m[k]) for m in metrics_acc]))
            for k in metrics_acc[0]
        }
        extra_pen = sum(
            float(jax.device_get(p)) for p in stage_pens.values()
        )
        out["loss"] += extra_pen
        out["bn_loss"] += extra_pen
        out["grad_norm"] = float(np.sqrt(gnorm_sq))
        self.step_count += 1
        return out
