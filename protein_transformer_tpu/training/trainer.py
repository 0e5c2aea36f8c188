"""Training control loop (reference: train.py:28-186,553-676).

One jit-compiled SPMD training step containing the model forward, all losses
(including on-device NeRF + dRMSD when requested), gradients, and the
optimizer update -- zero host round-trips per step. The host loop handles the
epoch structure, metrics/CSV logging, LR plateau scheduling, early stopping,
and orbax checkpointing, with the reference's semantics throughout.
"""
from __future__ import annotations

import dataclasses
import functools
import itertools
import os
import sys
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protein_transformer_tpu import losses as L
from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data.dataset import (
    Batch, DataModule, load_dataset)
from protein_transformer_tpu.data.prefetch import prefetch
from protein_transformer_tpu.models.factory import make_model
from protein_transformer_tpu.parallel.mesh import (
    make_mesh, shard_batch)
from protein_transformer_tpu.parallel.sharding import shard_params
from protein_transformer_tpu.training import metrics as M
from protein_transformer_tpu.training.checkpoint import (
    CheckpointManager, checkpoint_policy)
from protein_transformer_tpu.training.optim import (
    EarlyStopping, PlateauState, make_optimizer, noam_schedule)
from protein_transformer_tpu.training import wandb_logging as W
from protein_transformer_tpu.training.structure_logging import StructureLogger

DRMSD_LOSSES = ("drmsd", "lndrmsd", "combined")

# Fixed order in which the jitted steps pack their scalar metrics into ONE
# (K,) device vector. Fetching K separate scalar arrays costs K tunnel/link
# round trips per flush window; one packed vector costs one.
METRIC_KEYS = ("loss", "mse-full", "mse-bb", "mse-sc", "drmsd-full",
               "lndrmsd-full", "drmsd-bb", "lndrmsd-bb", "combined-full",
               "rmsd-full")


def pack_metrics(out: dict) -> jax.Array:
    """Stack the scalar metric dict into a (K,) vector (inside jit)."""
    return jnp.stack([out[k] for k in METRIC_KEYS])


def unpack_metrics(row) -> dict:
    """Host-side inverse of pack_metrics for one fetched row."""
    return {k: float(v) for k, v in zip(METRIC_KEYS, row)}


class LoopProfiler:
    """Per-phase host-time accumulator for train_epoch (PTT_LOOP_PROFILE=1).

    Accumulates wall time spent in each host-side phase of the step loop so
    the wall-vs-device-step residue can be attributed (sampler/plan, jit
    dispatch, watchdog poll, metric flush, structure logging) instead of
    guessed. Near-zero overhead: two perf_counter calls per phase."""

    def __init__(self):
        self.t = {}
        self.steps = 0

    def add(self, phase: str, dt: float) -> None:
        self.t[phase] = self.t.get(phase, 0.0) + dt

    def report(self, wall: float) -> str:
        n = max(self.steps, 1)
        lines = [f"# loop profile: {self.steps} steps, "
                 f"{1e3 * wall / n:.2f} ms/step wall"]
        acct = 0.0
        for k, v in sorted(self.t.items(), key=lambda kv: -kv[1]):
            lines.append(f"#   {k:<18} {1e3 * v / n:6.2f} ms/step")
            acct += v
        lines.append(f"#   {'(unaccounted)':<18} "
                     f"{1e3 * (wall - acct) / n:6.2f} ms/step")
        return "\n".join(lines)


def resolve_drmsd_impl(impl: str) -> str:
    """'auto' -> fused Pallas kernel on TPU, tiled XLA path elsewhere."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def compute_losses(model, params, batch: Batch, cfg: TrainConfig,
                   rngs=None, deterministic=True, with_drmsd=None,
                   with_rmsd=False, with_pred=False):
    """All batch losses (reference get_losses, train.py:57-111).

    Returns (training_loss, dict of scalar metrics). MSE losses are always
    computed; dRMSD family only when training on it or evaluating.
    with_pred additionally returns the (B, L, 24) predictions under "pred"
    (for wandb angle histograms, log.py:210-227).
    """
    if with_drmsd is None:
        with_drmsd = cfg.loss in DRMSD_LOSSES
    pred = model.apply(params, batch.seq, batch.ang,
                       deterministic=deterministic, rngs=rngs)
    m_full = L.mse_over_angles(pred, batch.ang, batch.ang_mask)
    m_bb = L.mse_over_angles(pred, batch.ang, batch.ang_mask, bb_only=True)
    m_sc = L.mse_over_angles(pred, batch.ang, batch.ang_mask, sc_only=True)

    zero = jnp.zeros((), m_full.dtype)
    out = {"mse-full": m_full, "mse-bb": m_bb, "mse-sc": m_sc,
           "drmsd-full": zero, "lndrmsd-full": zero, "drmsd-bb": zero,
           "lndrmsd-bb": zero, "combined-full": zero, "rmsd-full": zero}

    pred_crd = None
    if with_drmsd or with_rmsd:
        angles = L.inverse_trig_transform(pred)
        from protein_transformer_tpu.protein.geometry import build_coords_batch
        pred_crd = build_coords_batch(angles, batch.seq)

    # Reference --backbone_loss semantics: coordinates reduce to backbone
    # BEFORE any dRMSD/RMSD, so 'full' metric slots report backbone values
    # and the O((14L)^2) full-atom sweep never runs (reference
    # losses.py:69-71 via train.py get_losses backbone_only=...).
    # --full_metrics restores genuinely full-atom reporting (superset).
    bb_only = (cfg.backbone_loss
               and not getattr(cfg, "full_metrics", False))
    if with_drmsd:
        ref_grads = (getattr(cfg, "grad_semantics", "mean") == "reference"
                     and cfg.loss in DRMSD_LOSSES)
        d = L.compute_batch_drmsd(
            pred, batch.crd, batch.seq, batch.crd_mask, batch.protein_mask,
            impl=resolve_drmsd_impl(getattr(cfg, "drmsd_impl", "auto")),
            pred_crd=pred_crd, with_per_protein=ref_grads,
            backbone_only=bb_only)
        if ref_grads:
            d, per = d
        out.update({"drmsd-full": d.drmsd, "lndrmsd-full": d.ln_drmsd,
                    "drmsd-bb": d.drmsd_bb, "lndrmsd-bb": d.ln_drmsd_bb})
        # --backbone_loss trains on backbone-only dRMSD (train.py:461-462,
        # losses.py:69-71)
        d_train = d.drmsd_bb if cfg.backbone_loss else d.drmsd
        ln_train = d.ln_drmsd_bb if cfg.backbone_loss else d.ln_drmsd
        c = L.combine_drmsd_mse(ln_train, m_full,
                                w=cfg.combined_drmsd_weight)
        out["combined-full"] = c
        if cfg.loss == "drmsd":
            loss = d_train
        elif cfg.loss == "lndrmsd":
            loss = ln_train
        elif cfg.loss == "combined":
            loss = c
        else:
            loss = m_full
        if ref_grads:
            # Reference-faithful stitched gradients (losses.py:91-92,166-167;
            # train.py:84-86): backprop d(sum over proteins of per-protein
            # ln-dRMSD) -- bb-only under --backbone_loss -- plus the MSE term
            # of the combined loss; the REPORTED value stays the selected
            # scalar above.
            ln_vec = per.ln_drmsd_bb if cfg.backbone_loss else per.ln_drmsd
            w = batch.protein_mask.astype(ln_vec.dtype)
            grad_loss = jnp.sum(ln_vec * w)
            if cfg.loss == "combined":
                grad_loss = grad_loss + L.combine_drmsd_mse(
                    jax.lax.stop_gradient(ln_train), m_full,
                    w=cfg.combined_drmsd_weight)
            loss = jax.lax.stop_gradient(loss - grad_loss) + grad_loss
    else:
        loss = m_full

    if with_rmsd:
        if bb_only:
            # reference: rmsd on the same backbone-reduced masked coords
            # (losses.py:95-97 under backbone_only)
            out["rmsd-full"] = L.batch_rmsd_jax(
                pred_crd[:, :, :3], batch.crd[:, :, :3],
                batch.crd_mask[:, :, :3], batch.protein_mask)
        else:
            out["rmsd-full"] = L.batch_rmsd_jax(pred_crd, batch.crd,
                                                batch.crd_mask,
                                                batch.protein_mask)
    out["loss"] = loss
    if with_pred:
        out["pred"] = pred
    return loss, out


class Trainer:
    # steps kept in flight before the pending metric reads are drained
    # (train + eval loops). Each drain costs ~one link round trip (the
    # async copies complete with the window's last step); measured on the
    # tunnel-attached host: 17.6 / 15.7 / 14.9 / 14.4 ms/step at window
    # 8/16/32/64 (41.8 at 1). 32 takes most of the win; the NaN watchdog
    # and CSV rows trail the device by at most this many steps.
    FLUSH_EVERY = 32

    def __init__(self, cfg: TrainConfig, data: Optional[dict] = None,
                 use_mesh: bool = True):
        # Multi-host: join the jax.distributed cluster when the environment
        # configures one (no-op single-process). Must precede ANY backend
        # initialization -- including enable_compilation_cache's
        # jax.default_backend() probe and make_mesh's jax.devices().
        from protein_transformer_tpu.parallel.distributed import (
            initialize_from_env)
        self.process_index, self.process_count = initialize_from_env()
        from protein_transformer_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg = cfg.finalize()
        # PRNG impl must be selected before the first PRNGKey below.
        impl = getattr(cfg, "prng_impl", "auto")
        if impl == "auto":
            impl = ("rbg" if jax.default_backend() == "tpu"
                    else "threefry2x32")
        if impl != "threefry2x32":
            jax.config.update("jax_default_prng_impl", impl)
        data = data if data is not None else load_dataset(cfg.data)
        self.mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes) if use_mesh else None
        n_data = self.mesh.shape.get("data", 1) if self.mesh else 1
        self.dm = DataModule(data, cfg, batch_multiple=n_data)
        # the monitored metric's mode must be one this run actually
        # evaluates -- otherwise the first epoch end KeyErrors after a full
        # epoch of training
        if cfg.es_mode != "train":
            if cfg.train_only:
                raise ValueError(
                    f"--early_stopping_metric {cfg.early_stopping_metric!r} "
                    "monitors a validation split but --train_only never "
                    "evaluates one")
            if cfg.es_mode == "test" or cfg.es_mode not in self.dm.eval_splits:
                raise ValueError(
                    f"--early_stopping_metric {cfg.early_stopping_metric!r}: "
                    f"split {cfg.es_mode!r} is not evaluated during training "
                    f"(available: train, "
                    f"{', '.join(s for s in self.dm.eval_splits if s != 'test')})")
        angle_means = (np.zeros(24, np.float32) if cfg.without_angle_means
                       else self.dm.angle_means)
        self.model = make_model(cfg, angle_means)

        if cfg.lr_scheduling == "noam":
            self.lr_schedule = noam_schedule(cfg.d_model, cfg.n_warmup_steps)
            self.plateau = None
        else:
            self.lr_schedule = None
            self.plateau = PlateauState(patience=cfg.patience,
                                        threshold=cfg.early_stopping_threshold)
        base_lr = (self.lr_schedule if self.lr_schedule
                   else cfg.learning_rate)
        self.tx = make_optimizer(cfg.optimizer, base_lr, cfg.weight_decay,
                                 cfg.clip)
        # Note: optax.flatten (multi-tensor fusion) was measured SLOWER here
        # (12.1 vs 8.8 ms/step): the ravel/unravel concat traffic and lost
        # in-place donation aliasing outweigh the saved per-leaf op chains.
        self.early_stop = EarlyStopping(patience=cfg.early_stopping,
                                        threshold=cfg.early_stopping_threshold)

        self.rng = jax.random.PRNGKey(cfg.seed)
        self.start_epoch = 0
        self.start_time = time.time()
        modes = (["train", "test"]
                 + [f"valid-{s}" for s in (10, 20, 30, 40, 50, 70, 90)])
        self.metrics = M.init_metrics(modes)
        self._jit_cache: dict = {}

        # Device-resident data path: the whole split lives on device and
        # batches are assembled by a jitted gather (host ships only index
        # vectors). Auto-enabled when the footprint fits; multi-process
        # runs replicate the store globally (needs the mesh).
        from protein_transformer_tpu.data import device_store as DS
        self._DS = DS
        self.train_store = None
        self._eval_stores: dict = {}
        # budget only the stores this run will actually build: train_only
        # runs never construct eval-split stores
        all_splits = ([self.dm.train] if cfg.train_only else
                      [self.dm.train] + list(self.dm.eval_splits.values()))
        self.use_device_data = DS.auto_enabled(cfg, all_splits,
                                               self.process_count,
                                               has_mesh=self.mesh is not None,
                                               n_data=n_data)
        if self.use_device_data:
            self.train_store = DS.DeviceStore(self.dm.train, self.mesh)

        out_dir = os.path.join(cfg.out_dir, cfg.name or "run")
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        self.wandb_run = None
        self.structure_logger = StructureLogger(out_dir,
                                                save_pngs=cfg.save_pngs)
        # live per-batch status line (tqdm analogue; --cluster disables it,
        # reference train.py:518-520). Auto-detects an interactive stderr.
        self.batch_status = M.BatchStatus(
            cfg.loss, cfg.lr_scheduling,
            enabled=(False if (cfg.cluster or self.process_index != 0)
                     else None))
        # persist config + angle means for predict/analysis tooling
        import json as _json
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            _json.dump({"config": cfg.to_dict(),
                        "angle_means": [float(a) for a in angle_means]},
                       f, indent=1, default=str)

    # ---------------- state init / restore ----------------

    def init_state(self) -> TrainState:
        rng, self.rng = jax.random.split(self.rng)
        sample = next(self.dm.train_batches(np.random.default_rng(0)))
        params = self.model.init(
            {"params": rng, "dropout": rng, "sampling": rng},
            jnp.asarray(sample.seq), jnp.asarray(sample.ang))
        if self.mesh is not None:
            # TP rules apply when the mesh has a 'model' axis; otherwise
            # everything is replicated. Initializing the optimizer AFTER
            # sharding makes its moment tensors (zeros_like) inherit the
            # parameter shardings.
            params = shard_params(params, self.mesh)
        opt_state = self.tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def maybe_restore(self, state: TrainState) -> TrainState:
        """Resume from 'best' unless --restart (train.py:233-271)."""
        cfg = self.cfg
        modifier = cfg.load_chkpt or "best"
        if cfg.restart or not self.ckpt.exists(modifier):
            return state
        if cfg.restart_opt:
            # weights + fresh optimizer: restore WITHOUT the opt_state
            # template -- the saved optimizer tree may belong to a different
            # optimizer/schedule config and must not be required to match
            # (reference train.py:251-258 loads model weights only). Raw
            # arrays are re-placed onto the live params' shardings.
            raw = self.ckpt.restore_raw(modifier)
            if raw is None:
                return state
            arrays, meta = raw
            params = jax.tree.map(
                lambda live, x: jax.device_put(np.asarray(x), live.sharding),
                state.params, arrays["params"])
            restored = {"params": params, "opt_state": None,
                        "step": jnp.asarray(arrays["step"])}
        else:
            template = {"params": state.params,
                        "opt_state": state.opt_state, "step": state.step}
            result = self.ckpt.restore(modifier, template)
            if result is None:
                return state
            restored, meta = result
        # the JSON sidecar can be missing (crash between the collective
        # array write and the process-0 sidecar write); degrade to epoch 0
        # bookkeeping rather than refusing to resume the weights
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.start_time -= float(meta.get("elapsed", 0.0))
        if self.plateau and meta.get("plateau"):
            self.plateau.load_state_dict(dict(meta["plateau"]))
        if meta.get("early_stop"):
            self.early_stop.load_state_dict(dict(meta["early_stop"]))
        self._best_history = list(meta.get("best_history", []))
        opt_state = (state.opt_state if cfg.restart_opt
                     else restored["opt_state"])
        print(f"[Info] Resumed from '{modifier}' at epoch {self.start_epoch}.")
        return TrainState(restored["params"], opt_state, restored["step"])

    # ---------------- jitted steps ----------------

    def _train_body(self):
        """The un-jitted training step body, shared by the host-batch jit
        (_train_step_fn) and the fused gather+step jit
        (_train_store_step_fn)."""
        cfg, model, tx = self.cfg, self.model, self.tx

        def step(state_params, opt_state, step_no, batch: Batch, rng,
                 lr_scale):
            # Disjoint stream domains: fold in a distinct constant per stream
            # before the step counter, so the 'sampling' key of step N can
            # never collide with the 'dropout' key of step N+1.
            rngs = {"dropout": jax.random.fold_in(
                        jax.random.fold_in(rng, 0), step_no),
                    "sampling": jax.random.fold_in(
                        jax.random.fold_in(rng, 1), step_no)}

            def loss_fn(p):
                return compute_losses(model, p, batch, cfg, rngs=rngs,
                                      deterministic=False,
                                      with_pred=cfg.use_wandb)

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state_params)
            updates, opt_state = tx.update(grads, opt_state, state_params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state_params, updates)
            pred = out.pop("pred", None)
            return params, opt_state, step_no + 1, pack_metrics(out), pred

        return step

    def _train_step_fn(self):
        # donate params/opt_state buffers: they are consumed every step, so
        # XLA can update in place instead of allocating fresh copies
        return functools.partial(jax.jit, donate_argnums=(0, 1))(
            self._train_body())

    def _gathered_batch(self, store: dict, idx, lb: int):
        """Assemble a Batch from the device store INSIDE an enclosing jit
        (the fused dispatch), constrained to the same row shardings the
        standalone gather produces."""
        from protein_transformer_tpu.data.device_store import (
            gather_batch_fields)
        from protein_transformer_tpu.protein.vocab import VOCAB
        fields = gather_batch_fields(store, idx, lb=lb, pad_id=VOCAB.pad_id,
                                     mesh=self.mesh)
        # Measured (r4, flagship B=8 L=256): the in-jit gather costs ~0.1 ms
        # over the host-batch step (7.41 vs 7.31 ms p50); an
        # optimization_barrier around the gathered fields is neutral, so
        # none is used. (An apparent "+5 ms fused-step regression" was a
        # batch-size artifact: the residue-budget sampler builds B=16
        # batches at L=256 while the raw bench uses B=8.)
        if self.mesh is not None:
            from protein_transformer_tpu.parallel.mesh import batch_sharding
            sh = batch_sharding(self.mesh)
            fields = tuple(jax.lax.with_sharding_constraint(f, sh)
                           for f in fields)
        # n_res recomputed in-graph (gather pads dead/overflow rows with
        # pad_id, so this equals the host plan's n_res) -- a traced value,
        # not the host path's python int, but safe for any future in-jit
        # consumer.
        n_res = jnp.sum(fields[0] != VOCAB.pad_id).astype(jnp.int32)
        return Batch(*fields, n_res=n_res)

    def _train_store_step_fn(self):
        """Fused batch-gather + training step: ONE jit dispatch per step on
        the device-resident data path (the host ships only the index
        vector). Halves the per-step dispatch overhead vs gather-then-step;
        the batch never round-trips through a standalone gather output."""
        body = self._train_body()

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("lb",))
        def step(state_params, opt_state, step_no, store, idx, rng,
                 lr_scale, *, lb):
            batch = self._gathered_batch(store, idx, lb)
            return body(state_params, opt_state, step_no, batch, rng,
                        lr_scale)

        return step

    def _eval_body(self):
        cfg, model = self.cfg, self.model

        def step(params, batch: Batch, with_rmsd=True):
            _, out = compute_losses(model, params, batch, cfg,
                                    deterministic=True, with_drmsd=True,
                                    with_rmsd=with_rmsd)
            return pack_metrics(out)

        return step

    def _eval_step_fn(self):
        return functools.partial(jax.jit, static_argnames=("with_rmsd",))(
            self._eval_body())

    def _eval_store_step_fn(self):
        """Fused batch-gather + eval step (see _train_store_step_fn)."""
        body = self._eval_body()

        @functools.partial(jax.jit, static_argnames=("lb",))
        def step(params, store, idx, *, lb):
            return body(params, self._gathered_batch(store, idx, lb))

        return step

    def _grad_probe_fn(self):
        cfg, model = self.cfg, self.model

        @jax.jit
        def fn(params, batch: Batch, rng):
            def loss_fn(p):
                loss, _ = compute_losses(
                    model, p, batch, cfg, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(rng, 0),
                          "sampling": jax.random.fold_in(rng, 1)})
                return loss

            return jax.grad(loss_fn)(params)

        return fn

    def _probe_gradients(self, state: TrainState):
        """Gradient pytree on a per-epoch random train batch with dropout
        ON -- the epoch-cadence analogue of the reference's
        wandb.watch(model) gradient histograms (train.py:616-667): torch
        hooks autograd per backward (dropout-on training gradients over the
        epoch's data); here one extra fwd+bwd per epoch samples the same
        distribution. Resampling per epoch (seeded by the step count, so
        every process picks the same rows) keeps the histogram tracking
        gradient drift instead of freezing on one fixed batch."""
        from protein_transformer_tpu.data.dataset import collate
        fn = self._jit_cache.setdefault("grad_probe", self._grad_probe_fn())
        n = min(self.cfg.batch_size, len(self.dm.train))
        rng_np = np.random.default_rng(self.cfg.seed + int(state.step))
        idx = rng_np.choice(len(self.dm.train), size=n, replace=False)
        batch = collate(self.dm.train, idx, self.cfg.bucket_sizes,
                        self.dm.max_seq_len,
                        batch_multiple=self.dm.batch_multiple)
        rng = jax.random.fold_in(self.rng, int(state.step))
        return fn(state.params, shard_batch(batch, self.mesh), rng)

    # ---------------- structure logging ----------------

    def _structure_coords_fn(self):
        model = self.model

        @jax.jit
        def fn(params, seq, ang):
            from protein_transformer_tpu.protein.geometry import (
                build_coords_batch)
            pred = model.apply(params, seq, ang, deterministic=True)
            return build_coords_batch(L.inverse_trig_transform(pred), seq)

        return fn

    def _log_structure(self, state, batch, step: int, name: str = "train"):
        """Rebuild + write the last batch item's structure (log.py:200-206),
        off the critical path via the async StructureLogger."""
        fn = self._jit_cache.setdefault("struct", self._structure_coords_fn())
        real = int(batch.protein_mask.sum())
        idx = max(real - 1, 0)
        crd = fn(state.params, jnp.asarray(batch.seq[idx:idx + 1]),
                 jnp.asarray(batch.ang[idx:idx + 1]))
        # hand the DEVICE array to the async logger; the host fetch (a full
        # link RTT) happens on its worker thread, not the train loop
        self.structure_logger.log(step, name, batch.seq[idx], crd[0],
                                  batch.crd[idx], batch.crd_mask[idx])

    def _log_validation_structures(self, state, step_i: int):
        """Predict + log the middle item of each validation split
        (do_train_batch_logging, log.py:188-206)."""
        from protein_transformer_tpu.data.dataset import collate
        for split, ds in self.dm.eval_splits.items():
            if split == "test" or len(ds) == 0:
                continue
            idx = np.array([len(ds) // 2])
            batch = collate(ds, idx, self.cfg.bucket_sizes,
                            self.dm.max_seq_len,
                            batch_multiple=self.dm.batch_multiple)
            self._log_structure(state, batch, step_i,
                                name=f"V{split.split('-')[-1]}")

    # ---------------- epoch loops ----------------

    def _current_lr(self, step: int) -> float:
        if self.lr_schedule is not None:
            return float(self.lr_schedule(step))
        scale = self.plateau.scale if self.plateau else 1.0
        return self.cfg.learning_rate * scale

    def _process_train_outputs(self, out_host, pred_out,
                               batch, step_i: int, t_dispatch: float,
                               logger) -> None:
        """Host-side per-batch bookkeeping: metric recording, CSV/wandb
        logging, NaN watchdog. Runs behind the device on already-fetched
        host values (see train_epoch); structure artifacts are dispatched
        from the step loop itself."""
        cfg = self.cfg
        if not np.isfinite(out_host["loss"]):
            raise FloatingPointError(
                "A nan loss has occurred. Exiting training.")
        self.metrics["history-lr"].append(self._current_lr(step_i))
        self.metrics = M.update_batch(self.metrics, "train", out_host,
                                      batch.n_res, now=t_dispatch)
        self.batch_status.update_train(self.metrics)
        if logger:
            logger.log(self.metrics, "train", self.start_time)
        if (self.wandb_run is not None
                and step_i % max(cfg.log_wandb_step, 1) == 0):
            W.log_train_batch(self.wandb_run, out_host,
                              int(batch.protein_mask.sum()),
                              self.metrics["train"]["speed"],
                              lr=self.metrics["history-lr"][-1])
            if pred_out is not None:
                # predicted-angle histograms on the wandb cadence
                # (log.py:210-227)
                W.log_angle_histograms(self.wandb_run, np.asarray(pred_out),
                                       batch.seq, cfg.pad_id)
    def _device_stream(self, split_obj, store, index_iter):
        """(meta, (store, plan)) pairs for the fused device-data path. meta
        is a LazyBatch: host n_res/protein_mask eagerly (loop bookkeeping
        never syncs on the device), array fields gathered on demand. The
        actual batch assembly happens INSIDE the fused step jit."""
        cfg = self.cfg
        for idx in index_iter:
            plan = self._DS.plan_batch(split_obj, idx, cfg.bucket_sizes,
                                       self.dm.max_seq_len,
                                       self.dm.batch_multiple)
            yield self._DS.LazyBatch(store, plan), (store, plan)

    def _host_stream(self, batch_iter):
        """(host-batch, device-batch) pairs via collate + transfer, with the
        put overlapped on the prefetch thread."""
        return prefetch(batch_iter, size=2,
                        transform=lambda b: (b, shard_batch(b, self.mesh)))

    def _eval_store(self, split: str):
        if split not in self._eval_stores:
            self._eval_stores[split] = self._DS.DeviceStore(
                self.dm.eval_splits[split], self.mesh)
        return self._eval_stores[split]

    def _eval_batch_stream(self, split: str):
        """Eval batches for a split via whichever data path is active."""
        if self.use_device_data:
            return self._device_stream(self.dm.eval_splits[split],
                                       self._eval_store(split),
                                       self.dm.eval_index_batches(split))
        return self.dm.eval_batches(split)

    def train_epoch(self, state: TrainState, logger) -> TrainState:
        cfg = self.cfg
        self.metrics = M.reset_for_epoch(self.metrics, "train")
        if self.train_store is not None:
            train_store_step = self._jit_cache.setdefault(
                "train_store", self._train_store_step_fn())
        else:
            train_step = self._jit_cache.setdefault("train",
                                                    self._train_step_fn())
        step_i = int(state.step)  # host-side step counter (no device syncs)
        rng_np = np.random.default_rng(cfg.seed + step_i)
        lr_scale = jnp.asarray(self.plateau.scale if self.plateau else 1.0,
                               jnp.float32)
        if self.train_store is not None:
            batches = self._device_stream(
                self.dm.train, self.train_store,
                self.dm.train_index_batches(rng_np))
        else:
            batches = self._host_stream(self.dm.train_batches(rng_np))
        # Software pipeline: keep up to FLUSH_EVERY dispatched steps in
        # flight; each step's packed metric vector starts an ASYNC
        # device->host copy at dispatch time (copy_to_host_async), so by
        # flush time the values are already host-side and np.asarray costs
        # ~nothing -- the link RTT rides behind device compute instead of
        # stalling the loop. The NaN watchdog does NOT wait for the flush:
        # every iteration _check_ready polls the oldest in-flight rows
        # non-blockingly (is_ready + the already-started async copy), so a
        # non-finite loss at step N aborts within ~1-2 dispatches -- the
        # reference's abort-on-offending-batch semantics (log.py:183-185) --
        # while CSV rows still drain on the window cadence.
        # pending entries: [out, pred, batch, step_i, host_row|None]
        pending: list = []
        t_last_flush = time.time()
        prof = LoopProfiler() if os.environ.get("PTT_LOOP_PROFILE") else None
        t_epoch0 = time.perf_counter()

        def check_ready():
            for j, p in enumerate(pending):
                if p[4] is not None:
                    continue
                out = p[0]
                ready = getattr(out, "is_ready", None)
                if ready is not None and not ready():
                    break  # steps execute in dispatch order; later ones wait
                p[4] = np.asarray(out)
                if not np.isfinite(p[4][0]):  # METRIC_KEYS[0] == "loss"
                    # Drain the finite rows preceding the NaN before aborting
                    # so their CSV/wandb records aren't dropped -- the
                    # reference logs every batch before its abort
                    # (log.py:183-185). Rows 0..j-1 are already fetched
                    # (this loop fills p[4] in dispatch order).
                    t_now = time.time()
                    dt = (t_now - t_last_flush) / max(j, 1)
                    for i, (_, pred, b, s_i, row) in enumerate(pending[:j]):
                        self._process_train_outputs(
                            unpack_metrics(row), pred, b, s_i,
                            t_last_flush + (i + 1) * dt, logger)
                    raise FloatingPointError(
                        "A nan loss has occurred. Exiting training.")

        def flush():
            nonlocal pending, t_last_flush
            # rows the watchdog has not already copied are fetched as ONE
            # stacked device array: per-row np.asarray pays a full link RTT
            # per row on a tunnel-attached host (measured 10.5 ms/step at
            # window 32 -- the whole wall-vs-device residue), the stacked
            # fetch pays one dispatch + one RTT for the window
            missing = [p[0] for p in pending if p[4] is None]
            if missing:
                if prof:  # split drain-wait (device still executing) from
                    t_d0 = time.perf_counter()  # the host fetch itself
                    jax.block_until_ready(missing[-1])
                    prof.add("flush:drain-wait", time.perf_counter() - t_d0)
                rows = np.asarray(jnp.stack(missing))
                it = iter(rows)
                for p in pending:
                    if p[4] is None:
                        p[4] = next(it)
            fetched = [p[4] for p in pending]
            # honest residues/sec under run-ahead dispatch: the window's
            # wall time (previous flush -> all K steps complete) is spread
            # evenly over its batches
            t_now = time.time()
            dt = (t_now - t_last_flush) / max(len(pending), 1)
            for i, (row, (_, pred, b, s_i, _r)) in enumerate(
                    zip(fetched, pending)):
                self._process_train_outputs(
                    unpack_metrics(row), pred, b, s_i,
                    t_last_flush + (i + 1) * dt, logger)
            t_last_flush = t_now
            pending = []

        batch_it = iter(batches)
        while True:
            t0 = time.perf_counter()
            nxt = next(batch_it, None)
            if nxt is None:
                break
            batch, payload = nxt
            if prof:
                t1 = time.perf_counter()
                prof.add("plan/collate", t1 - t0)
                prof.steps += 1
                t0 = t1
            if isinstance(payload, Batch):
                params, opt_state, step_no, out, pred_out = train_step(
                    state.params, state.opt_state, state.step, payload,
                    self.rng, lr_scale)
            else:
                store, plan = payload
                # idx goes in as numpy: pjit replicates it onto the mesh
                # (multi-process-safe; jnp.asarray would pin local dev 0)
                params, opt_state, step_no, out, pred_out = \
                    train_store_step(
                        state.params, state.opt_state, state.step,
                        store.store, plan.idx_padded,
                        self.rng, lr_scale, lb=plan.lb)
            state = TrainState(params, opt_state, step_no)
            try:
                out.copy_to_host_async()
            except AttributeError:  # non-jax array (host fallback paths)
                pass
            if prof:
                t1 = time.perf_counter()
                prof.add("dispatch", t1 - t0)
                t0 = t1
            pending.append([out, pred_out, batch, step_i, None])
            check_ready()
            if prof:
                t1 = time.perf_counter()
                prof.add("watchdog poll", t1 - t0)
                t0 = t1
            # Structure artifacts render at DISPATCH time so the logged
            # params are the ones labeled with step_i (one optimizer update
            # ahead of the batch's forward pass, not FLUSH_EVERY of them).
            if (cfg.log_structure_step
                    and step_i % cfg.log_structure_step == 0):
                self._log_structure(state, batch, step_i)
            if (cfg.log_val_struct_step
                    and step_i % cfg.log_val_struct_step == 0):
                self._log_validation_structures(state, step_i)
            if prof:
                t1 = time.perf_counter()
                prof.add("structure log", t1 - t0)
                t0 = t1
            step_i += 1
            if len(pending) >= self.FLUSH_EVERY:
                flush()
            if prof:
                prof.add("flush/CSV", time.perf_counter() - t0)
        t0 = time.perf_counter()
        if pending:
            flush()
        if prof:
            prof.add("flush/CSV", time.perf_counter() - t0)
            print(prof.report(time.perf_counter() - t_epoch0),
                  file=sys.stderr)
        self.batch_status.clear()
        self.metrics = M.end_of_epoch(self.metrics, "train")
        return state

    def eval_epoch(self, params, mode: str,
                   batches, logger) -> None:
        """batches: an iterator of host Batch objects (collate path) or of
        (LazyBatch, (store, plan)) pairs (device-store path, see
        _device_stream)."""
        self.metrics = M.reset_for_epoch(self.metrics, mode)
        eval_step = self._jit_cache.setdefault("eval", self._eval_step_fn())
        it = iter(batches)
        first = next(it, None)
        chained = (itertools.chain([first], it) if first is not None
                   else iter(()))
        # host Batch objects need the prefetch+transfer wrapper; the device
        # path already yields (LazyBatch, (store, plan)) pairs
        prefetched = (self._host_stream(chained)
                      if isinstance(first, Batch) else chained)
        pending: list = []
        t_last_flush = time.time()

        def flush():
            nonlocal pending, t_last_flush
            # one stacked fetch for the window (see train_epoch.flush)
            fetched = (list(np.asarray(jnp.stack([p[0] for p in pending])))
                       if pending else [])
            t_now = time.time()
            dt = (t_now - t_last_flush) / max(len(pending), 1)
            for i, (row, (_, n_res)) in enumerate(zip(fetched, pending)):
                self.metrics = M.update_batch(self.metrics, mode,
                                              unpack_metrics(row), n_res,
                                              now=t_last_flush + (i + 1) * dt)
            self.batch_status.update_eval(mode, self.metrics)
            t_last_flush = t_now
            pending = []

        for batch, payload in prefetched:
            if isinstance(payload, Batch):
                out = eval_step(params, payload)
            else:
                # built lazily on the first tuple payload: dispatch is by
                # payload type, so a device stream works regardless of which
                # flag (use_device_data vs train_store) gated the caller.
                # Guarded (not setdefault) so the closure + jit wrapper isn't
                # rebuilt and discarded on every batch after the first.
                if "eval_store" not in self._jit_cache:
                    self._jit_cache["eval_store"] = self._eval_store_step_fn()
                eval_store_step = self._jit_cache["eval_store"]
                store, plan = payload
                out = eval_store_step(params, store.store,
                                      plan.idx_padded, lb=plan.lb)
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((out, batch.n_res))
            if len(pending) >= self.FLUSH_EVERY:
                flush()
        if pending:
            flush()
        self.batch_status.clear()
        self.metrics = M.end_of_epoch(self.metrics, mode)
        if logger:
            logger.log(self.metrics, mode, self.start_time,
                       end_of_epoch=True)
        W.log_eval_epoch(self.wandb_run, mode, self.metrics[mode])
        W.log_final_epoch_summary(self.wandb_run, mode, self.metrics[mode])

    # ---------------- checkpointing ----------------

    def _monitored_metric(self) -> float:
        cfg = self.cfg
        return self.metrics[cfg.es_mode][f"epoch-{cfg.es_metric}-full"]

    def _save_checkpoint(self, state: TrainState, epoch: int,
                         cur_loss: float, history: list) -> None:
        modifier = checkpoint_policy(cur_loss, history,
                                     self.metrics["last_chkpt_time"],
                                     self.cfg.checkpoint_time_interval,
                                     process_count=self.process_count)
        if modifier is None:
            return
        arrays = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        meta = {"epoch": epoch,
                "elapsed": time.time() - self.start_time,
                "plateau": (self.plateau.state_dict()
                            if self.plateau else {}),
                "early_stop": self.early_stop.state_dict(),
                "best_history": list(history)}
        self.ckpt.save(modifier, arrays, meta)
        self.metrics["last_chkpt_time"] = time.time()
        W.log_checkpoint_summary(self.wandb_run, modifier, cur_loss, epoch,
                                 self.metrics, self.cfg.train_only)
        print(f"    - [Info] checkpoint '{modifier}' updated.")

    # ---------------- main loop ----------------

    def train(self, state: Optional[TrainState] = None) -> TrainState:
        cfg = self.cfg
        if state is None:
            state = self.init_state()
            state = self.maybe_restore(state)
        # Host-side sinks (wandb, CSV) write from process 0 only; metric
        # scalars are replicated across processes so nothing is lost.
        if (self.wandb_run is None and cfg.use_wandb
                and self.process_index == 0):
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree.leaves(state.params))
            self.wandb_run = W.try_init_wandb(cfg, n_params,
                                              self.dm.angle_means)
            self.structure_logger.wandb_run = self.wandb_run
            W.save_model_txt(self.wandb_run, self.model, self.out_dir)
            W.mirror_run_files(self.wandb_run, self.out_dir)
        logger = M.CsvLogger(
            os.path.join(self.out_dir, (cfg.name or "run") + ".train"),
            cfg.loss, resume=self.start_epoch > 0) \
            if self.process_index == 0 else None
        history: list = getattr(self, "_best_history", [])

        from protein_transformer_tpu.utils import maybe_profile
        for epoch in range(self.start_epoch, cfg.epochs):
            print(f"[ Epoch {epoch} ]")
            start = time.time()
            # capture a device trace of the first trained epoch if requested
            with maybe_profile(cfg.profile_dir if epoch == self.start_epoch
                               else None):
                state = self.train_epoch(state, logger)
            if cfg.eval_train:
                te_rng = np.random.default_rng(epoch)
                te_batches = (self._device_stream(
                    self.dm.train, self.train_store,
                    self.dm.train_eval_index_batches(te_rng))
                    if self.train_store is not None
                    else self.dm.train_eval_batches(te_rng))
                self.eval_epoch(state.params, "train", te_batches, logger)
            M.print_epoch_status("train", self.metrics, start)
            if logger:
                logger.log(self.metrics, "train", self.start_time,
                           end_of_epoch=True)
            W.log_final_epoch_summary(self.wandb_run, "train",
                                      self.metrics["train"])
            if cfg.use_wandb:
                # epoch-cadence parameter + gradient histograms (wandb.watch
                # analogue). The probe is a jitted collective over globally
                # sharded params/batch, so EVERY process must dispatch it --
                # gating on wandb_run (process 0 only) would deadlock a
                # multi-process run at the first epoch end. Only the sink is
                # process-0-only; leaves are fetched inside watch_params so
                # multi-host tensor-parallel shards it cannot address are
                # skipped rather than crashing a jax.device_get here.
                grads = self._probe_gradients(state)
                if self.wandb_run is not None:
                    W.watch_params(self.wandb_run, state.params, grads=grads)

            if not cfg.train_only:
                for split in self.dm.eval_splits:
                    if split == "test":
                        continue
                    start = time.time()
                    self.eval_epoch(state.params, split,
                                    self._eval_batch_stream(split), logger)
                    M.print_epoch_status(split, self.metrics, start)
                W.log_avg_validation(self.wandb_run, self.metrics,
                                     [s for s in self.dm.eval_splits
                                      if s != "test"])

            # LR plateau scheduling on the monitored metric (train.py:166-167)
            monitored = self._monitored_metric()
            if self.plateau is not None:
                self.plateau.step(monitored)

            # Early stopping (log.py:92-112)
            history.append(monitored)
            stop = self.early_stop.update(epoch, monitored)
            self._save_checkpoint(state, epoch, monitored, history)
            if stop:
                print(f"No improvement for {cfg.early_stopping} epochs. "
                      "Stopping model training early.")
                W.log_early_stop(self.wandb_run)
                break

        if not cfg.train_only and "test" in self.dm.eval_splits:
            start = time.time()
            self.eval_epoch(state.params, "test",
                            self._eval_batch_stream("test"), logger)
            M.print_epoch_status("test", self.metrics, start)
        if logger:
            logger.close()
        self.structure_logger.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()
        return state
