"""Shared training machinery: state, schedules, checkpoints, logging.

Replaces the per-driver boilerplate of the 8 reference train scripts:
Adam/AdamW + epoch-step or warmup+cosine LR schedules (stepped without
recompilation via optax.inject_hyperparams), torch-style BN momentum
schedule, checkpoint save/restore with cross-stage partial restore
(the `strict=False` grafting BR -> CenterRefine relies on,
`train_Votenet_BR_CenterRefine.py:213-218`), and a rank-aware logger.
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import sys
import typing as tp

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct, serialization


def init_multihost():
    """Multi-host rendezvous — the torch `env://` analog
    (`train_GF_FSB.py:450-453`). On managed clusters
    `jax.distributed.initialize()` auto-detects (SLURM/GKE); for
    manual launches set BTR_COORDINATOR (host:port),
    BTR_NUM_PROCESSES and BTR_PROCESS_ID, mirroring torch's
    MASTER_ADDR/WORLD_SIZE/RANK."""
    coord = os.environ.get("BTR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["BTR_NUM_PROCESSES"]),
            process_id=int(os.environ["BTR_PROCESS_ID"]))
    else:
        jax.distributed.initialize()
    if jax.process_count() > 1:
        # Establish the cross-process collective context NOW, while the
        # ranks are still in lockstep. XLA's gloo key-value exchange has
        # a fixed ~30 s deadline; deferring context creation to the
        # first post-compile collective lets multi-minute first-compile
        # skew between ranks blow that deadline (observed on shared-CPU
        # hosts). A barrier here costs one trivial program.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("btr:init_multihost")


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: driver restarts (resume,
    multi-stage recipes) reuse compiled executables instead of paying
    minutes of AOT compilation per process."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_compilation_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except (AttributeError, ValueError):
        pass  # older jax without these options


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: tp.Any
    batch_stats: tp.Any
    opt_state: tp.Any


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def step_lr(base_lr: float, decay_steps: tp.Sequence[int],
            decay_rates: tp.Sequence[float]):
    """Reference epoch-step decay (`train_Votenet_FSB.py:191-201`):
    lr = base * prod(rate_i for step_i <= epoch)."""

    def schedule(epoch: int) -> float:
        lr = base_lr
        for s, r in zip(decay_steps, decay_rates):
            if epoch >= s:
                lr *= r
        return lr

    return schedule


def bn_momentum_fn(init=0.5, step=20, rate=0.5, floor=0.001):
    """`train_Votenet_FSB.py:91-95,186-189`."""

    def schedule(epoch: int) -> float:
        return max(init * rate ** (epoch // step), floor)

    return schedule


def warmup_step_lr(base_lr: float, warmup_epochs: int, warmup_factor: float,
                   decay_epochs: tp.Sequence[int], decay_rate: float,
                   steps_per_epoch: int):
    """GF-style per-iteration warmup + epoch multistep
    (`utils/lr_scheduler.py:6-87`). Returns f(global_step) -> lr."""

    def schedule(it: int) -> float:
        e = it / max(steps_per_epoch, 1)
        if e < warmup_epochs:
            alpha = e / warmup_epochs
            factor = warmup_factor * (1 - alpha) + alpha
            return base_lr * factor
        lr = base_lr
        for d in decay_epochs:
            if e >= d:
                lr *= decay_rate
        return lr

    return schedule


def cosine_lr(base_lr: float, warmup_epochs: int, warmup_factor: float,
              total_epochs: int, steps_per_epoch: int,
              eta_min: float = 0.0):
    def schedule(it: int) -> float:
        e = it / max(steps_per_epoch, 1)
        if e < warmup_epochs:
            alpha = e / warmup_epochs
            factor = warmup_factor * (1 - alpha) + alpha
            return base_lr * factor
        t = (e - warmup_epochs) / max(total_epochs - warmup_epochs, 1e-9)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + np.cos(np.pi * min(t, 1.0)))

    return schedule


def make_optimizer(kind: str = "adam", weight_decay: float = 0.0,
                   grad_clip: float | None = None, lr0: float = 1e-3):
    """Optimizer with an injectable learning rate: schedules are stepped
    host-side by swapping the hyperparam leaf — no recompiles."""
    if kind not in ("adam", "adamw"):
        raise ValueError(kind)

    def _build(learning_rate):
        inner = []
        if grad_clip is not None:
            inner.append(optax.clip_by_global_norm(grad_clip))
        if kind == "adamw" or weight_decay:
            inner.append(optax.adamw(learning_rate,
                                     weight_decay=weight_decay))
        else:
            inner.append(optax.adam(learning_rate))
        return optax.chain(*inner)

    return optax.inject_hyperparams(_build)(learning_rate=lr0)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Return a TrainState with the injected learning rate replaced."""
    opt_state = state.opt_state._replace(
        hyperparams={**state.opt_state.hyperparams,
                     "learning_rate": np.float32(lr)})
    return state.replace(opt_state=opt_state)


def make_gf_optimizer(lr0, decoder_lr0,
                      weight_decay: float = 5e-4,
                      grad_clip: float = 0.1):
    """GF optimizer: AdamW with a separate decoder learning rate
    (`train_GF_FSB.py:234-244`: params whose name starts with 'decoder'
    use decoder_learning_rate) and global-norm clipping. `lr0` /
    `decoder_lr0` may be floats or optax schedules (callables of the
    step count) — schedules evaluate ON DEVICE, so per-iteration LR
    stepping costs no host round-trips."""

    def label_fn(params):
        return {k: ("decoder" if k.startswith("decoder") else "main")
                for k in params}

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {"main": optax.adamw(lr0, weight_decay=weight_decay),
             "decoder": optax.adamw(decoder_lr0,
                                    weight_decay=weight_decay)},
            label_fn),
    )


def make_gf_schedule(base_lr: float, flags, steps_per_epoch: int):
    """Reference GF scheduler as an optax schedule
    (`utils/lr_scheduler.py:65-87`): optional linear warmup from
    base/multiplier, then per-iteration MultiStep or cosine decay."""
    warmup = max(flags.warmup_epoch, 0) * steps_per_epoch
    if flags.lr_scheduler == "step":
        after = optax.piecewise_constant_schedule(
            base_lr,
            {(m - max(flags.warmup_epoch, 0)) * steps_per_epoch:
             flags.lr_decay_rate for m in flags.lr_decay_epochs})
    else:
        after = optax.cosine_decay_schedule(
            base_lr,
            max(
                (flags.max_epoch - max(flags.warmup_epoch, 0))
                * steps_per_epoch, 1),
            alpha=1e-6 / base_lr)
    if warmup <= 0:
        return after
    return optax.join_schedules(
        [optax.linear_schedule(base_lr / flags.warmup_multiplier,
                               base_lr, warmup), after],
        [warmup])


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(path, state: TrainState, epoch: int, extra=None):
    """Single-writer (process 0) msgpack checkpoint with metadata."""
    if jax.process_index() != 0:
        return
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "state": serialization.to_state_dict(
            jax.device_get(state)),
    }
    if extra:
        payload["extra"] = extra
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns (state_dict, epoch, extra) — raw trees, not TrainState."""
    blob = pathlib.Path(path).read_bytes()
    payload = serialization.msgpack_restore(blob)
    return payload["state"], payload["epoch"], payload.get("extra")


def restore_state(state: TrainState, state_dict,
                  restore_opt: bool = True) -> TrainState:
    """Strict full restore into an existing TrainState template."""
    if not restore_opt:
        state_dict = dict(state_dict)
        state_dict["opt_state"] = serialization.to_state_dict(
            jax.device_get(state)).get("opt_state")
        state_dict["step"] = serialization.to_state_dict(
            jax.device_get(state)).get("step")
    try:
        return serialization.from_state_dict(state, state_dict)
    except (KeyError, ValueError, TypeError) as e:
        raise ValueError(
            "Checkpoint does not match this stage's full TrainState "
            "(params + opt_state). Cross-stage checkpoints (e.g. a BR "
            "checkpoint into CenterRefine) and torch-imported "
            "checkpoints (opt_state={}) are weights-only: pass them "
            "via --checkpoint_path WITHOUT --resume so they are "
            f"partial-grafted instead. Underlying error: {e}"
        ) from e


def partial_restore(target_tree, source_tree, log=None):
    """The `strict=False` analog: copy every leaf whose path exists in
    both trees with a matching shape; keep the target's value elsewhere
    (new heads keep their fresh init). Works on nested dicts."""
    copied, skipped = [], []

    def merge(dst, src, prefix=""):
        out = {}
        for key, dval in dst.items():
            pref = f"{prefix}/{key}"
            if isinstance(dval, dict):
                sval = src.get(key) if isinstance(src, dict) else None
                out[key] = merge(dval, sval or {}, pref)
            else:
                sval = src.get(key) if isinstance(src, dict) else None
                if sval is not None and np.shape(sval) == np.shape(dval):
                    out[key] = jnp.asarray(sval)
                    copied.append(pref)
                else:
                    out[key] = dval
                    skipped.append(pref)
        return out

    merged = merge(target_tree, source_tree)
    if log:
        log(f"partial restore: copied {len(copied)} leaves, "
            f"kept {len(skipped)} fresh")
    return merged


class PreemptionGuard:
    """Save-on-SIGTERM for preemptible TPU workers (SURVEY.md §5.3:
    the reference has no failure handling beyond resumable
    checkpoints). Register once; update the latest state each epoch
    (and periodically mid-epoch — the drivers call update every
    `GUARD_EVERY_STEPS` so a SIGTERM on a long epoch loses at most a
    few hundred steps, not the epoch); on SIGTERM the newest snapshot
    is written before exiting, and `--resume` continues from it."""

    def __init__(self, ckpt_path, logger=None):
        import signal

        self.ckpt_path = ckpt_path
        self.logger = logger
        self.state = None
        self.epoch = -1
        self._prev = signal.signal(signal.SIGTERM, self._handler)

    def update(self, state, epoch: int):
        # Snapshot to host: the jitted train steps DONATE the state's
        # device buffers, so holding the device reference would leave
        # the SIGTERM handler with deleted arrays one step later.
        # Start all D2H copies asynchronously first so the blocking
        # device_get waits on the slowest single transfer rather than
        # issuing them serially (matters over the tunneled TPU where a
        # GF AdamW state is order-100MB across many leaves).
        for leaf in jax.tree_util.tree_leaves(state):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        self.state = jax.device_get(state)
        self.epoch = epoch

    def _handler(self, signum, frame):
        if self.state is not None:
            if self.logger:
                self.logger.info(
                    "SIGTERM: saving checkpoint at epoch %d", self.epoch)
            save_checkpoint(self.ckpt_path, self.state, self.epoch)
        raise SystemExit(143)


# ---------------------------------------------------------------------------
# Logging / metrics
# ---------------------------------------------------------------------------


def setup_logger(log_dir, name="btr", rank: int | None = None):
    """Rank-aware file+stdout logger (`utils/logger.py:30-95` analog)."""
    if rank is None:
        rank = jax.process_index()
    logger = logging.getLogger(f"{name}.{rank}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "[%(asctime)s %(name)s] %(message)s", datefmt="%H:%M:%S")
    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_dir is not None:
        pathlib.Path(log_dir).mkdir(parents=True, exist_ok=True)
        suffix = "" if rank == 0 else f".rank{rank}"
        fh = logging.FileHandler(
            os.path.join(log_dir, f"log_train.txt{suffix}"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def fetch_aux_means(aux_hist):
    """Epoch means of per-step scalar aux dicts with ONE bulk fetch:
    stacking on device first turns nb*nkeys tiny transfers (each an
    RTT on tunneled / remote devices) into nkeys — on a tunneled chip
    this is the difference between ~20 and ~100+ scenes/s of measured
    epoch throughput."""
    if not aux_hist:
        return {}
    keys = [k for k, v in aux_hist[0].items() if jnp.ndim(v) == 0]
    # one dispatch (the flat stack), one mean, one small transfer —
    # NOT nkeys stacks + nkeys per-leaf gets
    flat = jnp.stack([a[k] for a in aux_hist for k in keys])
    means = np.asarray(flat.reshape(len(aux_hist), len(keys)).mean(0))
    return dict(zip(keys, means.astype(float)))


class MetricMeter:
    """Running means of scalar stats (the reference accumulates every
    end_points key containing loss/acc/ratio,
    `train_Votenet_FSB.py:233-243`)."""

    def __init__(self):
        self.sums = {}
        self.count = 0

    def update(self, scalars: dict):
        for key, v in scalars.items():
            v = np.asarray(v)
            if v.ndim == 0:
                self.sums[key] = self.sums.get(key, 0.0) + float(v)
        self.count += 1

    def means(self):
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}

    def reset(self):
        self.sums, self.count = {}, 0


def dump_config(log_dir, flags: dict):
    if jax.process_index() == 0 and log_dir:
        path = pathlib.Path(log_dir) / "config.json"
        path.write_text(json.dumps(flags, indent=2, default=str))
