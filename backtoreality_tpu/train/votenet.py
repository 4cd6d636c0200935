"""VoteNet training drivers: FSB / WSB / BR / BR+CenterRefine.

TPU-native re-design of `train_Votenet_{FSB,WSB,BR,BR_CenterRefine}.py`:
one jitted train step over a data-parallel mesh (batch sharded on
'data', state replicated; XLA inserts the gradient all-reduce and
computes BN stats over the global batch), host-side LR/BN-momentum
schedules injected without recompilation, msgpack checkpoints with
cross-stage partial restore (BR -> CenterRefine grafting), and the
reference eval protocol every `eval_freq` epochs.

CLI flags mirror the reference scripts (`train_Votenet_FSB.py:42-66`).
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from backtoreality_tpu.data import get_config
from backtoreality_tpu.data.dataset import DetectionDataset
from backtoreality_tpu.data.loader import DetectionDataLoader, cycle
from backtoreality_tpu.eval import (
    APCalculator,
    parse_groundtruths,
    parse_predictions,
)
from backtoreality_tpu.losses import votenet as vote_losses
from backtoreality_tpu.models.votenet import (
    VoteNet,
    VoteNetDA,
    VoteNetDAJitter,
)
from backtoreality_tpu.parallel import (
    local_rows_tree,
    make_mesh,
    replicate,
    shard_batch,
)
from backtoreality_tpu.train import common
from backtoreality_tpu.train.observability import ScalarHistory

EVAL_CONFIG_DICT = dict(
    remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
    use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
    conf_thresh=0.05,
)


# model-output keys needed by host-side eval
EVAL_KEYS = (
    "center", "heading_scores", "heading_residuals", "size_scores",
    "size_residuals", "sem_cls_scores", "objectness_scores",
)


def add_common_flags(parser: argparse.ArgumentParser):
    parser.add_argument("--dataset", default="scannet_md40",
                        choices=["scannet_md40", "matterport_md40"])
    parser.add_argument("--data_root", default="data",
                        help="directory containing the *_detection_data"
                             " exports (synthetic fixtures accepted)")
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--log_dir", default="log_votenet")
    parser.add_argument("--num_point", type=int, default=40000)
    parser.add_argument("--num_target", type=int, default=256)
    parser.add_argument("--vote_factor", type=int, default=1)
    parser.add_argument("--cluster_sampling", default="vote_fps")
    parser.add_argument("--ap_iou_thresh", type=float, default=0.25)
    parser.add_argument("--max_epoch", type=int, default=180)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--bn_decay_step", type=int, default=20)
    parser.add_argument("--bn_decay_rate", type=float, default=0.5)
    parser.add_argument("--lr_decay_steps", default="80,120,160")
    parser.add_argument("--lr_decay_rates", default="0.1,0.1,0.1")
    parser.add_argument("--no_height", action="store_true")
    parser.add_argument("--use_color", action="store_true")
    parser.add_argument("--eval_freq", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--query_mode", default="stratified",
                        choices=["stratified", "exact"])
    parser.add_argument("--fps_candidates", type=int, default=None,
                        help="subset-FPS at SA1: sample from the first"
                             " K (pre-shuffled) points; ~5x faster"
                             " FPS at K=8192")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 model compute (f32 params/stats)")
    parser.add_argument("--f32_tail", type=int, default=0,
                        help="with --bf16: run the last N backbone"
                             " stages (fp2, fp1, sa4, ...) in f32."
                             " These stages carry <2%% of the HBM"
                             " traffic but feed the classification"
                             " heads, where bf16's quality deficit"
                             " concentrates")
    parser.add_argument("--bn_recal_batches", type=int, default=None,
                        help="train-mode batches to refresh BN running"
                             " stats before each eval (default 20 with"
                             " --bf16, else 0): bf16 weight drift after"
                             " the BN-momentum floor staleness-shifts"
                             " frozen stats")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for"
                             " multi-host meshes (env-configured"
                             " coordinator, like torch's env://)")
    parser.add_argument("--resume", action="store_true",
                        help="restore optimizer state + epoch from"
                             " --checkpoint_path and continue")
    parser.add_argument("--guard_every_steps", type=int, default=100,
                        help="mid-epoch preemption-snapshot cadence in"
                             " steps (0 disables; each snapshot is a"
                             " blocking full-state host fetch)")
    parser.add_argument("--profile_dir", default=None,
                        help="jax.profiler trace dir (traces steps"
                             " 10-15 of the first epoch)")
    parser.add_argument("--ram_cache_gb", type=float, default=8.0,
                        help="per-dataset RAM cache budget for raw scan"
                             " arrays (0 disables caching)")
    return parser


def _cache_kw(flags) -> dict:
    gb = getattr(flags, "ram_cache_gb", 8.0)
    if gb <= 0:
        return dict(ram_cache=False)
    return dict(ram_cache=True, ram_cache_bytes=int(gb * 2**30))


def _input_dim(flags) -> int:
    return int(not flags.no_height) + 3 * int(flags.use_color)


def build_model(flags, cfg, kind="plain"):
    kwargs = dict(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        input_feature_dim=_input_dim(flags),
        num_proposal=flags.num_target,
        vote_factor=flags.vote_factor,
        sampling=flags.cluster_sampling,
        query_mode=flags.query_mode,
        fps_candidates=getattr(flags, "fps_candidates", None),
        dtype=jnp.bfloat16 if getattr(flags, "bf16", False)
        else jnp.float32,
        f32_tail=getattr(flags, "f32_tail", 0),
    )
    if kind == "plain":
        return VoteNet(**kwargs)
    if kind == "da":
        return VoteNetDA(**kwargs)
    if kind == "da_jitter":
        return VoteNetDAJitter(**kwargs)
    raise ValueError(kind)


def init_state(model, optimizer, sample_args, rng):
    # jit the init: unjitted tracing dispatches thousands of tiny ops
    # individually (minutes over a tunneled device); one compiled
    # program initialises in seconds
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(rng, *sample_args)
    params = variables["params"]
    return common.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )


def _scalars(aux):
    return {k: v for k, v in aux.items()
            if hasattr(v, "ndim") and v.ndim == 0}


def make_train_step(model, optimizer, criterion, cfg, *, jitter=False):
    """Single-dataset train step (FSB/WSB)."""

    def step_fn(state, batch, rng, bn_momentum):
        # fold the per-step key in-graph: a separate host-dispatched
        # fold_in program between steps costs a program-switch bubble
        # (~tens of ms on remote devices)
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            args = (batch["point_clouds"],)
            if jitter:
                args += (batch["center_label"], batch["sem_cls_label"])
            outs, mut = model.apply(
                variables, *args, rng, train=True,
                bn_momentum=bn_momentum, mutable=["batch_stats"])
            ep = {**batch, **outs}
            loss, aux = criterion(ep, cfg)
            return loss, (aux, mut["batch_stats"])

        grads, (aux, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt)
        return new_state, _scalars(aux)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_da_train_step(model, optimizer, cfg, *, jitter=False):
    """Two-domain train step (BR / BR+CenterRefine)."""

    def step_fn(state, batch_S, batch_T, rng, bn_momentum, epoch):
        rng = jax.random.fold_in(rng, state.step)  # see make_train_step
        rng_S, rng_T = jax.random.split(rng)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}

            def forward(variables, batch, key):
                args = (batch["point_clouds"],)
                if jitter:
                    args += (batch["center_label"],
                             batch["sem_cls_label"])
                return model.apply(
                    variables, *args, key, train=True,
                    bn_momentum=bn_momentum, mutable=["batch_stats"])

            outs_S, mut = forward(vs, batch_S, rng_S)
            vs2 = {"params": params, "batch_stats": mut["batch_stats"]}
            outs_T, mut2 = forward(vs2, batch_T, rng_T)
            ep_S = {**batch_S, **outs_S}
            ep_T = {**batch_T, **outs_T}
            if jitter:
                loss, aux = vote_losses.get_loss_DA_jitter(
                    ep_S, ep_T, epoch, cfg)
            else:
                loss, aux = vote_losses.get_loss_DA(ep_S, ep_T, cfg)
            return loss, (aux, mut2["batch_stats"])

        grads, (aux, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt)
        return new_state, _scalars(aux)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_recal_step(model, *, jitter=False):
    """Train-mode forward updating only batch_stats (BN recalibration)."""

    def recal_fn(state, batch, bn_momentum):
        args = (batch["point_clouds"],)
        if jitter:
            args += (batch["center_label"], batch["sem_cls_label"])
        _, mut = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *args, None, train=True, bn_momentum=bn_momentum,
            mutable=["batch_stats"])
        return state.replace(batch_stats=mut["batch_stats"])

    return jax.jit(recal_fn)


def recalibrate_bn(state, loader, recal_step, mesh, num_batches,
                   momentum=0.2):
    """Refresh BN running stats from train-mode forwards."""
    if num_batches <= 0:
        return state
    done = 0
    bnm = np.float32(momentum)
    while done < num_batches:
        for batch in loader:
            state = recal_step(state, shard_batch(batch, mesh), bnm)
            done += 1
            if done >= num_batches:
                break
        else:
            continue
        break
    return state


def make_eval_step(model, criterion, cfg, *, jitter=False):
    def eval_fn(state, batch, rng):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        args = (batch["point_clouds"],)
        if jitter:
            args += (batch["center_label"], batch["sem_cls_label"])
        outs = model.apply(variables, *args, rng, train=False)
        ep = {**batch, **outs}
        loss, aux = criterion(ep, cfg)
        pred = {k: outs[k] for k in EVAL_KEYS}
        return pred, _scalars(aux)

    return jax.jit(eval_fn)


def evaluate(state, loader, eval_step, cfg, mesh, logger,
             ap_iou_thresh=0.25, rng=None):
    config_dict = dict(EVAL_CONFIG_DICT, dataset_config=cfg)
    calc = APCalculator(ap_iou_thresh, cfg.class2type)
    meter = common.MetricMeter()
    if rng is None:
        rng = jax.random.PRNGKey(0)
    for batch in loader:
        dev_batch = shard_batch(batch, mesh)
        pred, aux = eval_step(state, dev_batch, rng)
        meter.update(jax.device_get(aux))
        # multi-process: each process scores ITS loader shard (the
        # reference's per-rank evaluate over DistributedSampler shards,
        # `train_GF_FSB.py:354-447`); rank 0 logs
        pred_np = local_rows_tree(pred)
        calc.step(parse_predictions(pred_np, config_dict),
                  parse_groundtruths(batch, config_dict))
    metrics = calc.compute_metrics()
    means = meter.means()
    if logger:
        logger.info("eval loss: %s",
                    {k: round(v, 4) for k, v in means.items()
                     if "loss" in k})
        logger.info("eval mAP@%.2f: %.4f  AR: %.4f", ap_iou_thresh,
                    metrics["mAP"], metrics["AR"])
    return metrics, means


def _train_loop_single(flags, recipe):
    """FSB (full labels) / WSB (weak, center-jittered labels)."""
    if getattr(flags, "multihost", False):
        common.init_multihost()
    common.enable_compilation_cache()
    cfg = get_config(flags.dataset)
    logger = common.setup_logger(flags.log_dir)
    common.dump_config(flags.log_dir, vars(flags))
    mesh = make_mesh(flags.num_devices)

    jitter = 0.0 if recipe == "fsb" else flags.center_jitter
    train_ds = DetectionDataset(
        cfg, flags.data_root, split=flags.train_split,
        num_points=flags.num_point, use_color=flags.use_color,
        use_height=not flags.no_height, augment=True,
        center_jitter=jitter, seed=flags.seed, **_cache_kw(flags))
    val_ds = DetectionDataset(
        cfg, flags.val_data_root or flags.data_root,
        split=flags.val_split, num_points=flags.num_point,
        use_color=flags.use_color, use_height=not flags.no_height,
        augment=False, seed=flags.seed, **_cache_kw(flags))
    nshard, ishard = jax.process_count(), jax.process_index()
    train_loader = DetectionDataLoader(
        train_ds, flags.batch_size, seed=flags.seed,
        num_shards=nshard, shard_index=ishard)
    val_loader = DetectionDataLoader(
        val_ds, flags.batch_size, shuffle=False, drop_last=False,
        num_shards=nshard, shard_index=ishard)
    logger.info("train scans: %d, val scans: %d", len(train_ds),
                len(val_ds))

    model = build_model(flags, cfg)
    optimizer = common.make_optimizer(
        "adam", flags.weight_decay, lr0=flags.learning_rate)
    criterion = (vote_losses.get_loss if recipe == "fsb"
                 else vote_losses.get_loss_weak)

    rng = jax.random.PRNGKey(flags.seed)
    sample = next(iter(train_loader))
    state = init_state(model, optimizer,
                       (jnp.asarray(sample["point_clouds"][:1]),), rng)
    start_epoch = 0
    if flags.checkpoint_path:
        sd, ckpt_epoch, _ = common.load_checkpoint(flags.checkpoint_path)
        state = common.restore_state(state, sd,
                                     restore_opt=flags.resume)
        if flags.resume:
            start_epoch = ckpt_epoch + 1
        logger.info("restored %s from %s (epoch %d)",
                    "full state" if flags.resume else "weights",
                    flags.checkpoint_path, ckpt_epoch)
    state = replicate(state, mesh)
    history = ScalarHistory(flags.log_dir)

    train_step = make_train_step(model, optimizer, criterion, cfg)
    eval_step = make_eval_step(model, criterion, cfg)
    recal_step = make_recal_step(model)
    recal_batches = flags.bn_recal_batches
    if recal_batches is None:
        recal_batches = 20 if flags.bf16 else 0

    lr_fn = common.step_lr(
        flags.learning_rate,
        [int(x) for x in flags.lr_decay_steps.split(",")],
        [float(x) for x in flags.lr_decay_rates.split(",")])
    bn_fn = common.bn_momentum_fn(step=flags.bn_decay_step,
                                  rate=flags.bn_decay_rate)

    ckpt_path = (flags.log_dir + "/checkpoint.tar")
    guard = common.PreemptionGuard(ckpt_path, logger)
    guard_every = max(0, getattr(flags, 'guard_every_steps', 100))
    host_step = 0
    for epoch in range(start_epoch, flags.max_epoch):
        state = common.set_learning_rate(state, lr_fn(epoch))
        bnm = np.float32(bn_fn(epoch))
        train_loader.set_epoch(epoch)
        t0 = time.time()
        nb = 0
        aux_hist = []
        for batch in train_loader:
            dev_batch = shard_batch(batch, mesh)
            host_step += 1
            if flags.profile_dir and host_step == 10:
                jax.profiler.start_trace(flags.profile_dir)
            state, aux = train_step(state, dev_batch, rng, bnm)
            if flags.profile_dir and host_step == 15:
                jax.block_until_ready(aux["loss"])
                jax.profiler.stop_trace()
            # defer the (blocking) metric fetch to the epoch boundary —
            # per-step device_get round-trips dominate wall clock on
            # remote/tunneled devices
            aux_hist.append(aux)
            nb += 1
            if guard_every and nb % guard_every == 0:
                guard.update(state, epoch - 1)  # see _train_loop_da
        means = common.fetch_aux_means(aux_hist)
        dt = time.time() - t0
        logger.info(
            "epoch %03d lr %.2e bnm %.3f loss %.4f obj_acc %.3f "
            "(%d batches, %.1fs, %.2f scenes/s)",
            epoch, lr_fn(epoch), bn_fn(epoch),
            means.get("loss", float("nan")),
            means.get("obj_acc", float("nan")), nb, dt,
            nb * flags.batch_size / max(dt, 1e-9))
        history.append(epoch, means, lr=lr_fn(epoch),
                       scenes_per_sec=nb * flags.batch_size
                       / max(dt, 1e-9))
        guard.update(state, epoch)
        common.save_checkpoint(ckpt_path, state, epoch)
        if (epoch + 1) % flags.eval_freq == 0:
            eval_state = recalibrate_bn(state, train_loader, recal_step,
                                        mesh, recal_batches)
            metrics, _ = evaluate(eval_state, val_loader, eval_step,
                                  cfg, mesh, logger,
                                  flags.ap_iou_thresh)
            history.append(epoch, {"mAP": metrics["mAP"],
                                   "AR": metrics["AR"]},
                           kind="eval")
    return state


def _train_loop_da(flags, recipe):
    """BR (DA) / BR+CenterRefine (DA + jitter head)."""
    if getattr(flags, "multihost", False):
        # the BR stages are the multi-GPU ones in the reference
        # (`train_Votenet_BR.py:214-218`)
        common.init_multihost()
    common.enable_compilation_cache()
    cfg = get_config(flags.dataset)
    logger = common.setup_logger(flags.log_dir)
    common.dump_config(flags.log_dir, vars(flags))
    mesh = make_mesh(flags.num_devices)
    jitter_model = recipe == "br_center_refine"

    # CenterRefine jitters the SOURCE labels too
    # (`train_Votenet_BR_CenterRefine.py:152-154` passes center_jitter
    # to the train_aug dataset); BR trains the source with its FULL
    # exact labels (`train_Votenet_BR.py:165-167` passes none).
    train_ds_S = DetectionDataset(
        cfg, flags.source_data_root, split="train_aug",
        num_points=flags.num_point, use_color=flags.use_color,
        use_height=not flags.no_height, augment=True,
        center_jitter=flags.center_jitter if jitter_model else 0.0,
        seed=flags.seed, **_cache_kw(flags))
    train_ds_T = DetectionDataset(
        cfg, flags.data_root, split=flags.train_split,
        num_points=flags.num_point, use_color=flags.use_color,
        use_height=not flags.no_height, augment=True,
        center_jitter=flags.center_jitter, seed=flags.seed,
        **_cache_kw(flags))
    val_ds = DetectionDataset(
        cfg, flags.val_data_root or flags.data_root,
        split=flags.val_split, num_points=flags.num_point,
        use_color=flags.use_color, use_height=not flags.no_height,
        augment=False, seed=flags.seed, **_cache_kw(flags))
    nshard, ishard = jax.process_count(), jax.process_index()
    loader_S = DetectionDataLoader(train_ds_S, flags.batch_size,
                                   seed=flags.seed, num_shards=nshard,
                                   shard_index=ishard)
    loader_T = DetectionDataLoader(train_ds_T, flags.batch_size,
                                   seed=flags.seed + 1,
                                   num_shards=nshard, shard_index=ishard)
    val_loader = DetectionDataLoader(val_ds, flags.batch_size,
                                     shuffle=False, drop_last=False,
                                     num_shards=nshard,
                                     shard_index=ishard)
    logger.info("S scans: %d, T scans: %d, val: %d", len(train_ds_S),
                len(train_ds_T), len(val_ds))

    model = build_model(flags, cfg,
                        "da_jitter" if jitter_model else "da")
    optimizer = common.make_optimizer(
        "adam", flags.weight_decay, lr0=flags.learning_rate)

    rng = jax.random.PRNGKey(flags.seed)
    sample = next(iter(loader_T))
    sample_args = (jnp.asarray(sample["point_clouds"][:1]),)
    if jitter_model:
        sample_args += (jnp.asarray(sample["center_label"][:1]),
                        jnp.asarray(sample["sem_cls_label"][:1]))
    state = init_state(model, optimizer, sample_args, rng)

    ckpt_name = ("train_BR_CenterRefine.tar" if jitter_model
                 else "train_BR.tar")
    ckpt_path = flags.log_dir + "/" + ckpt_name
    start_epoch = 0
    if flags.resume:
        # resume this stage in-place: full state (opt + epoch) from the
        # stage's own checkpoint, or --checkpoint_path if given
        src = flags.checkpoint_path or ckpt_path
        if pathlib.Path(src).exists():
            sd, ckpt_epoch, _ = common.load_checkpoint(src)
            state = common.restore_state(state, sd, restore_opt=True)
            start_epoch = ckpt_epoch + 1
            logger.info("resumed %s (epoch %d)", src, ckpt_epoch)
        else:
            logger.info("--resume: no checkpoint at %s, fresh start",
                        src)
    elif flags.checkpoint_path:
        sd, ckpt_epoch, _ = common.load_checkpoint(flags.checkpoint_path)
        # cross-stage grafting: BR weights into the jitter-augmented
        # model (reference `strict=False`,
        # `train_Votenet_BR_CenterRefine.py:213-218`)
        params = common.partial_restore(
            jax.device_get(state.params), sd["params"],
            log=logger.info)
        batch_stats = common.partial_restore(
            jax.device_get(state.batch_stats), sd["batch_stats"],
            log=logger.info)
        state = state.replace(params=params, batch_stats=batch_stats)
        logger.info("grafted checkpoint %s (epoch %d)",
                    flags.checkpoint_path, ckpt_epoch)
    state = replicate(state, mesh)
    history = ScalarHistory(flags.log_dir)

    train_step = make_da_train_step(model, optimizer, cfg,
                                    jitter=jitter_model)
    # eval uses the weak criterion on the target domain
    eval_step = make_eval_step(model, vote_losses.get_loss_weak, cfg,
                               jitter=jitter_model)
    recal_step = make_recal_step(model, jitter=jitter_model)
    recal_batches = flags.bn_recal_batches
    if recal_batches is None:
        recal_batches = 20 if flags.bf16 else 0

    lr_fn = common.step_lr(
        flags.learning_rate,
        [int(x) for x in flags.lr_decay_steps.split(",")],
        [float(x) for x in flags.lr_decay_rates.split(",")])
    bn_fn = common.bn_momentum_fn(step=flags.bn_decay_step,
                                  rate=flags.bn_decay_rate)

    steps_per_epoch = min(len(loader_S), len(loader_T))
    guard = common.PreemptionGuard(ckpt_path, logger)
    guard_every = max(0, getattr(flags, 'guard_every_steps', 100))
    host_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, flags.max_epoch):
        state = common.set_learning_rate(state, lr_fn(epoch))
        bnm = np.float32(bn_fn(epoch))
        loader_S.set_epoch(epoch)
        loader_T.set_epoch(epoch)
        # zip the short loader with a cycle of the longer one
        # (`train_Votenet_BR.py:267`)
        if len(loader_S) <= len(loader_T):
            pairs = zip(cycle(loader_S), loader_T)
        else:
            pairs = zip(loader_S, cycle(loader_T))
        t0 = time.time()
        nb = 0
        aux_hist = []
        for batch_S, batch_T in pairs:
            dev_S = shard_batch(batch_S, mesh)
            dev_T = shard_batch(batch_T, mesh)
            host_step += 1
            state, aux = train_step(
                state, dev_S, dev_T, rng, bnm,
                np.float32(epoch))
            aux_hist.append(aux)
            nb += 1
            if guard_every and nb % guard_every == 0:
                # mid-epoch snapshot: SIGTERM loses at most
                # --guard_every_steps steps; the current epoch is re-run
                # on resume (saved as epoch-1 completed)
                guard.update(state, epoch - 1)
            if nb >= steps_per_epoch:
                break
        means = common.fetch_aux_means(aux_hist)
        dt = time.time() - t0
        logger.info(
            "epoch %03d lr %.2e loss %.4f obj_acc %.3f "
            "(%d pair-batches, %.1fs)",
            epoch, lr_fn(epoch), means.get("loss", float("nan")),
            means.get("obj_acc", float("nan")), nb, dt)
        history.append(epoch, means, lr=lr_fn(epoch),
                       scenes_per_sec=nb * flags.batch_size
                       / max(dt, 1e-9))
        guard.update(state, epoch)
        common.save_checkpoint(ckpt_path, state, epoch)
        if (epoch + 1) % flags.eval_freq == 0:
            eval_state = recalibrate_bn(state, loader_T, recal_step,
                                        mesh, recal_batches)
            metrics, _ = evaluate(eval_state, val_loader, eval_step,
                                  cfg, mesh, logger,
                                  flags.ap_iou_thresh)
            history.append(epoch, {"mAP": metrics["mAP"],
                                   "AR": metrics["AR"]},
                           kind="eval")
            if jax.process_index() == 0:
                with open(flags.log_dir + "/Eval_mAP.txt", "a") as f:
                    f.write(f"{epoch}\t{metrics['mAP']:.4f}\n")
    return state


def main(recipe: str, argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--train_split", default="train")
    parser.add_argument("--val_split", default="val")
    parser.add_argument("--val_data_root", default=None)
    if recipe in ("wsb", "br", "br_center_refine"):
        parser.add_argument("--center_jitter", type=float, default=0.1)
    if recipe in ("br", "br_center_refine"):
        parser.add_argument("--source_data_root", required=True,
                            help="virtual-scene data root (obj_aug)")
        parser.add_argument("--dataset_version", default="point",
                            choices=["point", "mesh"])
    flags = parser.parse_args(argv)
    if recipe in ("fsb", "wsb"):
        return _train_loop_single(flags, recipe)
    return _train_loop_da(flags, recipe)
