"""GroupFree3D training drivers: FSB / WSB / BR / BR+CenterRefine.

TPU-native re-design of `train_GF_{FSB,WSB,BR,BR_CenterRefine}.py`:
the NCCL-DDP harness (per-rank processes, DistributedSampler, SyncBN)
becomes one jitted data-parallel train step over a device mesh — XLA
all-reduces gradients over ICI and computes BN statistics over the
global batch (SyncBN semantics by construction). AdamW with a separate
decoder learning-rate group, per-iteration warmup + step/cosine
schedules (injected host-side), gradient clipping 0.1, dropout rngs.

CLI flags mirror `train_GF_FSB.py:23-103`.
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
from backtoreality_tpu.losses import groupfree as gf_losses
from backtoreality_tpu.models.groupfree import (
    GroupFreeDetector,
    GroupFreeDetectorDA,
    GroupFreeDetectorDAJitter,
)
from backtoreality_tpu.parallel import (
    local_rows_tree,
    make_mesh,
    replicate,
    shard_batch,
)
from backtoreality_tpu.train import common
from backtoreality_tpu.train.observability import ScalarHistory


GF_EVAL_CONFIG_DICT = dict(
    remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
    use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
    conf_thresh=0.0,
)

EVAL_KEY_SUFFIXES = (
    "center", "heading_scores", "heading_residuals", "size_scores",
    "size_residuals", "sem_cls_scores", "objectness_scores",
)


def add_flags(parser: argparse.ArgumentParser):
    # Model
    parser.add_argument("--width", default=1, type=int)
    parser.add_argument("--num_target", type=int, default=256)
    parser.add_argument("--sampling", default="kps",
                        choices=["kps", "fps"])
    # Transformer
    parser.add_argument("--nhead", default=8, type=int)
    parser.add_argument("--num_decoder_layers", default=6, type=int)
    parser.add_argument("--dim_feedforward", default=2048, type=int)
    parser.add_argument("--transformer_dropout", default=0.1, type=float)
    parser.add_argument("--self_position_embedding",
                        default="loc_learned")
    parser.add_argument("--cross_position_embedding",
                        default="xyz_learned")
    # Loss
    parser.add_argument("--query_points_generator_loss_coef",
                        default=0.8, type=float)
    parser.add_argument("--obj_loss_coef", default=0.1, type=float)
    parser.add_argument("--box_loss_coef", default=1.0, type=float)
    parser.add_argument("--sem_cls_loss_coef", default=0.1, type=float)
    parser.add_argument("--center_loss_type", default="smoothl1")
    parser.add_argument("--center_delta", default=1.0, type=float)
    parser.add_argument("--size_loss_type", default="smoothl1")
    parser.add_argument("--size_delta", default=1.0, type=float)
    parser.add_argument("--heading_loss_type", default="smoothl1")
    parser.add_argument("--heading_delta", default=1.0, type=float)
    parser.add_argument("--query_points_obj_topk", default=4, type=int)
    # Data
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--dataset", default="scannet_md40",
                        choices=["scannet_md40", "matterport_md40"])
    parser.add_argument("--data_root", default="data")
    parser.add_argument("--num_point", type=int, default=50000)
    parser.add_argument("--use_height", action="store_true")
    parser.add_argument("--use_color", action="store_true")
    # Training
    parser.add_argument("--max_epoch", type=int, default=400)
    parser.add_argument("--weight_decay", type=float, default=0.0005)
    parser.add_argument("--learning_rate", type=float, default=0.004)
    parser.add_argument("--decoder_learning_rate", type=float,
                        default=0.0004)
    parser.add_argument("--lr-scheduler", dest="lr_scheduler",
                        type=str, default="step",
                        choices=["step", "cosine"])
    parser.add_argument("--warmup-epoch", dest="warmup_epoch", type=int,
                        default=-1)
    parser.add_argument("--warmup-multiplier", dest="warmup_multiplier",
                        type=int, default=100)
    parser.add_argument("--lr_decay_epochs", type=int,
                        default=[280, 340], nargs="+")
    parser.add_argument("--lr_decay_rate", type=float, default=0.1)
    parser.add_argument("--clip_norm", default=0.1, type=float)
    parser.add_argument("--bn_momentum", type=float, default=0.1)
    # io
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--log_dir", default="log_gf")
    parser.add_argument("--save_freq", type=int, default=100)
    parser.add_argument("--val_freq", type=int, default=50)
    parser.add_argument("--ap_iou_thresholds", type=float,
                        default=[0.25, 0.5], nargs="+")
    parser.add_argument("--rng_seed", type=int, default=0)
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
                             " stages (fp2, fp1, sa4, ...) in f32 —"
                             " negligible HBM traffic, full-precision"
                             " seed features for the decoder")
    parser.add_argument("--bn_recal_batches", type=int, default=None,
                        help="train-mode batches to refresh BN stats"
                             " before eval (default 20 with --bf16)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for"
                             " multi-host meshes (env-configured"
                             " coordinator, like torch's env://)")
    parser.add_argument("--resume", action="store_true",
                        help="restore full state + epoch from"
                             " --checkpoint_path and continue")
    parser.add_argument("--guard_every_steps", type=int, default=100,
                        help="mid-epoch preemption-snapshot cadence in"
                             " steps (0 disables; each snapshot is a"
                             " blocking full-state host fetch)")
    parser.add_argument("--profile_dir", default=None)
    parser.add_argument("--ram_cache_gb", type=float, default=8.0,
                        help="per-dataset RAM cache budget for raw scan"
                             " arrays (0 disables caching)")
    parser.add_argument("--train_split", default="train")
    parser.add_argument("--val_split", default="val")
    parser.add_argument("--val_data_root", default=None)
    return parser


def _input_dim(flags) -> int:
    return int(flags.use_height) + 3 * int(flags.use_color)


def build_model(flags, cfg, kind="plain"):
    kwargs = dict(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        input_feature_dim=_input_dim(flags),
        width=flags.width,
        num_proposal=flags.num_target,
        sampling=flags.sampling,
        dropout_rate=flags.transformer_dropout,
        nhead=flags.nhead,
        num_decoder_layers=flags.num_decoder_layers,
        dim_feedforward=flags.dim_feedforward,
        self_position_embedding=flags.self_position_embedding,
        cross_position_embedding=flags.cross_position_embedding,
        query_mode=flags.query_mode,
        fps_candidates=getattr(flags, "fps_candidates", None),
        dtype=jnp.bfloat16 if getattr(flags, "bf16", False)
        else jnp.float32,
        f32_tail=getattr(flags, "f32_tail", 0),
    )
    if kind == "plain":
        return GroupFreeDetector(**kwargs)
    if kind == "da":
        return GroupFreeDetectorDA(**kwargs)
    if kind == "da_jitter":
        return GroupFreeDetectorDAJitter(**kwargs)
    raise ValueError(kind)


def _loss_kwargs(flags):
    return dict(
        num_decoder_layers=flags.num_decoder_layers,
        query_points_generator_loss_coef=(
            flags.query_points_generator_loss_coef),
        obj_loss_coef=flags.obj_loss_coef,
        box_loss_coef=flags.box_loss_coef,
        sem_cls_loss_coef=flags.sem_cls_loss_coef,
        query_points_obj_topk=flags.query_points_obj_topk,
        center_loss_type=flags.center_loss_type,
        center_delta=flags.center_delta,
        size_loss_type=flags.size_loss_type,
        size_delta=flags.size_delta,
        heading_loss_type=flags.heading_loss_type,
        heading_delta=flags.heading_delta,
    )


def _scalars(aux):
    return {k: v for k, v in aux.items()
            if hasattr(v, "ndim") and v.ndim == 0}


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


def make_train_step(model, optimizer, criterion, cfg, loss_kwargs, *,
                    jitter=False):
    def step_fn(state, batch, rng, bn_momentum):
        # fold the per-step key in-graph (see votenet.make_train_step)
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, rng = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            args = (batch["point_clouds"],)
            if jitter:
                args += (batch["center_label"], batch["sem_cls_label"])
            outs, mut = model.apply(
                variables, *args, train=True, bn_momentum=bn_momentum,
                mutable=["batch_stats"], rngs={"dropout": drop_rng})
            ep = {**batch, **outs}
            loss, aux = criterion(ep, cfg, **loss_kwargs)
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


def make_da_train_step(model, optimizer, cfg, loss_kwargs, *,
                       jitter=False):
    def step_fn(state, batch_S, batch_T, rng, bn_momentum, epoch):
        rng = jax.random.fold_in(rng, state.step)
        rng_S, rng_T = jax.random.split(rng)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}

            def forward(variables, batch, key):
                args = (batch["point_clouds"],)
                if jitter:
                    args += (batch["center_label"],
                             batch["sem_cls_label"])
                return model.apply(
                    variables, *args, train=True,
                    bn_momentum=bn_momentum, mutable=["batch_stats"],
                    rngs={"dropout": key})

            outs_S, mut = forward(vs, batch_S, rng_S)
            vs2 = {"params": params, "batch_stats": mut["batch_stats"]}
            outs_T, mut2 = forward(vs2, batch_T, rng_T)
            ep_S = {**batch_S, **outs_S}
            ep_T = {**batch_T, **outs_T}
            if jitter:
                loss, aux = gf_losses.get_loss_DA_jitter(
                    ep_S, ep_T, epoch, cfg, **loss_kwargs)
            else:
                loss, aux = gf_losses.get_loss_DA(
                    ep_S, ep_T, cfg, **loss_kwargs)
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
    """Train-mode forward updating only batch_stats (BN recalibration;
    dropout disabled by passing a fixed key via rngs)."""

    def recal_fn(state, batch, bn_momentum, key):
        args = (batch["point_clouds"],)
        if jitter:
            args += (batch["center_label"], batch["sem_cls_label"])
        _, mut = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *args, train=True, bn_momentum=bn_momentum,
            mutable=["batch_stats"], rngs={"dropout": key})
        return state.replace(batch_stats=mut["batch_stats"])

    return jax.jit(recal_fn)


def recalibrate_bn(state, loader, recal_step, mesh, num_batches,
                   momentum=0.2):
    if num_batches <= 0:
        return state
    done = 0
    bnm = np.float32(momentum)
    key = jax.random.PRNGKey(0)
    while done < num_batches:
        for batch in loader:
            state = recal_step(state, shard_batch(batch, mesh), bnm,
                               key)
            done += 1
            if done >= num_batches:
                break
        else:
            continue
        break
    return state


def make_eval_step(model, criterion, cfg, loss_kwargs, prefixes, *,
                   jitter=False):
    def eval_fn(state, batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        args = (batch["point_clouds"],)
        if jitter:
            args += (batch["center_label"], batch["sem_cls_label"])
        outs = model.apply(variables, *args, train=False)
        ep = {**batch, **outs}
        loss, aux = criterion(ep, cfg, **loss_kwargs)
        pred = {}
        for prefix in prefixes:
            for suffix in EVAL_KEY_SUFFIXES:
                key = f"{prefix}{suffix}"
                pred[key] = outs[key]
        return pred, _scalars(aux)

    return jax.jit(eval_fn)


def evaluate(state, loader, eval_step, cfg, mesh, logger, flags,
             prefixes=("last_",)):
    config_dict = dict(GF_EVAL_CONFIG_DICT, dataset_config=cfg)
    calcs = {
        (prefix, thr): APCalculator(thr, cfg.class2type)
        for prefix in prefixes for thr in flags.ap_iou_thresholds
    }
    meter = common.MetricMeter()
    for batch in loader:
        dev_batch = shard_batch(batch, mesh)
        pred, aux = eval_step(state, dev_batch)
        meter.update(jax.device_get(aux))
        # per-process shard scoring (see votenet.evaluate)
        pred_np = local_rows_tree(pred)
        gts = parse_groundtruths(batch, config_dict)
        for prefix in prefixes:
            preds = parse_predictions(pred_np, config_dict, prefix)
            for thr in flags.ap_iou_thresholds:
                calcs[(prefix, thr)].step(preds, gts)
    results = {}
    for (prefix, thr), calc in calcs.items():
        metrics = calc.compute_metrics()
        results[(prefix, thr)] = metrics
        if logger:
            logger.info("eval [%s] mAP@%.2f: %.4f  AR: %.4f", prefix,
                        thr, metrics["mAP"], metrics["AR"])
    return results, meter.means()


def _lr_schedules(flags, steps_per_epoch):
    warmup = max(flags.warmup_epoch, 0)
    factor = 1.0 / flags.warmup_multiplier
    if flags.lr_scheduler == "step":
        main = common.warmup_step_lr(
            flags.learning_rate, warmup, factor,
            [m - warmup for m in flags.lr_decay_epochs],
            flags.lr_decay_rate, steps_per_epoch)
        dec = common.warmup_step_lr(
            flags.decoder_learning_rate, warmup, factor,
            [m - warmup for m in flags.lr_decay_epochs],
            flags.lr_decay_rate, steps_per_epoch)
    else:
        main = common.cosine_lr(
            flags.learning_rate, warmup, factor,
            flags.max_epoch - warmup, steps_per_epoch, eta_min=1e-6)
        dec = common.cosine_lr(
            flags.decoder_learning_rate, warmup, factor,
            flags.max_epoch - warmup, steps_per_epoch, eta_min=1e-6)
    return main, dec


def _make_datasets(flags, cfg, recipe):
    gb = getattr(flags, "ram_cache_gb", 8.0)
    common_kw = dict(
        num_points=flags.num_point, use_color=flags.use_color,
        use_height=flags.use_height, seed=flags.rng_seed,
        gf_labels=True, ram_cache=gb > 0,
        ram_cache_bytes=int(gb * 2**30) if gb > 0 else None)
    jitter = getattr(flags, "center_jitter", 0.0)
    if recipe in ("fsb", "wsb"):
        train_ds = DetectionDataset(
            cfg, flags.data_root, split=flags.train_split, augment=True,
            center_jitter=0.0 if recipe == "fsb" else jitter,
            **common_kw)
        source_ds = None
    else:
        source_ds = DetectionDataset(
            cfg, flags.source_data_root, split="train_aug",
            augment=True, center_jitter=jitter, **common_kw)
        train_ds = DetectionDataset(
            cfg, flags.data_root, split=flags.train_split, augment=True,
            center_jitter=jitter, **common_kw)
    val_ds = DetectionDataset(
        cfg, flags.val_data_root or flags.data_root,
        split=flags.val_split, augment=False, **common_kw)
    return source_ds, train_ds, val_ds


def main(recipe: str, argv=None):
    parser = argparse.ArgumentParser()
    add_flags(parser)
    if recipe in ("wsb", "br", "br_center_refine"):
        parser.add_argument("--center_jitter", type=float, default=0.1)
    if recipe in ("br", "br_center_refine"):
        parser.add_argument("--source_data_root", required=True)
    flags = parser.parse_args(argv)

    if getattr(flags, "multihost", False):
        common.init_multihost()
    common.enable_compilation_cache()
    cfg = get_config(flags.dataset)
    logger = common.setup_logger(flags.log_dir, name="gf")
    common.dump_config(flags.log_dir, vars(flags))
    mesh = make_mesh(flags.num_devices)
    jitter_model = recipe == "br_center_refine"
    da = recipe in ("br", "br_center_refine")

    source_ds, train_ds, val_ds = _make_datasets(flags, cfg, recipe)
    nshard, ishard = jax.process_count(), jax.process_index()
    train_loader = DetectionDataLoader(
        train_ds, flags.batch_size, seed=flags.rng_seed,
        num_shards=nshard, shard_index=ishard)
    val_loader = DetectionDataLoader(
        val_ds, flags.batch_size, shuffle=False, drop_last=False,
        num_shards=nshard, shard_index=ishard)
    loader_S = None
    if source_ds is not None:
        loader_S = DetectionDataLoader(
            source_ds, flags.batch_size, seed=flags.rng_seed + 1,
            num_shards=nshard, shard_index=ishard)
        logger.info("S scans: %d, T scans: %d, val: %d",
                    len(source_ds), len(train_ds), len(val_ds))
    else:
        logger.info("train scans: %d, val scans: %d", len(train_ds),
                    len(val_ds))

    kind = "da_jitter" if jitter_model else ("da" if da else "plain")
    model = build_model(flags, cfg, kind)
    steps_per_epoch_est = (min(len(loader_S), len(train_loader))
                           if loader_S is not None
                           else len(train_loader))
    # on-device optax schedules: per-iteration LR stepping without any
    # host->device hyperparameter pushes
    main_sched = common.make_gf_schedule(
        flags.learning_rate, flags, steps_per_epoch_est)
    dec_sched = common.make_gf_schedule(
        flags.decoder_learning_rate, flags, steps_per_epoch_est)
    optimizer = common.make_gf_optimizer(
        main_sched, dec_sched, flags.weight_decay, flags.clip_norm)
    loss_kwargs = _loss_kwargs(flags)
    criterion = (gf_losses.get_loss if recipe == "fsb"
                 else gf_losses.get_loss_weak)

    rng = jax.random.PRNGKey(flags.rng_seed)
    sample = next(iter(train_loader))
    sample_args = (jnp.asarray(sample["point_clouds"][:1]),)
    if jitter_model:
        sample_args += (jnp.asarray(sample["center_label"][:1]),
                        jnp.asarray(sample["sem_cls_label"][:1]))
    state = init_state(model, optimizer, sample_args, rng)

    ckpt_path = flags.log_dir + "/ckpt_epoch_last.tar"
    start_epoch = 0
    if flags.resume and not flags.checkpoint_path:
        # resume from this run's own last checkpoint if present
        if pathlib.Path(ckpt_path).exists():
            sd, ckpt_epoch, _ = common.load_checkpoint(ckpt_path)
            state = common.restore_state(state, sd, restore_opt=True)
            start_epoch = ckpt_epoch + 1
            logger.info("resumed %s (epoch %d)", ckpt_path, ckpt_epoch)
        else:
            logger.info("--resume: no checkpoint at %s, fresh start",
                        ckpt_path)
    elif flags.checkpoint_path:
        sd, ckpt_epoch, _ = common.load_checkpoint(flags.checkpoint_path)
        if flags.resume:
            state = common.restore_state(state, sd, restore_opt=True)
            start_epoch = ckpt_epoch + 1
        else:
            params = common.partial_restore(
                jax.device_get(state.params), sd["params"],
                log=logger.info)
            batch_stats = common.partial_restore(
                jax.device_get(state.batch_stats), sd["batch_stats"],
                log=logger.info)
            state = state.replace(params=params,
                                  batch_stats=batch_stats)
        logger.info("restored %s (epoch %d)", flags.checkpoint_path,
                    ckpt_epoch)
    state = replicate(state, mesh)
    history = ScalarHistory(flags.log_dir)

    if da:
        train_step = make_da_train_step(model, optimizer, cfg,
                                        loss_kwargs, jitter=jitter_model)
        steps_per_epoch = min(len(loader_S), len(train_loader))
    else:
        train_step = make_train_step(model, optimizer, criterion, cfg,
                                     loss_kwargs, jitter=jitter_model)
        steps_per_epoch = len(train_loader)
    eval_prefixes = ("last_",) if flags.num_decoder_layers > 0 \
        else ("proposal_",)
    eval_step = make_eval_step(
        model, gf_losses.get_loss_weak if da else criterion, cfg,
        loss_kwargs, eval_prefixes, jitter=jitter_model)
    recal_step = make_recal_step(model, jitter=jitter_model)
    recal_batches = flags.bn_recal_batches
    if recal_batches is None:
        recal_batches = 20 if flags.bf16 else 0

    lr_fn, dec_lr_fn = _lr_schedules(flags, steps_per_epoch)
    bnm = np.float32(flags.bn_momentum)
    guard = common.PreemptionGuard(ckpt_path, logger)
    guard_every = max(0, getattr(flags, 'guard_every_steps', 100))

    host_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, flags.max_epoch):
        train_loader.set_epoch(epoch)
        if loader_S is not None:
            loader_S.set_epoch(epoch)
            if len(loader_S) <= len(train_loader):
                pairs = zip(cycle(loader_S), train_loader)
            else:
                pairs = zip(loader_S, cycle(train_loader))
            iterator = pairs
        else:
            iterator = train_loader
        t0 = time.time()
        nb = 0
        aux_hist = []
        for item in iterator:
            host_step += 1
            if loader_S is not None:
                batch_S, batch_T = item
                state, aux = train_step(
                    state, shard_batch(batch_S, mesh),
                    shard_batch(batch_T, mesh), rng, bnm,
                    np.float32(epoch))
            else:
                state, aux = train_step(
                    state, shard_batch(item, mesh), rng, bnm)
            aux_hist.append(aux)
            nb += 1
            if guard_every and nb % guard_every == 0:
                # mid-epoch preemption snapshot (SIGTERM loses at most
                # --guard_every_steps steps; epoch re-runs on resume)
                guard.update(state, epoch - 1)
            if nb >= steps_per_epoch:
                break
        means = common.fetch_aux_means(aux_hist)
        dt = time.time() - t0
        logger.info(
            "epoch %03d lr %.2e loss %.4f (%d batches, %.1fs, "
            "%.2f scenes/s)", epoch, lr_fn(host_step),
            means.get("loss", float("nan")), nb, dt,
            nb * flags.batch_size / max(dt, 1e-9))
        history.append(epoch, means, lr=lr_fn(host_step),
                       scenes_per_sec=nb * flags.batch_size
                       / max(dt, 1e-9))
        if (epoch + 1) % flags.save_freq == 0 or \
                epoch == flags.max_epoch - 1:
            common.save_checkpoint(
                flags.log_dir + f"/ckpt_epoch_{epoch}.tar", state, epoch)
        guard.update(state, epoch)
        common.save_checkpoint(ckpt_path, state, epoch)
        if (epoch + 1) % flags.val_freq == 0:
            eval_state = recalibrate_bn(state, train_loader, recal_step,
                                        mesh, recal_batches)
            results, _ = evaluate(eval_state, val_loader, eval_step,
                                  cfg, mesh, logger, flags,
                                  eval_prefixes)
            key0 = (eval_prefixes[0], flags.ap_iou_thresholds[0])
            history.append(epoch, {"mAP": results[key0]["mAP"],
                                   "AR": results[key0]["AR"]},
                           kind="eval")
            if da and jax.process_index() == 0:
                key0 = (eval_prefixes[0], flags.ap_iou_thresholds[0])
                with open(flags.log_dir + "/Eval_mAP.txt", "a") as f:
                    f.write(f"{epoch}\t{results[key0]['mAP']:.4f}\n")
    return state
