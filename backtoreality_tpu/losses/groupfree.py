"""GroupFree3D training criteria.

Functional re-statement of `detection/GroupFree3D/models/loss_helper.py`
(KPS :17-78, per-head objectness :81-137, per-head box :140-275,
get_loss :278-315, weak variants :322-608, DA :673-712, jitter
:715-771) and `models/losses.py:5-81`.

All functions take end_points (model outputs + labels) and return
``(loss, aux)``; nothing is mutated. Per-head prefixes are
`proposal_`, `0head_`..`{L-2}head_`, `last_`.

Note on the reference weak compositions: `get_loss_weak` evaluates both
the full- and weak-label variants and weights the full ones by 0.000 —
they contribute nothing to value or gradient, so only the weak terms
are implemented here.
"""

import jax
import jax.numpy as jnp

from backtoreality_tpu.losses.common import (
    masked_mean,
    one_hot_f32,
    sigmoid_bce_with_logits,
    softmax_ce,
    softmax_focal_loss,
)
from backtoreality_tpu.losses.votenet import nn_distance


def smoothl1_loss(error, delta: float = 1.0):
    """`losses.py:5-14`: 0.5 x^2/d inside, |x| - d/2 outside."""
    diff = jnp.abs(error)
    return jnp.where(diff < delta, 0.5 * diff * diff / delta,
                     diff - 0.5 * delta)


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """`SigmoidFocalClassificationLoss` (`losses.py:21-81`), tf-style.

    logits/targets (..., C); weights broadcast over the class dim."""
    p = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = sigmoid_bce_with_logits(logits, targets)
    return focal_weight * bce * weights[..., None]


def _prefixes(num_decoder_layers):
    if num_decoder_layers > 0:
        return (["proposal_", "last_"]
                + [f"{i}head_" for i in range(num_decoder_layers - 1)])
    return ["proposal_"]


def _normalized_weights(mask):
    """Per-scan weight normalisation used by every GF focal term."""
    w = mask.astype(jnp.float32)
    norm = jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1.0)
    return w / norm


# ---------------------------------------------------------------------------
# KPS (query point) supervision
# ---------------------------------------------------------------------------


def compute_points_obj_cls_loss_hard_topk(end_points, topk):
    """`loss_helper.py:17-78`: for each GT box, its top-k
    size-normalized-closest seeds *within the instance* are positives."""
    box_label_mask = end_points["box_label_mask"]  # (B, K2)
    seed_inds = end_points["seed_inds"].astype(jnp.int32)  # (B, K)
    seed_xyz = end_points["seed_xyz"]
    logits = end_points["seeds_obj_cls_logits"]  # (B, K, 1)
    gt_center = end_points["center_label"][:, :, 0:3]
    gt_size = end_points["size_gts"][:, :, 0:3]
    b, k = seed_xyz.shape[0], seed_xyz.shape[1]
    k2 = gt_center.shape[1]

    point_instance_label = end_points["point_instance_label"]
    assignment = jnp.take_along_axis(point_instance_label, seed_inds,
                                     axis=1)  # (B, K)
    background = assignment < 0
    assignment = jnp.where(background, k2 - 1, assignment)
    assign_one_hot = one_hot_f32(assignment, k2)  # (B, K, K2)
    delta_xyz = (seed_xyz[:, :, None, :] - gt_center[:, None, :, :]) \
        / (gt_size[:, None, :, :] + 1e-6)
    dist = jnp.sqrt(jnp.sum(jnp.square(delta_xyz), -1) + 1e-6)
    dist = dist * assign_one_hot + 100.0 * (1 - assign_one_hot)
    dist = jnp.swapaxes(dist, 1, 2)  # (B, K2, K)

    _, topk_inds = jax.lax.top_k(-dist, topk)  # (B, K2, topk)
    valid = box_label_mask[:, :, None] > 0
    # masked-out boxes write into a dummy K-th column
    scatter_idx = jnp.where(valid, topk_inds, k).reshape(b, -1)
    label = jnp.zeros((b, k + 1), jnp.int32)
    label = jax.vmap(lambda l, i: l.at[i].set(1))(label, scatter_idx)
    objectness_label = label[:, :k]
    objectness_label = jnp.where(background, 0, objectness_label)

    weights = _normalized_weights(jnp.ones((b, k)))
    loss = sigmoid_focal_loss(
        logits, objectness_label[..., None].astype(jnp.float32), weights)
    objectness_loss = jnp.sum(loss) / b

    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / (b * k)
    stats = {
        f"points_hard_topk{topk}_pos_ratio": pos_ratio,
        f"points_hard_topk{topk}_neg_ratio": 1.0 - pos_ratio,
    }
    return objectness_loss, stats


def compute_points_obj_cls_loss_hard_topk_weak(end_points, topk):
    """`loss_helper.py:322-385`: weak variant — top-k on raw distance to
    weak centers, no instance masking."""
    box_label_mask = end_points["box_label_mask"]
    seed_xyz = end_points["seed_xyz"]
    logits = end_points["seeds_obj_cls_logits"]
    gt_center = end_points["center_label"][:, :, 0:3]
    b, k = seed_xyz.shape[0], seed_xyz.shape[1]

    delta_xyz = seed_xyz[:, :, None, :] - gt_center[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(jnp.square(delta_xyz), -1) + 1e-6)
    dist = jnp.swapaxes(dist, 1, 2)  # (B, K2, K)
    _, topk_inds = jax.lax.top_k(-dist, topk)
    valid = box_label_mask[:, :, None] > 0
    scatter_idx = jnp.where(valid, topk_inds, k).reshape(b, -1)
    label = jnp.zeros((b, k + 1), jnp.int32)
    label = jax.vmap(lambda l, i: l.at[i].set(1))(label, scatter_idx)
    objectness_label = label[:, :k]

    weights = _normalized_weights(jnp.ones((b, k)))
    loss = sigmoid_focal_loss(
        logits, objectness_label[..., None].astype(jnp.float32), weights)
    objectness_loss = jnp.sum(loss) / b
    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / (b * k)
    stats = {
        f"points_hard_topk{topk}_pos_ratio": pos_ratio,
        f"points_hard_topk{topk}_neg_ratio": 1.0 - pos_ratio,
    }
    return objectness_loss, stats


# ---------------------------------------------------------------------------
# Per-head objectness
# ---------------------------------------------------------------------------


def _query_labels_full(end_points):
    """Instance-based objectness labels/assignment (`loss_helper.py:97-117`)."""
    seed_inds = end_points["seed_inds"].astype(jnp.int32)
    q_inds = end_points["query_points_sample_inds"].astype(jnp.int32)
    k2 = end_points["center_label"].shape[1]

    seed_obj_gt = jnp.take_along_axis(
        end_points["point_obj_mask"], seed_inds, axis=1)
    query_obj_gt = jnp.take_along_axis(seed_obj_gt, q_inds, axis=1)

    seed_instance = jnp.take_along_axis(
        end_points["point_instance_label"], seed_inds, axis=1)
    query_instance = jnp.take_along_axis(seed_instance, q_inds, axis=1)
    assignment = jnp.where(query_instance < 0, k2 - 1, query_instance)
    return query_obj_gt.astype(jnp.int32), assignment.astype(jnp.int32)


def _query_labels_weak(end_points):
    """Chamfer-based weak labels (`loss_helper.py:416-455`)."""
    q_xyz = end_points["query_points_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, ind1, _, _ = nn_distance(q_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    label = (euclid < 0.3).astype(jnp.int32)
    return label, ind1.astype(jnp.int32)


def compute_objectness_loss_query_points(end_points, num_decoder_layers,
                                         weak=False):
    """Per-prefix sigmoid-focal objectness. Returns
    (loss_sum, {prefix: (label, assignment)}, aux)."""
    labels = {}
    aux = {}
    loss_sum = 0.0
    if weak:
        label, assignment = _query_labels_weak(end_points)
    else:
        label, assignment = _query_labels_full(end_points)
    b, k = label.shape
    weights = _normalized_weights(jnp.ones((b, k)))
    for prefix in _prefixes(num_decoder_layers):
        scores = end_points[f"{prefix}objectness_scores"]  # (B, K, 1)
        loss = sigmoid_focal_loss(
            scores, label[..., None].astype(jnp.float32), weights)
        objectness_loss = jnp.sum(loss) / b
        aux[f"{prefix}objectness_loss"] = objectness_loss
        labels[prefix] = (label, assignment)
        loss_sum = loss_sum + objectness_loss
    aux["pos_ratio"] = jnp.sum(label.astype(jnp.float32)) / (b * k)
    aux["neg_ratio"] = 1.0 - aux["pos_ratio"]
    return loss_sum, labels, aux


# ---------------------------------------------------------------------------
# Per-head box + semantic losses
# ---------------------------------------------------------------------------


def compute_box_and_sem_cls_loss(end_points, config, num_decoder_layers,
                                 labels, center_loss_type="smoothl1",
                                 center_delta=1.0,
                                 size_loss_type="smoothl1", size_delta=1.0,
                                 heading_loss_type="smoothl1",
                                 heading_delta=1.0,
                                 label_key_prefix=""):
    """`loss_helper.py:140-275`: assigned-GT regression per head.

    `label_key_prefix` selects the GT label namespace — "" for dataset
    labels, "unlabeled_" for pseudo labels
    (`compute_box_and_sem_cls_loss_pseudo`, `loss_helper.py:960-1080`)."""
    lp = label_key_prefix
    nh, ns = config.num_heading_bin, config.num_size_cluster
    mean_size_arr = jnp.asarray(config.mean_size_arr, jnp.float32)
    gt_center = end_points[f"{lp}center_label"][:, :, 0:3]

    box_loss_sum = 0.0
    sem_cls_loss_sum = 0.0
    aux = {}
    for prefix in _prefixes(num_decoder_layers):
        label, assignment = labels[prefix]
        objectness_label = label.astype(jnp.float32)

        pred_center = end_points[f"{prefix}center"]
        assigned_center = jnp.take_along_axis(
            gt_center, assignment[..., None], axis=1)
        if center_loss_type == "smoothl1":
            closs = smoothl1_loss(assigned_center - pred_center,
                                  delta=center_delta)
        else:
            closs = jnp.abs(assigned_center - pred_center)
        center_loss = jnp.sum(
            closs * objectness_label[..., None]
        ) / (jnp.sum(objectness_label) + 1e-6)

        heading_class_label = jnp.take_along_axis(
            end_points[f"{lp}heading_class_label"].astype(jnp.int32),
            assignment, axis=1)
        heading_class_loss = masked_mean(
            softmax_ce(end_points[f"{prefix}heading_scores"],
                       heading_class_label), objectness_label)
        heading_residual_label = jnp.take_along_axis(
            end_points[f"{lp}heading_residual_label"], assignment, axis=1)
        hrnl = heading_residual_label / (jnp.pi / nh)
        h_one_hot = one_hot_f32(heading_class_label, nh)
        herr = jnp.sum(
            end_points[f"{prefix}heading_residuals_normalized"]
            * h_one_hot, -1) - hrnl
        if heading_loss_type == "smoothl1":
            hloss = heading_delta * smoothl1_loss(herr,
                                                  delta=heading_delta)
        else:
            hloss = jnp.abs(herr)
        heading_reg_loss = masked_mean(hloss, objectness_label)

        size_class_label = jnp.take_along_axis(
            end_points[f"{lp}size_class_label"].astype(jnp.int32),
            assignment, axis=1)
        size_class_loss = masked_mean(
            softmax_ce(end_points[f"{prefix}size_scores"],
                       size_class_label), objectness_label)
        size_residual_label = jnp.take_along_axis(
            end_points[f"{lp}size_residual_label"], assignment[..., None],
            axis=1)
        s_one_hot = one_hot_f32(size_class_label, ns)
        pred_srn = jnp.sum(
            end_points[f"{prefix}size_residuals_normalized"]
            * s_one_hot[..., None], axis=2)
        mean_size_label = jnp.sum(
            s_one_hot[..., None] * mean_size_arr[None, None], axis=2)
        srnl = size_residual_label / mean_size_label
        serr = pred_srn - srnl
        if size_loss_type == "smoothl1":
            sloss = size_delta * smoothl1_loss(serr, delta=size_delta)
        else:
            sloss = jnp.abs(serr)
        size_reg_loss = jnp.sum(
            sloss * objectness_label[..., None]
        ) / (jnp.sum(objectness_label) + 1e-6)

        sem_cls_label = jnp.take_along_axis(
            end_points[f"{lp}sem_cls_label"].astype(jnp.int32), assignment,
            axis=1)
        sem_cls_loss = masked_mean(
            softmax_ce(end_points[f"{prefix}sem_cls_scores"],
                       sem_cls_label), objectness_label)

        box_loss = (center_loss + 0.1 * heading_class_loss
                    + heading_reg_loss + 0.1 * size_class_loss
                    + size_reg_loss)
        aux[f"{prefix}box_loss"] = box_loss
        aux[f"{prefix}center_loss"] = center_loss
        aux[f"{prefix}sem_cls_loss"] = sem_cls_loss
        box_loss_sum = box_loss_sum + box_loss
        sem_cls_loss_sum = sem_cls_loss_sum + sem_cls_loss
    return box_loss_sum, sem_cls_loss_sum, aux


def compute_center_and_sem_cls_loss(end_points, config,
                                    num_decoder_layers, labels,
                                    center_loss_type="smoothl1",
                                    center_delta=1.0):
    """`loss_helper.py:479-557`: weak variant — margin-relaxed center +
    size cls + sem cls."""
    mean_size_arr = jnp.asarray(config.mean_size_arr, jnp.float32)
    gt_center = end_points["center_label"][:, :, 0:3]

    box_loss_sum = 0.0
    sem_cls_loss_sum = 0.0
    aux = {}
    for prefix in _prefixes(num_decoder_layers):
        label, assignment = labels[prefix]
        objectness_label = label.astype(jnp.float32)

        size_class_label = jnp.take_along_axis(
            end_points["size_class_label"].astype(jnp.int32),
            assignment, axis=1)
        center_margin = 0.05 * mean_size_arr[size_class_label]  # (B,K,3)

        pred_center = end_points[f"{prefix}center"]
        assigned_center = jnp.take_along_axis(
            gt_center, assignment[..., None], axis=1)
        if center_loss_type == "smoothl1":
            closs = smoothl1_loss(assigned_center - pred_center,
                                  delta=center_delta)
        else:
            closs = jnp.abs(assigned_center - pred_center)
        closs = jnp.maximum(closs - center_margin, 0.0)
        center_loss = jnp.sum(
            closs * objectness_label[..., None]
        ) / (jnp.sum(objectness_label) + 1e-6)

        size_class_loss = masked_mean(
            softmax_ce(end_points[f"{prefix}size_scores"],
                       size_class_label), objectness_label)
        sem_cls_label = jnp.take_along_axis(
            end_points["sem_cls_label"].astype(jnp.int32), assignment,
            axis=1)
        sem_cls_loss = masked_mean(
            softmax_ce(end_points[f"{prefix}sem_cls_scores"],
                       sem_cls_label), objectness_label)

        box_loss = center_loss + 0.1 * size_class_loss
        aux[f"{prefix}box_loss"] = box_loss
        aux[f"{prefix}center_loss"] = center_loss
        aux[f"{prefix}sem_cls_loss"] = sem_cls_loss
        box_loss_sum = box_loss_sum + box_loss
        sem_cls_loss_sum = sem_cls_loss_sum + sem_cls_loss
    return box_loss_sum, sem_cls_loss_sum, aux


# ---------------------------------------------------------------------------
# Compositions
# ---------------------------------------------------------------------------


def get_loss(end_points, config, num_decoder_layers,
             query_points_generator_loss_coef, obj_loss_coef,
             box_loss_coef, sem_cls_loss_coef, query_points_obj_topk=5,
             **reg_kwargs):
    """FSB criterion (`loss_helper.py:278-315`)."""
    aux = {}
    if "seeds_obj_cls_logits" in end_points:
        kps_loss, stats = compute_points_obj_cls_loss_hard_topk(
            end_points, query_points_obj_topk)
        aux.update(stats)
        aux["query_points_generation_loss"] = kps_loss
    else:
        kps_loss = 0.0

    obj_loss_sum, labels, obj_aux = compute_objectness_loss_query_points(
        end_points, num_decoder_layers, weak=False)
    aux.update(obj_aux)
    aux["sum_heads_objectness_loss"] = obj_loss_sum

    box_loss_sum, sem_cls_loss_sum, box_aux = (
        compute_box_and_sem_cls_loss(
            end_points, config, num_decoder_layers, labels, **reg_kwargs))
    aux.update(box_aux)
    aux["sum_heads_box_loss"] = box_loss_sum
    aux["sum_heads_sem_cls_loss"] = sem_cls_loss_sum

    loss = (query_points_generator_loss_coef * kps_loss
            + 1.0 / (num_decoder_layers + 1)
            * (obj_loss_coef * obj_loss_sum
               + box_loss_coef * box_loss_sum
               + sem_cls_loss_coef * sem_cls_loss_sum)) * 10.0
    aux["loss"] = loss
    return loss, aux


def get_loss_weak(end_points, config, num_decoder_layers,
                  query_points_generator_loss_coef, obj_loss_coef,
                  box_loss_coef, sem_cls_loss_coef,
                  query_points_obj_topk=5, **reg_kwargs):
    """WSB criterion (`loss_helper.py:561-608`; the 0.000-weighted full
    terms are omitted — zero value and gradient)."""
    aux = {}
    if "seeds_obj_cls_logits" in end_points:
        kps_loss, stats = compute_points_obj_cls_loss_hard_topk_weak(
            end_points, query_points_obj_topk)
        aux.update(stats)
        aux["query_points_generation_loss"] = kps_loss
    else:
        kps_loss = 0.0

    obj_loss_sum, labels, obj_aux = compute_objectness_loss_query_points(
        end_points, num_decoder_layers, weak=True)
    aux.update(obj_aux)
    aux["sum_heads_objectness_loss"] = obj_loss_sum

    center_kwargs = {k: v for k, v in reg_kwargs.items()
                     if k in ("center_loss_type", "center_delta")}
    box_loss_sum, sem_cls_loss_sum, box_aux = (
        compute_center_and_sem_cls_loss(
            end_points, config, num_decoder_layers, labels,
            **center_kwargs))
    aux.update(box_aux)
    aux["sum_heads_box_loss"] = box_loss_sum
    aux["sum_heads_sem_cls_loss"] = sem_cls_loss_sum

    loss = (query_points_generator_loss_coef * kps_loss
            + 1.0 / (num_decoder_layers + 1)
            * (obj_loss_coef * obj_loss_sum
               + box_loss_coef * box_loss_sum
               + sem_cls_loss_coef * sem_cls_loss_sum)) * 10.0
    aux["loss"] = loss
    # expose the last-head labels for the DA local term
    aux["_last_objectness_label"] = labels.get(
        "last_", labels["proposal_"])[0]
    return loss, aux


def compute_jitter_loss(end_points):
    """`loss_helper.py:715-721`."""
    return jnp.mean(jnp.square(
        end_points["center_jitter"] - end_points["jitter_pred"]))


def refine_center_labels(end_points_S, end_points_T, epoch,
                         ramp_epochs: float = 120.0):
    """`loss_helper.py:747-751` — GF uses a 120-epoch ramp."""
    ramp = jnp.minimum(epoch / ramp_epochs, 1.0)
    new_S = dict(end_points_S)
    new_T = dict(end_points_T)
    new_S["center_label"] = (
        end_points_S["center_label"]
        - ramp * end_points_S["center_jitter"])
    refined_T = (
        end_points_T["center_label"]
        - ramp * end_points_T["jitter_pred"]
        * end_points_T["box_label_mask"][..., None])
    new_T["center_label"] = jax.lax.stop_gradient(refined_T)
    return new_S, new_T


def _gf_da_terms(end_points_S, end_points_T, label_S, label_T):
    """Global focal (gamma=3) + last-layer local L2 terms
    (`loss_helper.py:685-709`)."""
    domain_S = jnp.zeros(end_points_S["global_d_pred"].shape[0],
                         jnp.int32)
    domain_T = jnp.ones(end_points_T["global_d_pred"].shape[0],
                        jnp.int32)
    source = softmax_focal_loss(end_points_S["global_d_pred"], domain_S,
                                gamma=3)
    target = softmax_focal_loss(end_points_T["global_d_pred"], domain_T,
                                gamma=3)
    local_S = end_points_S["last_local_d_pred"][..., 0]
    source = source + jnp.mean(
        jnp.square(local_S) * label_S.astype(jnp.float32))
    local_T = end_points_T["last_local_d_pred"][..., 0]
    target = target + jnp.mean(
        jnp.square(1.0 - local_T) * label_T.astype(jnp.float32))
    return source + target


def get_loss_DA(end_points_S, end_points_T, config, num_decoder_layers,
                query_points_generator_loss_coef, obj_loss_coef,
                box_loss_coef, sem_cls_loss_coef,
                query_points_obj_topk=5, **reg_kwargs):
    """BR criterion (`loss_helper.py:673-712`):
    0.5*full(S) + weak(T) + 10*(global focal + last-layer local)."""
    loss_S, aux_S = get_loss(
        end_points_S, config, num_decoder_layers,
        query_points_generator_loss_coef, obj_loss_coef, box_loss_coef,
        sem_cls_loss_coef, query_points_obj_topk, **reg_kwargs)
    loss_T, aux_T = get_loss_weak(
        end_points_T, config, num_decoder_layers,
        query_points_generator_loss_coef, obj_loss_coef, box_loss_coef,
        sem_cls_loss_coef, query_points_obj_topk, **reg_kwargs)
    # Source labels for the local DA term come from the full path
    _, labels_S, _ = compute_objectness_loss_query_points(
        end_points_S, num_decoder_layers, weak=False)
    label_S = labels_S.get("last_", labels_S["proposal_"])[0]
    label_T = aux_T.pop("_last_objectness_label")

    da_loss = _gf_da_terms(end_points_S, end_points_T, label_S, label_T)
    loss = 0.5 * loss_S + loss_T + 10.0 * da_loss
    aux = {"loss": loss, "loss_S": loss_S, "loss_T": loss_T,
           "da_loss": da_loss}
    aux.update({f"S_{k}": v for k, v in aux_S.items()})
    aux.update({f"T_{k}": v for k, v in aux_T.items()})
    return loss, aux


def get_loss_DA_jitter(end_points_S, end_points_T, epoch, config,
                       num_decoder_layers,
                       query_points_generator_loss_coef, obj_loss_coef,
                       box_loss_coef, sem_cls_loss_coef,
                       query_points_obj_topk=5, **reg_kwargs):
    """BR+CenterRefine criterion (`loss_helper.py:723-771`)."""
    end_points_S, end_points_T = refine_center_labels(
        end_points_S, end_points_T, epoch)
    jitter_loss_S = compute_jitter_loss(end_points_S)

    loss_S, aux_S = get_loss(
        end_points_S, config, num_decoder_layers,
        query_points_generator_loss_coef, obj_loss_coef, box_loss_coef,
        sem_cls_loss_coef, query_points_obj_topk, **reg_kwargs)
    loss_T, aux_T = get_loss_weak(
        end_points_T, config, num_decoder_layers,
        query_points_generator_loss_coef, obj_loss_coef, box_loss_coef,
        sem_cls_loss_coef, query_points_obj_topk, **reg_kwargs)
    _, labels_S, _ = compute_objectness_loss_query_points(
        end_points_S, num_decoder_layers, weak=False)
    label_S = labels_S.get("last_", labels_S["proposal_"])[0]
    label_T = aux_T.pop("_last_objectness_label")

    da_loss = (_gf_da_terms(end_points_S, end_points_T, label_S, label_T)
               + 0.5 * jitter_loss_S)
    loss = 0.5 * loss_S + loss_T + 10.0 * da_loss
    aux = {"loss": loss, "loss_S": loss_S, "loss_T": loss_T,
           "da_loss": da_loss, "jitter_loss_S": jitter_loss_S}
    aux.update({f"S_{k}": v for k, v in aux_S.items()})
    aux.update({f"T_{k}": v for k, v in aux_T.items()})
    return loss, aux


# ---------------------------------------------------------------------------
# Self-training / pseudo-label suite (`loss_helper.py:777-1146`)
#
# Dead code in the reference for the four documented train paths — its
# `use_lhs` branch calls `lhs_3d_faster_samecls`, which exists nowhere
# in the repo, and as written its unlabeled-slice label tensors could
# never batch-align with the full-batch head tensors. Re-built here as
# a *runnable* capability: the missing LHS-NMS is realized with the
# working same-class 3D NMS (`eval/nms.py`, = reference `utils/nms.py`
# `nms_3d_faster_samecls:119-173`), and `get_loss_pseudo` slices the
# student tensors to the unlabeled rows so every shape is coherent.
# Label generation is host-side numpy (it was `.cpu().numpy()` + python
# NMS loops in the reference too) and sits OUTSIDE jit, between the
# teacher and student forwards; the losses below it are pure jnp.
# ---------------------------------------------------------------------------


def get_pseudo_labels(pred_center, pred_sem_cls, pred_objectness,
                      pred_heading_scores, pred_heading_residuals,
                      pred_size_scores, pred_size_residuals, config_dict,
                      max_num_obj=64):
    """Teacher predictions -> pseudo GT labels (`loss_helper.py:777-885`).

    Thresholds sigmoid objectness (`obj_threshold`) and softmax class
    confidence (`cls_threshold`), keeps the `max_num_obj` highest
    `pos_obj * max_cls` proposals, optionally suppresses duplicates with
    same-class 3D NMS (`use_lhs`), and decodes argmax heading/size bins
    into label tensors. Inputs are the teacher's unlabeled-row
    predictions; returns numpy arrays
    (label_mask, center_label, sem_cls_label, heading_label,
    heading_residual_label, size_label, size_residual_label, aux)
    with centers of non-labels pushed to -1000 (the reference's padding
    convention, `:883`)."""
    import numpy as np

    from backtoreality_tpu.eval.box3d import (
        flip_axis_to_camera, get_3d_box_batch)
    from backtoreality_tpu.eval.nms import nms_3d_faster_samecls
    from backtoreality_tpu.eval.ap_helper import (
        _vectorized_class2angle, softmax)

    pred_center = np.asarray(pred_center)
    b, k = pred_center.shape[:2]

    pos_obj = 1.0 / (1.0 + np.exp(-np.asarray(pred_objectness)))[:, :, 0]
    objectness_mask = pos_obj > config_dict["obj_threshold"]

    sem_probs = softmax(np.asarray(pred_sem_cls))
    max_cls = sem_probs.max(-1)
    argmax_cls = sem_probs.argmax(-1)
    cls_mask = max_cls > config_dict["cls_threshold"]

    final_mask = cls_mask & objectness_mask
    order = np.argsort(-(pos_obj * max_cls * final_mask), axis=1)
    m = min(max_num_obj, k)  # reference assumes K >= MAX_NUM_OBJ
    inds = order[:, :m]  # (B, m)
    final_mask_sorted = np.take_along_axis(final_mask, inds, axis=1)
    aux = {"pseudo_gt_ratio":
           float(final_mask_sorted.sum()) / final_mask_sorted.size}

    heading_scores = np.asarray(pred_heading_scores)
    argmax_heading = heading_scores.argmax(-1)
    heading_residuals = np.take_along_axis(
        np.asarray(pred_heading_residuals),
        argmax_heading[..., None], axis=2)[..., 0]
    size_scores = np.asarray(pred_size_scores)
    argmax_size = size_scores.argmax(-1)
    size_residuals = np.take_along_axis(
        np.asarray(pred_size_residuals),
        argmax_size[..., None, None], axis=2)[:, :, 0]

    take = lambda a: np.take_along_axis(a, inds, axis=1)  # noqa: E731
    take3 = lambda a: np.take_along_axis(  # noqa: E731
        a, inds[..., None], axis=1)

    center_label = take3(pred_center)
    heading_label = take(argmax_heading)
    heading_residual_label = take(heading_residuals)
    size_label = take(argmax_size)
    size_residual_label = take3(size_residuals)
    sem_cls_label = take(argmax_cls)

    if config_dict.get("use_lhs"):
        cfg = config_dict["dataset_config"]
        heading_angle = _vectorized_class2angle(
            cfg, heading_label, heading_residual_label)
        box_size = cfg.mean_size_arr[size_label] + size_residual_label
        corners = get_3d_box_batch(
            box_size, heading_angle, flip_axis_to_camera(center_label))
        xyz_min = corners.min(axis=2)
        xyz_max = corners.max(axis=2)
        score = take(pos_obj)
        for i in range(b):
            boxes = np.concatenate(
                [xyz_min[i], xyz_max[i], score[i, :, None],
                 sem_cls_label[i, :, None]], axis=1)
            pick = nms_3d_faster_samecls(
                boxes, config_dict["nms_iou"],
                config_dict.get("use_old_type_nms", False))
            keep = np.zeros(m, dtype=bool)
            keep[np.asarray(pick, dtype=np.int64)] = True
            final_mask_sorted[i] &= keep  # (`:871-877`)

    label_mask = final_mask_sorted.astype(np.int64)
    center_label = np.where(
        label_mask[..., None].astype(bool), center_label, -1000.0)
    if m < max_num_obj:  # pad the label slots out to MAX_NUM_OBJ
        pad = max_num_obj - m
        pad2 = lambda a, v: np.concatenate(  # noqa: E731
            [a, np.full((b, pad) + a.shape[2:], v, a.dtype)], axis=1)
        label_mask = pad2(label_mask, 0)
        center_label = pad2(center_label, -1000.0)
        sem_cls_label = pad2(sem_cls_label, 0)
        heading_label = pad2(heading_label, 0)
        heading_residual_label = pad2(heading_residual_label, 0)
        size_label = pad2(size_label, 0)
        size_residual_label = pad2(size_residual_label, 0)
    return (label_mask, center_label, sem_cls_label, heading_label,
            heading_residual_label, size_label, size_residual_label, aux)


def compute_objectness_loss_query_points_pseudo(end_points,
                                                num_decoder_layers):
    """`loss_helper.py:888-957`: per-prefix sigmoid-focal objectness for
    the pseudo stage. The label is the weak chamfer rule against the
    dataset's `center_label` (NOT the pseudo centers — mirroring the
    reference, `:925-947`); every prefix shares it. Returns
    (loss_sum, labels, aux) like the supervised counterpart."""
    loss_sum, labels, aux = compute_objectness_loss_query_points(
        end_points, num_decoder_layers, weak=True)
    label, assignment = labels[_prefixes(num_decoder_layers)[0]]
    aux = dict(aux, unlabeled_objectness_label=label,
               unlabeled_object_assignment=assignment)
    return loss_sum, labels, aux


def compute_box_and_sem_cls_loss_pseudo(end_points, config,
                                        num_decoder_layers, labels,
                                        **reg_kwargs):
    """`loss_helper.py:960-1080`: the per-head box + semantic losses
    against the `unlabeled_*` pseudo-label namespace."""
    return compute_box_and_sem_cls_loss(
        end_points, config, num_decoder_layers, labels,
        label_key_prefix="unlabeled_", **reg_kwargs)


def get_pseudo_detection_loss(end_points, config, num_decoder_layers,
                              box_loss_coef, sem_cls_loss_coef,
                              **reg_kwargs):
    """`loss_helper.py:1083-1107`: box + semantic pseudo losses averaged
    over heads (the objectness sum is computed and logged but NOT added
    to the total, as in the reference)."""
    obj_loss_sum, labels, aux = (
        compute_objectness_loss_query_points_pseudo(
            end_points, num_decoder_layers))
    aux["sum_heads_objectness_loss"] = obj_loss_sum

    box_loss_sum, sem_cls_loss_sum, box_aux = (
        compute_box_and_sem_cls_loss_pseudo(
            end_points, config, num_decoder_layers, labels,
            **reg_kwargs))
    aux.update(box_aux)
    aux["sum_heads_box_loss"] = box_loss_sum
    aux["sum_heads_sem_cls_loss"] = sem_cls_loss_sum

    loss = (1.0 / (num_decoder_layers + 1)
            * (box_loss_coef * box_loss_sum
               + sem_cls_loss_coef * sem_cls_loss_sum)) * 10.0
    aux["unlabeled_detection_loss"] = loss
    return loss, aux


def get_loss_pseudo(end_points, end_points_teacher, config, config_dict,
                    num_decoder_layers, box_loss_coef, sem_cls_loss_coef,
                    teacher_prefix="4head_", **reg_kwargs):
    """`loss_helper.py:1110-1146`: teacher->student consistency loss.

    The batch is ordered [labeled..., unlabeled...]
    (`supervised_mask` marks the labeled rows). The teacher's
    `teacher_prefix` head predictions on the unlabeled rows become
    pseudo labels (`get_pseudo_labels`), and the student's head outputs
    on those same rows are trained against them. Host-side label
    generation; call OUTSIDE jit (jit the returned loss computation via
    the merged label arrays if needed)."""
    import numpy as np

    supervised_mask = np.asarray(end_points["supervised_mask"])
    labeled_num = int((supervised_mask != 0).sum())

    tp_ = teacher_prefix
    (label_mask, center_label, sem_cls_label, heading_label,
     heading_residual_label, size_label, size_residual_label, aux0) = (
        get_pseudo_labels(
            np.asarray(end_points_teacher[f"{tp_}center"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}sem_cls_scores"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}objectness_scores"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}heading_scores"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}heading_residuals"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}size_scores"])[labeled_num:],
            np.asarray(
                end_points_teacher[f"{tp_}size_residuals"])[labeled_num:],
            config_dict))

    # student tensors restricted to the unlabeled rows + pseudo labels
    sub = {k: v[labeled_num:] for k, v in end_points.items()
           if hasattr(v, "ndim") and v.ndim >= 1
           and v.shape[0] == supervised_mask.shape[0]}
    sub.update(
        unlabeled_box_label_mask=jnp.asarray(label_mask),
        unlabeled_center_label=jnp.asarray(center_label),
        unlabeled_sem_cls_label=jnp.asarray(sem_cls_label),
        unlabeled_heading_class_label=jnp.asarray(heading_label),
        unlabeled_heading_residual_label=jnp.asarray(
            heading_residual_label),
        unlabeled_size_class_label=jnp.asarray(size_label),
        unlabeled_size_residual_label=jnp.asarray(size_residual_label),
    )

    consistency_loss, aux = get_pseudo_detection_loss(
        sub, config, num_decoder_layers, box_loss_coef,
        sem_cls_loss_coef, **reg_kwargs)
    aux.update(aux0)
    return consistency_loss, aux
