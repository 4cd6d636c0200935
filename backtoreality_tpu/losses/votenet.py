"""VoteNet training criteria.

Functional re-statement of `detection/Votenet/models/loss_helper.py`
(constants :19-22, vote losses :24-109, objectness :111-152, box
:154-228, weak center :242-304, compositions :336-464, focal :467-546,
DA :548-664, jitter :667-803). All functions take `end_points` (model
outputs merged with GT labels, channels-last) and return
``(loss, aux)`` where aux contains every scalar the reference logs plus
label tensors downstream consumers need. Nothing is mutated.

Label keys (produced by the data pipeline, same names as the reference):
  center_label (B,K2,3), box_label_mask (B,K2), sem_cls_label (B,K2),
  heading_class_label (B,K2), heading_residual_label (B,K2),
  size_class_label (B,K2), size_residual_label (B,K2,3),
  vote_label (B,N,9), vote_label_mask (B,N), center_jitter (B,K2,3).
"""

import jax
import jax.numpy as jnp

from backtoreality_tpu.ops import nn_distance, huber_loss
from backtoreality_tpu.losses.common import (
    masked_mean,
    one_hot_f32,
    softmax_ce,
    softmax_focal_loss,
)

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def compute_vote_loss(end_points):
    """`loss_helper.py:24-69`: per-seed min-over-votes min-over-GT-votes
    L1 regression, masked to seeds inside objects."""
    b, num_seed, _ = end_points["seed_xyz"].shape
    vote_xyz = end_points["vote_xyz"]  # (B, num_seed*vf, 3)
    seed_inds = end_points["seed_inds"].astype(jnp.int32)

    seed_gt_votes_mask = jnp.take_along_axis(
        end_points["vote_label_mask"], seed_inds, axis=1
    )  # (B, num_seed)
    seed_gt_votes = jnp.take_along_axis(
        end_points["vote_label"], seed_inds[..., None], axis=1
    )  # (B, num_seed, 9)
    seed_gt_votes = seed_gt_votes + jnp.tile(
        end_points["seed_xyz"], (1, 1, GT_VOTE_FACTOR)
    )

    vote_reshape = vote_xyz.reshape(b * num_seed, -1, 3)
    gt_reshape = seed_gt_votes.reshape(b * num_seed, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(vote_reshape, gt_reshape, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(b, num_seed)
    return masked_mean(votes_dist, seed_gt_votes_mask)


def compute_weak_vote_loss(end_points):
    """`loss_helper.py:71-109`: bidirectional chamfer between votes and
    (weak) GT centers — mean vote->center plus masked center->vote."""
    b, num_seed, _ = end_points["seed_xyz"].shape
    vote_xyz = end_points["vote_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, _, dist2, _ = nn_distance(vote_xyz, gt_center, l1=True)
    dist1 = dist1.reshape(b, num_seed, -1)
    votes_dist = jnp.min(dist1, axis=2)  # (B, num_seed)
    box_label_mask = end_points["box_label_mask"]
    return jnp.mean(votes_dist) + masked_mean(dist2, box_label_mask)


def compute_objectness_loss(end_points):
    """`loss_helper.py:111-152`. Returns (loss, label, mask, assignment)."""
    aggregated_vote_xyz = end_points["aggregated_vote_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclidean_dist1 = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclidean_dist1 < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclidean_dist1 < NEAR_THRESHOLD)
        | (euclidean_dist1 > FAR_THRESHOLD)
    ).astype(jnp.float32)

    loss = softmax_ce(
        end_points["objectness_scores"], objectness_label,
        OBJECTNESS_CLS_WEIGHTS)
    loss = masked_mean(loss, objectness_mask)
    return loss, objectness_label, objectness_mask, ind1


def compute_box_and_sem_cls_loss(end_points, config):
    """`loss_helper.py:154-228`: center chamfer both ways + heading
    cls/reg + size cls/reg + sem cls, objectness-masked."""
    nh = config.num_heading_bin
    ns = config.num_size_cluster
    mean_size_arr = jnp.asarray(config.mean_size_arr, jnp.float32)

    assignment = end_points["object_assignment"].astype(jnp.int32)
    objectness_label = end_points["objectness_label"].astype(jnp.float32)

    pred_center = end_points["center"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, _, dist2, _ = nn_distance(pred_center, gt_center)
    center_loss = (
        masked_mean(dist1, objectness_label)
        + masked_mean(dist2, end_points["box_label_mask"])
    )

    heading_class_label = jnp.take_along_axis(
        end_points["heading_class_label"].astype(jnp.int32), assignment,
        axis=1)
    heading_class_loss = masked_mean(
        softmax_ce(end_points["heading_scores"], heading_class_label),
        objectness_label)

    heading_residual_label = jnp.take_along_axis(
        end_points["heading_residual_label"], assignment, axis=1)
    heading_residual_normalized_label = (
        heading_residual_label / (jnp.pi / nh))
    heading_one_hot = one_hot_f32(heading_class_label, nh)
    heading_residual_normalized_loss = huber_loss(
        jnp.sum(
            end_points["heading_residuals_normalized"] * heading_one_hot,
            -1)
        - heading_residual_normalized_label,
        delta=1.0)
    heading_residual_normalized_loss = masked_mean(
        heading_residual_normalized_loss, objectness_label)

    size_class_label = jnp.take_along_axis(
        end_points["size_class_label"].astype(jnp.int32), assignment,
        axis=1)
    size_class_loss = masked_mean(
        softmax_ce(end_points["size_scores"], size_class_label),
        objectness_label)

    size_residual_label = jnp.take_along_axis(
        end_points["size_residual_label"], assignment[..., None], axis=1)
    size_one_hot = one_hot_f32(size_class_label, ns)  # (B,K,NS)
    pred_size_residual_normalized = jnp.sum(
        end_points["size_residuals_normalized"]
        * size_one_hot[..., None], axis=2)  # (B,K,3)
    mean_size_label = jnp.sum(
        size_one_hot[..., None] * mean_size_arr[None, None], axis=2)
    size_residual_label_normalized = size_residual_label / mean_size_label
    size_residual_normalized_loss = jnp.mean(
        huber_loss(
            pred_size_residual_normalized - size_residual_label_normalized,
            delta=1.0),
        axis=-1)
    size_residual_normalized_loss = masked_mean(
        size_residual_normalized_loss, objectness_label)

    sem_cls_label = jnp.take_along_axis(
        end_points["sem_cls_label"].astype(jnp.int32), assignment, axis=1)
    sem_cls_loss = masked_mean(
        softmax_ce(end_points["sem_cls_scores"], sem_cls_label),
        objectness_label)

    return (center_loss, heading_class_loss,
            heading_residual_normalized_loss, size_class_loss,
            size_residual_normalized_loss, sem_cls_loss)


def compute_center_and_sem_cls_loss(end_points, config):
    """`loss_helper.py:242-304` — the weak-label variant: center chamfer
    + size cls + sem cls only (weak labels carry centers + classes)."""
    assignment = end_points["object_assignment"].astype(jnp.int32)
    objectness_label = end_points["objectness_label"].astype(jnp.float32)

    pred_center = end_points["center"]
    gt_center = end_points["center_label"][:, :, 0:3]
    dist1, _, dist2, _ = nn_distance(pred_center, gt_center)
    center_loss = (
        masked_mean(dist1, objectness_label)
        + masked_mean(dist2, end_points["box_label_mask"])
    )

    size_class_label = jnp.take_along_axis(
        end_points["size_class_label"].astype(jnp.int32), assignment,
        axis=1)
    size_class_loss = masked_mean(
        softmax_ce(end_points["size_scores"], size_class_label),
        objectness_label)

    sem_cls_label = jnp.take_along_axis(
        end_points["sem_cls_label"].astype(jnp.int32), assignment, axis=1)
    sem_cls_loss = masked_mean(
        softmax_ce(end_points["sem_cls_scores"], sem_cls_label),
        objectness_label)

    return center_loss, size_class_loss, sem_cls_loss


def _objectness_stats(end_points, objectness_label, objectness_mask):
    total = objectness_label.shape[0] * objectness_label.shape[1]
    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / total
    neg_ratio = (
        jnp.sum(objectness_mask.astype(jnp.float32)) / total - pos_ratio)
    obj_pred = jnp.argmax(end_points["objectness_scores"], 2)
    obj_acc = masked_mean(
        (obj_pred == objectness_label).astype(jnp.float32),
        objectness_mask)
    return pos_ratio, neg_ratio, obj_acc


def get_loss(end_points, config):
    """FSB criterion (`loss_helper.py:336-400`)."""
    aux = {}
    vote_loss = compute_vote_loss(end_points)
    aux["vote_loss"] = vote_loss

    (objectness_loss, objectness_label, objectness_mask,
     object_assignment) = compute_objectness_loss(end_points)
    aux["objectness_loss"] = objectness_loss
    aux["objectness_label"] = objectness_label
    aux["objectness_mask"] = objectness_mask
    aux["object_assignment"] = object_assignment
    end_points = dict(end_points, objectness_label=objectness_label,
                      object_assignment=object_assignment)

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
         end_points, config)
    box_loss = (center_loss + 0.1 * heading_cls_loss + heading_reg_loss
                + 0.1 * size_cls_loss + size_reg_loss)
    aux.update(center_loss=center_loss, heading_cls_loss=heading_cls_loss,
               heading_reg_loss=heading_reg_loss,
               size_cls_loss=size_cls_loss, size_reg_loss=size_reg_loss,
               sem_cls_loss=sem_cls_loss, box_loss=box_loss)

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss) * 10.0
    aux["loss"] = loss

    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points, objectness_label, objectness_mask)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio, obj_acc=obj_acc)
    return loss, aux


def get_loss_weak(end_points, config):
    """WSB criterion (`loss_helper.py:403-464`)."""
    aux = {}
    vote_loss = compute_weak_vote_loss(end_points)
    aux["vote_loss"] = vote_loss

    (objectness_loss, objectness_label, objectness_mask,
     object_assignment) = compute_objectness_loss(end_points)
    aux["objectness_loss"] = objectness_loss
    aux["objectness_label"] = objectness_label
    aux["objectness_mask"] = objectness_mask
    aux["object_assignment"] = object_assignment
    end_points = dict(end_points, objectness_label=objectness_label,
                      object_assignment=object_assignment)

    center_loss, size_cls_loss, sem_cls_loss = (
        compute_center_and_sem_cls_loss(end_points, config))
    box_loss = center_loss + 0.1 * size_cls_loss
    aux.update(center_loss=center_loss, size_cls_loss=size_cls_loss,
               sem_cls_loss=sem_cls_loss, box_loss=box_loss)

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss) * 10.0
    aux["loss"] = loss

    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points, objectness_label, objectness_mask)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio, obj_acc=obj_acc)
    return loss, aux


def compute_sem_cls_loss(end_points, config):
    """Scene-level multi-label semantic loss (`loss_helper.py:306-333`):
    BCE between the mean-pooled per-proposal class logits and the scene
    class-indicator vector (`cloud_label`)."""
    from backtoreality_tpu.losses.common import sigmoid_bce_with_logits

    cloud_label = end_points["cloud_label"].astype(jnp.float32)
    cloud_pred = jnp.mean(end_points["sem_cls_scores"], axis=1)
    return jnp.mean(sigmoid_bce_with_logits(cloud_pred, cloud_label))


def compute_objectness_loss_boxnet(end_points):
    """BoxNet objectness (`loss_helper_boxnet.py:20-61`): the label is
    the seed's GT vote mask gathered through the aggregation indices —
    no near/far don't-care zone."""
    aggregated_vote_xyz = end_points["aggregated_vote_xyz"]
    gt_center = end_points["center_label"][:, :, 0:3]
    _, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)

    seed_inds = end_points["seed_inds"].astype(jnp.int32)
    seed_labels = jnp.take_along_axis(
        end_points["vote_label_mask"], seed_inds, axis=1)
    agg_inds = end_points["aggregated_vote_inds"].astype(jnp.int32)
    objectness_label = jnp.take_along_axis(
        seed_labels, agg_inds, axis=1).astype(jnp.int32)
    objectness_mask = jnp.ones_like(objectness_label, jnp.float32)

    loss = softmax_ce(end_points["objectness_scores"], objectness_label,
                      OBJECTNESS_CLS_WEIGHTS)
    loss = masked_mean(loss, objectness_mask)
    return loss, objectness_label, objectness_mask, ind1


def get_loss_boxnet(end_points, config):
    """BoxNet criterion (`loss_helper_boxnet.py:64-122`): no vote loss,
    (0.5*obj + box + 0.1*sem) * 10."""
    aux = {}
    (objectness_loss, objectness_label, objectness_mask,
     object_assignment) = compute_objectness_loss_boxnet(end_points)
    aux.update(objectness_loss=objectness_loss,
               objectness_label=objectness_label,
               objectness_mask=objectness_mask,
               object_assignment=object_assignment)
    end_points = dict(end_points, objectness_label=objectness_label,
                      object_assignment=object_assignment)

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
         end_points, config)
    box_loss = (center_loss + 0.1 * heading_cls_loss + heading_reg_loss
                + 0.1 * size_cls_loss + size_reg_loss)
    aux.update(center_loss=center_loss, box_loss=box_loss,
               sem_cls_loss=sem_cls_loss)

    loss = (0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss) * 10.0
    aux["loss"] = loss
    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points, objectness_label, objectness_mask)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio,
               obj_acc=obj_acc)
    return loss, aux


SOURCE_COEFFICIENT = 0.1
DA_COEFFICIENT = 0.5


def _domain_align_loss(end_points_S, end_points_T, objectness_label_S,
                       objectness_label_T):
    """`loss_helper.py:625-654`: local L2-to-domain on objectness-positive
    proposals + global focal (gamma=3), both behind grad reversal."""
    global_S = end_points_S["global_d_pred"]  # (B, 2)
    local_S = end_points_S["local_d_pred"]  # (B, K, 1)
    domain_S = jnp.zeros(global_S.shape[0], jnp.int32)
    w_S = objectness_label_S[..., None].astype(jnp.float32)
    source_dloss = (
        DA_COEFFICIENT * jnp.mean(jnp.square(local_S) * w_S)
        + DA_COEFFICIENT * softmax_focal_loss(global_S, domain_S, gamma=3))

    global_T = end_points_T["global_d_pred"]
    local_T = end_points_T["local_d_pred"]
    domain_T = jnp.ones(global_T.shape[0], jnp.int32)
    w_T = objectness_label_T[..., None].astype(jnp.float32)
    target_dloss = (
        DA_COEFFICIENT * jnp.mean(jnp.square(1.0 - local_T) * w_T)
        + DA_COEFFICIENT * softmax_focal_loss(global_T, domain_T, gamma=3))
    return source_dloss + target_dloss


def _da_supervised_parts(end_points_S, end_points_T, config, aux):
    """Shared S(full)+T(weak) supervision of get_loss_DA{,_jitter}
    (`loss_helper.py:572-623`). Returns the component sums and the
    objectness labels."""
    vote_loss_S = compute_weak_vote_loss(end_points_S)
    vote_loss_T = compute_weak_vote_loss(end_points_T)
    vote_loss = SOURCE_COEFFICIENT * vote_loss_S + vote_loss_T
    aux["vote_loss_S"] = vote_loss_S
    aux["vote_loss_T"] = vote_loss_T

    (objectness_loss_S, objectness_label_S, objectness_mask_S,
     assignment_S) = compute_objectness_loss(end_points_S)
    (objectness_loss_T, objectness_label_T, objectness_mask_T,
     assignment_T) = compute_objectness_loss(end_points_T)
    objectness_loss = (SOURCE_COEFFICIENT * objectness_loss_S
                       + objectness_loss_T)
    aux.update(objectness_loss_S=objectness_loss_S,
               objectness_loss_T=objectness_loss_T)

    ep_S = dict(end_points_S, objectness_label=objectness_label_S,
                object_assignment=assignment_S)
    ep_T = dict(end_points_T, objectness_label=objectness_label_T,
                object_assignment=assignment_T)

    (center_loss_S, heading_cls_loss, heading_reg_loss, size_cls_loss_S,
     size_reg_loss, sem_cls_loss_S) = compute_box_and_sem_cls_loss(
         ep_S, config)
    box_loss_S = (center_loss_S + 0.1 * heading_cls_loss
                  + heading_reg_loss + 0.1 * size_cls_loss_S
                  + size_reg_loss)
    center_loss_T, size_cls_loss_T, sem_cls_loss_T = (
        compute_center_and_sem_cls_loss(ep_T, config))
    box_loss_T = center_loss_T + 0.1 * size_cls_loss_T

    box_loss = SOURCE_COEFFICIENT * box_loss_S + box_loss_T
    sem_cls_loss = (SOURCE_COEFFICIENT * sem_cls_loss_S
                    + sem_cls_loss_T)
    aux.update(center_loss_S=center_loss_S, center_loss_T=center_loss_T,
               box_loss_S=box_loss_S, box_loss_T=box_loss_T)

    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points_S, objectness_label_S, objectness_mask_S)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio, obj_acc=obj_acc)

    return (vote_loss, objectness_loss, box_loss, sem_cls_loss,
            objectness_label_S, objectness_label_T)


def get_loss_DA(end_points_S, end_points_T, config):
    """BR criterion (`loss_helper.py:548-664`): 0.1 x full-supervised
    source + weak target + domain alignment."""
    aux = {}
    (vote_loss, objectness_loss, box_loss, sem_cls_loss,
     objectness_label_S, objectness_label_T) = _da_supervised_parts(
         end_points_S, end_points_T, config, aux)

    da_loss = _domain_align_loss(
        end_points_S, end_points_T, objectness_label_S,
        objectness_label_T)
    aux["da_loss"] = da_loss

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss + da_loss) * 10.0
    aux["loss"] = loss
    return loss, aux


def compute_jitter_loss(end_points):
    """`loss_helper.py:667-672`: MSE(jitter_pred, center_jitter)."""
    return jnp.mean(jnp.square(
        end_points["center_jitter"] - end_points["jitter_pred"]))


def refine_center_labels(end_points_S, end_points_T, epoch):
    """CenterRefine label refinement (`loss_helper.py:698-701`):
    progressively subtract the (GT for source / predicted-detached for
    target) jitter from the weak center labels. Returns updated
    end_points dicts (functional; the reference mutates in place)."""
    ramp = jnp.minimum(epoch / 60.0, 1.0)
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


def get_loss_DA_jitter(end_points_S, end_points_T, epoch, config):
    """BR+CenterRefine criterion (`loss_helper.py:675-803`)."""
    end_points_S, end_points_T = refine_center_labels(
        end_points_S, end_points_T, epoch)

    aux = {}
    jitter_loss_S = compute_jitter_loss(end_points_S)
    aux["jitter_loss_S"] = jitter_loss_S

    (vote_loss, objectness_loss, box_loss, sem_cls_loss,
     objectness_label_S, objectness_label_T) = _da_supervised_parts(
         end_points_S, end_points_T, config, aux)

    da_loss = _domain_align_loss(
        end_points_S, end_points_T, objectness_label_S,
        objectness_label_T)
    aux["da_loss"] = da_loss

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss + da_loss
            + SOURCE_COEFFICIENT * jitter_loss_S) * 10.0
    aux["loss"] = loss
    return loss, aux


def get_loss_DA_separate(end_points_S, end_points_T, config):
    """Experimental DA variant (`loss_helper.py:806-907`; unused by the
    four documented train paths). Differences vs `get_loss_DA`: both
    domains are weighted EQUALLY (no 0.1 source coefficient), the
    source keeps the full seed-vote loss (`compute_vote_loss`, not the
    weak Chamfer), and domain alignment is the local per-proposal
    L2-to-domain term only (coefficient 1.0, `:887-897`) — no global
    focal discriminator."""
    aux = {}
    vote_loss_S = compute_vote_loss(end_points_S)
    vote_loss_T = compute_weak_vote_loss(end_points_T)
    vote_loss = vote_loss_S + vote_loss_T
    aux.update(vote_loss_S=vote_loss_S, vote_loss_T=vote_loss_T)

    (objectness_loss_S, objectness_label_S, objectness_mask_S,
     assignment_S) = compute_objectness_loss(end_points_S)
    (objectness_loss_T, objectness_label_T, _,
     assignment_T) = compute_objectness_loss(end_points_T)
    objectness_loss = objectness_loss_S + objectness_loss_T
    aux.update(objectness_loss_S=objectness_loss_S,
               objectness_loss_T=objectness_loss_T)

    ep_S = dict(end_points_S, objectness_label=objectness_label_S,
                object_assignment=assignment_S)
    ep_T = dict(end_points_T, objectness_label=objectness_label_T,
                object_assignment=assignment_T)

    (center_loss_S, heading_cls_loss, heading_reg_loss, size_cls_loss_S,
     size_reg_loss, sem_cls_loss_S) = compute_box_and_sem_cls_loss(
         ep_S, config)
    center_loss_T, size_cls_loss_T, sem_cls_loss_T = (
        compute_center_and_sem_cls_loss(ep_T, config))
    box_loss = (center_loss_S + 0.1 * heading_cls_loss + heading_reg_loss
                + 0.1 * size_cls_loss_S + size_reg_loss
                + center_loss_T + 0.1 * size_cls_loss_T)
    sem_cls_loss = sem_cls_loss_S + sem_cls_loss_T
    aux.update(center_loss_S=center_loss_S, center_loss_T=center_loss_T,
               sem_cls_loss=sem_cls_loss, box_loss=box_loss)

    # local alignment only (`:887-897`): source pushed to 0, target to 1,
    # each proposal weighted by its positive-objectness softmax
    w_S = jax.nn.softmax(end_points_S["objectness_scores"], -1)[..., 1:]
    w_T = jax.nn.softmax(end_points_T["objectness_scores"], -1)[..., 1:]
    da_loss = (jnp.mean(jnp.square(end_points_S["local_d_pred"]) * w_S)
               + jnp.mean(jnp.square(1.0 - end_points_T["local_d_pred"])
                          * w_T))
    aux["da_loss"] = da_loss

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss + da_loss) * 10.0
    aux["loss"] = loss
    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points_S, objectness_label_S, objectness_mask_S)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio, obj_acc=obj_acc)
    return loss, aux


def get_loss_cam(end_points, config):
    """Class-activation-map pretext loss (`loss_helper.py:910-943`;
    unused experiment — the model that produced the `cam` tensor was
    removed from the reference, only `Pointnet2Backbone_cam` and this
    criterion survive): BCE between the globally-average-pooled per-class
    activation map (B, num_proposal, num_class here, channels-last) and
    the scene class-indicator vector."""
    from backtoreality_tpu.losses.common import sigmoid_bce_with_logits

    cam_gap = jnp.mean(end_points["cam"], axis=1)  # (B, num_class)
    cloud_label = end_points["cloud_label"].astype(jnp.float32)
    loss = jnp.mean(sigmoid_bce_with_logits(cam_gap, cloud_label))
    return loss, {"loss": loss}


def get_loss_DA_cam(end_points_S, end_points_T, config):
    """CAM-augmented DA variant (`loss_helper.py:946-1039`; unused
    experiment). Full supervision on the source (incl. the full seed
    vote loss), scene-level BCE semantics on the target
    (`compute_sem_cls_loss`, weighted 2x), and a three-term alignment:
    local L2 + global focal (gamma=5) + vote-feature focal (gamma=3),
    each at 0.5. Requires `vote_feature_d_pred` (B, 2) from a
    vote-feature discriminator."""
    aux = {}
    vote_loss = compute_vote_loss(end_points_S)
    aux["vote_loss"] = vote_loss

    (objectness_loss, objectness_label_S, objectness_mask_S,
     assignment_S) = compute_objectness_loss(end_points_S)
    aux["objectness_loss"] = objectness_loss

    ep_S = dict(end_points_S, objectness_label=objectness_label_S,
                object_assignment=assignment_S)
    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss_S) = compute_box_and_sem_cls_loss(
         ep_S, config)
    box_loss = (center_loss + 0.1 * heading_cls_loss + heading_reg_loss
                + 0.1 * size_cls_loss + size_reg_loss)
    sem_cls_loss_T = compute_sem_cls_loss(end_points_T, config)
    sem_cls_loss = sem_cls_loss_S + 2.0 * sem_cls_loss_T
    aux.update(box_loss=box_loss, sem_cls_loss_T=sem_cls_loss_T)

    def _dloss(ep, domain_value, flip_local):
        global_d = ep["global_d_pred"]
        vote_d = ep["vote_feature_d_pred"]
        local_d = ep["local_d_pred"]
        domain = jnp.full(global_d.shape[0], domain_value, jnp.int32)
        w = jax.nn.softmax(ep["objectness_scores"], -1)[..., 1:]
        local = 1.0 - local_d if flip_local else local_d
        return (0.5 * jnp.mean(jnp.square(local) * w)
                + 0.5 * softmax_focal_loss(global_d, domain, gamma=5)
                + 0.5 * softmax_focal_loss(vote_d, domain, gamma=3))

    da_loss = (_dloss(end_points_S, 0, False)
               + _dloss(end_points_T, 1, True))
    aux["da_loss"] = da_loss

    loss = (vote_loss + 0.5 * objectness_loss + box_loss
            + 0.1 * sem_cls_loss + da_loss) * 10.0
    aux["loss"] = loss
    pos_ratio, neg_ratio, obj_acc = _objectness_stats(
        end_points_S, objectness_label_S, objectness_mask_S)
    aux.update(pos_ratio=pos_ratio, neg_ratio=neg_ratio, obj_acc=obj_acc)
    return loss, aux
