"""Shared loss primitives."""

import jax
import jax.numpy as jnp


def masked_mean(x, mask, eps: float = 1e-6):
    """sum(x*mask)/(sum(mask)+eps) — the reference's pervasive reduction."""
    mask = mask.astype(jnp.float32)
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def softmax_ce(logits, labels, class_weights=None):
    """Per-element cross entropy (torch CrossEntropyLoss reduction='none').

    logits (..., C); labels (...) int. With class_weights (C,), each
    element's loss is scaled by the weight of its true class.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[labels]
        nll = nll * w
    return nll


def sigmoid_bce_with_logits(logits, targets):
    """Numerically-stable BCE-with-logits (tf/torch formulation)."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def softmax_focal_loss(logits, labels, gamma: float = 2.0,
                       eps: float = 1e-12):
    """Reference `FocalLoss` softmax branch with alpha=1
    (`loss_helper.py:467-546`): -(1-p)^gamma log p, mean-reduced."""
    p = jax.nn.softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    pt = jnp.take_along_axis(p, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(-((1.0 - pt) ** gamma) * jnp.log(pt + eps))


def one_hot_f32(labels, num: int):
    return jax.nn.one_hot(labels.astype(jnp.int32), num,
                          dtype=jnp.float32)
