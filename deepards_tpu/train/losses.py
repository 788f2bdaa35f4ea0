"""Loss registry: BCE-with-logits, vacillating, confidence-penalty, MSE,
focal, and helpers (reference: deepards/loss.py:7-35,
deepards/train_ards_detector.py:526-532,673-674,1194-1247).

All classification losses take optional per-row ``weights`` (B,) so that
sharding-padded rows contribute zero — with weights=None they reduce to the
reference's plain ``.mean()`` semantics.
"""
import jax
import jax.numpy as jnp
import optax


def _weighted_mean(per_row, weights):
    if weights is None:
        return per_row.mean()
    return (per_row * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def _row_reduce(elementwise):
    """Mean over everything but the leading batch axis."""
    axes = tuple(range(1, elementwise.ndim))
    return elementwise.mean(axis=axes) if axes else elementwise


def bce_with_logits(logits, target, weights=None):
    """torch.nn.BCEWithLogitsLoss equivalent: elementwise sigmoid BCE,
    mean over all elements."""
    per_row = _row_reduce(optax.sigmoid_binary_cross_entropy(logits, target))
    return _weighted_mean(per_row, weights)


def mse(pred, target, weights=None):
    return _weighted_mean(_row_reduce((pred - target) ** 2), weights)


def mae(pred, target, weights=None):
    return _weighted_mean(_row_reduce(jnp.abs(pred - target)), weights)


def vacillating_loss(logits, target, alpha, weights=None):
    """BCE + piecewise -log penalty pushing per-window mean softmax away
    from 0.5 (reference: deepards/loss.py:7-23).

    The reference's in-place nan/overflow patch-up
    (``lh[(lh > alpha) | isnan(lh)] = rh[rh <= alpha]``) relies on
    incidental shape agreement; we implement the intent: use the
    right-hand branch where the left-hand value is invalid, then cap at
    alpha.
    """
    bce = bce_with_logits(logits, target, weights)
    p = jax.nn.softmax(logits, axis=-1)
    frac = p.sum(axis=1) / p.shape[1]
    lh = -jnp.log(2 * (jnp.exp(-alpha) - 1) * frac + 1)
    rh = -jnp.log(2 * jnp.exp(-alpha) * (1 - frac) + 2 * frac - 1)
    lh = jnp.where(jnp.isnan(lh) | (lh > alpha), rh, lh)
    lh = jnp.minimum(lh, alpha)
    per_row = _row_reduce(lh)
    return bce + _weighted_mean(per_row, weights)


def confidence_penalty_loss(logits, target, beta, weights=None):
    """BCE - beta * entropy (reference: deepards/loss.py:26-35)."""
    bce = bce_with_logits(logits, target, weights)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    confidence = -_weighted_mean(_row_reduce(beta * p * logp), weights)
    return bce - confidence


def focal_loss(logits, target, alpha=0.25, gamma=2.0, weights=None):
    """torchvision.ops.sigmoid_focal_loss equivalent (mean reduction);
    used by the detection path."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, target)
    p_t = p * target + (1 - p) * (1 - target)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * target + (1 - alpha) * (1 - target)
        loss = alpha_t * loss
    return _weighted_mean(_row_reduce(loss), weights)


def get_classification_loss(loss_func, valpha=float("inf"), conf_beta=1.0):
    """Mirror of the mixin criterion selection
    (reference: train_ards_detector.py:526-532)."""
    if loss_func == "vacillating":
        return lambda logits, target, weights=None: vacillating_loss(
            logits, target, valpha, weights
        )
    if loss_func == "confidence":
        return lambda logits, target, weights=None: confidence_penalty_loss(
            logits, target, conf_beta, weights
        )
    if loss_func == "bce":
        return bce_with_logits
    raise ValueError("unknown loss_func: {}".format(loss_func))
