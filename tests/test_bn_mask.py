"""Pad-proof BatchStatNorm statistics.

The reference feeds the final partial batch of every epoch at its TRUE
size, so batch statistics cover real rows only (reference:
deepards/train_ards_detector.py:424-448 — track_running_stats=False and
torch's DataLoader keeps the short final batch).  The rebuild pads every
batch to a fixed shape; these tests pin that the ``bn_row_mask`` scope
makes the padded dispatch produce EXACTLY the true-size results on the
real rows, independent of pad content, across the layer, the jitted
steps, and the parallel-fold formulation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepards_tpu.models import densenet1d, heads
from deepards_tpu.models.layers import BatchStatNorm, bn_row_mask


@pytest.fixture(scope="module")
def dn18():
    return densenet1d.densenet18()


def test_layer_masked_stats_equal_true_size():
    """Masked statistics over a padded batch == a true-size dispatch."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 10, 4)), jnp.float32)
    layer = BatchStatNorm()
    params = layer.init(jax.random.PRNGKey(0), x)
    true_size = layer.apply(params, x[:5])
    # pad rows carry garbage, NOT zeros — masked stats must not see them
    padded = jnp.concatenate(
        [x[:5], jnp.full((3, 10, 4), 7.5, jnp.float32)], axis=0
    )
    mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    with bn_row_mask(mask):
        out = layer.apply(params, padded)
    np.testing.assert_allclose(
        np.asarray(out[:5]), np.asarray(true_size), rtol=1e-6, atol=1e-6
    )


def test_layer_all_ones_mask_is_noop():
    """With no pad rows the masked reduction equals the unmasked one to
    within compiler rounding (the sums are mathematically identical; XLA
    may fuse the two expressions differently, so 1-ULP slack)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 7, 3)), jnp.float32)
    layer = BatchStatNorm()
    params = layer.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(layer.apply(params, x))
    with bn_row_mask(jnp.ones(6, jnp.float32)):
        masked = np.asarray(layer.apply(params, x))
    np.testing.assert_allclose(plain, masked, rtol=0, atol=1e-6)


def test_layer_shape_mismatch_ignored():
    """A scoped mask whose length doesn't match the leading axis (e.g.
    per-sequence nn.vmap lifts under bn_scope='sequence') is ignored."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, 7, 3)), jnp.float32)
    layer = BatchStatNorm()
    params = layer.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(layer.apply(params, x))
    with bn_row_mask(jnp.ones(16, jnp.float32)):
        masked = np.asarray(layer.apply(params, x))
    assert (plain == masked).all()


def test_final_batch_logits_match_true_size_dispatch(dn18):
    """The VERDICT differential: final-batch logits from a padded
    dispatch == an unpadded true-size dispatch (mask expanded to the
    B*S backbone rows, exactly as steps.py threads it)."""
    model = heads.CNNLinearNetwork(breath_block=dn18)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 2, 1, 224)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    true_logits = model.apply(variables, x, None, True)
    padded = jnp.concatenate(
        [x, jnp.zeros((3, 2, 1, 224), jnp.float32)], axis=0
    )
    mask = jnp.asarray([1.0] * 5 + [0.0] * 3, jnp.float32)
    with bn_row_mask(jnp.repeat(mask, 2)):
        padded_logits = model.apply(variables, padded, None, True)
    np.testing.assert_allclose(
        np.asarray(padded_logits[:5]), np.asarray(true_logits),
        rtol=1e-5, atol=1e-5,
    )


def test_eval_step_pad_content_invariant(dn18):
    """Under the jitted eval step, pad rows may carry ANYTHING without
    changing real-row outputs or the loss — the property that unifies
    the host zero-pad and device-cache cyclic-tile paths."""
    from deepards_tpu.train import losses as loss_lib
    from deepards_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = heads.CNNLinearNetwork(breath_block=dn18)
    tx = make_optimizer()
    rng = np.random.default_rng(4)
    real = rng.normal(size=(5, 2, 1, 224)).astype(np.float32)
    target = np.zeros((8, 2), np.float32)
    target[np.arange(8), rng.integers(0, 2, 8)] = 1.0

    def padded_with(fill):
        data = np.concatenate([real, fill.astype(np.float32)], axis=0)
        return {"data": jnp.asarray(data), "target": jnp.asarray(target)}

    batch_zero = padded_with(np.zeros((3, 2, 1, 224)))
    batch_junk = padded_with(rng.normal(size=(3, 2, 1, 224)) * 50.0)
    mask = jnp.asarray([1.0] * 5 + [0.0] * 3)

    _, eval_step, _, _ = make_train_step(
        model, tx, loss_lib.get_classification_loss("bce"),
        compute_dtype=None,
    )
    state = create_train_state(
        model, tx, {"data": np.asarray(batch_zero["data"])},
        jax.random.PRNGKey(7),
    )
    _, loss0, out0 = eval_step(state, batch_zero, mask)
    _, loss1, out1 = eval_step(state, batch_junk, mask)
    assert float(loss0) == float(loss1)
    np.testing.assert_array_equal(
        np.asarray(out0[:5]), np.asarray(out1[:5])
    )


def test_train_step_final_partial_batch_matches_reference_semantics(dn18):
    """Gradients from a padded train step equal a true-size train step:
    the reference trains its short final batch at true size
    (train_ards_detector.py:139-173 with drop_last=False), so the padded
    formulation must produce the same parameter update."""
    from deepards_tpu.train import losses as loss_lib
    from deepards_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = heads.CNNLinearNetwork(breath_block=dn18)
    tx = make_optimizer()
    rng = np.random.default_rng(5)
    real = rng.normal(size=(5, 2, 1, 224)).astype(np.float32)
    t5 = np.zeros((5, 2), np.float32)
    t5[np.arange(5), rng.integers(0, 2, 5)] = 1.0

    def run(data, target, mask, batch_rows):
        train_step, _, _, _ = make_train_step(
            model, tx, loss_lib.get_classification_loss("bce"),
            compute_dtype=None, dropout_active=False,
        )
        state = create_train_state(
            model, tx, {"data": data[:batch_rows]}, jax.random.PRNGKey(9)
        )
        batch = {"data": jnp.asarray(data), "target": jnp.asarray(target)}
        state, loss = train_step(state, batch, jnp.asarray(mask))
        return float(loss), jax.tree_util.tree_map(np.asarray, state.params)

    loss_true, params_true = run(real, t5, np.ones(5, np.float32), 5)
    padded = np.concatenate(
        [real, np.zeros((3, 2, 1, 224), np.float32)], axis=0
    )
    t8 = np.concatenate([t5, np.zeros((3, 2), np.float32)], axis=0)
    loss_pad, params_pad = run(
        padded, t8, np.asarray([1.0] * 5 + [0.0] * 3, np.float32), 8
    )
    assert abs(loss_true - loss_pad) < 1e-6
    flat_t = jax.tree_util.tree_leaves(params_true)
    flat_p = jax.tree_util.tree_leaves(params_pad)
    for a, b in zip(flat_t, flat_p):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
