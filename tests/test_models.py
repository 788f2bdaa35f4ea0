import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepards_tpu.models import densenet1d, heads


@pytest.fixture(scope="module")
def dn18():
    return densenet1d.densenet18()


def test_densenet18_output_shape(dn18):
    x = jnp.ones((4, 1, 224))
    variables = dn18.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, True,
    )
    out = dn18.apply(variables, x, True)
    assert out.shape == (4, dn18.n_out_filters)
    assert dn18.n_out_filters == 128


def test_densenet18_conv_info(dn18):
    ks, ss, ps = dn18.conv_info()
    # initial conv+pool (2) + 4 blocks * 2 layers * 2 convs (16) +
    # 3 transitions * 2 (6) = 24 entries
    assert len(ks) == len(ss) == len(ps) == 24
    assert ks[0] == 7 and ss[0] == 2 and ps[0] == 3


def test_densenet_no_pool_featuremap(dn18):
    x = jnp.ones((2, 1, 224))
    variables = dn18.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, True,
    )
    fmap = dn18.apply(variables, x, True, method=dn18.forward_no_pool)
    # 224 -> conv s2 (112) -> pool s2 (56) -> 3 transitions (28, 14, 7)
    assert fmap.shape == (2, 7, 128)
    assert np.all(np.asarray(fmap) >= 0)  # post-relu


def test_cnn_linear_batched_forward(dn18):
    model = heads.CNNLinearNetwork(breath_block=dn18)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5, 1, 224)),
                    jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    out = model.apply(variables, x, None, True)
    assert out.shape == (3, 2)


def test_cnn_single_breath_linear_shapes(dn18):
    model = heads.CNNSingleBreathLinearNetwork(breath_block=dn18)
    x = jnp.ones((2, 4, 1, 224))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, True,
    )
    out = model.apply(variables, x, None, True)
    assert out.shape == (2, 4, 2)


def test_batch_stat_norm_is_batch_dependent(dn18):
    """Core parity property: normalization must use CURRENT batch stats
    (reference runs BN with track_running_stats=False and never eval())."""
    model = heads.CNNLinearToMean(breath_block=dn18)
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.normal(size=(4, 2, 1, 224)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x1, None, True,
    )
    out_solo = model.apply(variables, x1[:1], None, True)
    out_joint = model.apply(variables, x1, None, True)[:1]
    # same sample, different batch context -> different logits
    assert not np.allclose(np.asarray(out_solo), np.asarray(out_joint))


def test_registry_errors():
    from deepards_tpu.models.registry import get_network_spec

    with pytest.raises(ValueError, match="unknown network"):
        get_network_spec("not_a_network")
