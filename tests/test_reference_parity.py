"""Differential parity tests against the reference's OWN torch code.

These ground the ±0.5% AUC-parity claim: reference model weights are
transplanted into the flax rebuilds and logits must agree to <=1e-4
(reference: deepards/models/densenet.py:83-275,
deepards/models/torch_cnn_linear_network.py:92-113).

The reference modules are loaded from /root/reference at test time
(read-only import for differential testing — no code is copied).

Note on norm semantics: the reference's python per-sample loop feeds one
sequence's S windows per breath_block call, so BatchNorm
(track_running_stats=False) statistics span a single sequence.  The TPU
build folds (B*S) windows into one super-batch.  With batch=1 the two are
bitwise-identical semantics, which is what these tests pin down; the
super-batch normalization is a documented design shift (PARITY.md).
"""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF = "/root/reference/deepards/models"


def _load_ref(name, fname):
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_densenet():
    return _load_ref("ref_densenet", "densenet.py")


@pytest.fixture(scope="module")
def ref_cnn_linear():
    return _load_ref("ref_cnn_linear", "torch_cnn_linear_network.py")


def _t2f_conv(w):
    """torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out)."""
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 1, 0)))


def _t2f_norm(mod):
    return {
        "scale": jnp.asarray(mod.weight.detach().numpy()),
        "bias": jnp.asarray(mod.bias.detach().numpy()),
    }


def _conv_tree(w):
    return {"Conv_0": {"kernel": _t2f_conv(w)}}


def transplant_densenet(tnet, block_config):
    """Map reference DenseNet state into the DenseNet1D flax param tree.

    Flax naming (single compact ``features`` method, call order):
    Conv1d_0, BatchStatNorm_0, DenseLayer_0.., Transition_0.., BatchStatNorm_1.
    """
    f = tnet.features
    params = {
        "Conv1d_0": _conv_tree(f.conv0.weight),
        "BatchStatNorm_0": _t2f_norm(f.norm0),
        "BatchStatNorm_1": _t2f_norm(f.norm5),
    }
    layer_i = 0
    for bi, n_layers in enumerate(block_config):
        block = getattr(f, "denseblock{}".format(bi + 1))
        for li in range(n_layers):
            dl = getattr(block, "denselayer{}".format(li + 1))
            params["DenseLayer_{}".format(layer_i)] = {
                "BatchStatNorm_0": _t2f_norm(dl.norm1),
                "Conv1d_0": _conv_tree(dl.conv1.weight),
                "BatchStatNorm_1": _t2f_norm(dl.norm2),
                "Conv1d_1": _conv_tree(dl.conv2.weight),
            }
            layer_i += 1
        if bi != len(block_config) - 1:
            tr = getattr(f, "transition{}".format(bi + 1))
            params["Transition_{}".format(bi)] = {
                "BatchStatNorm_0": _t2f_norm(tr.norm),
                "Conv1d_0": _conv_tree(tr.conv.weight),
            }
    return params


def test_densenet18_forward_parity(ref_densenet):
    """Reference densenet18 weights -> DenseNet1D: pooled features match."""
    from deepards_tpu.models.densenet1d import densenet18

    torch.manual_seed(0)
    tnet = ref_densenet.densenet18()
    tnet.eval()  # disables dropout; BN still uses batch stats (no buffers)

    model = densenet18()
    params = transplant_densenet(tnet, (2, 2, 2, 2))

    x = np.random.default_rng(0).normal(size=(20, 1, 224)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    out = model.apply(
        {"params": params}, jnp.asarray(x), True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


def test_densenet18_forward_no_pool_parity(ref_densenet):
    """Pre-pool feature maps (GradCAM/ProtoPNet surface) match too."""
    from deepards_tpu.models.densenet1d import densenet18

    torch.manual_seed(1)
    tnet = ref_densenet.densenet18()
    tnet.eval()
    model = densenet18()
    params = transplant_densenet(tnet, (2, 2, 2, 2))

    x = np.random.default_rng(1).normal(size=(6, 1, 224)).astype(np.float32)
    with torch.no_grad():
        ref_fmap = tnet.forward_no_pool(torch.from_numpy(x)).numpy()
    fmap = model.apply(
        {"params": params}, jnp.asarray(x), True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        method=lambda m, xx, det: m.forward_no_pool(xx, det),
    )
    # ours is (N, L', C); reference is (N, C, L')
    np.testing.assert_allclose(
        np.asarray(fmap).transpose(0, 2, 1), ref_fmap, atol=1e-4, rtol=1e-4
    )


def test_cnn_linear_end_to_end_parity(ref_densenet, ref_cnn_linear):
    """Full cnn_linear logits parity, weights transplanted end to end
    (reference: torch_cnn_linear_network.py:92-113).  batch=1 sequence so
    the reference's per-sequence BN statistics match the super-batch."""
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    torch.manual_seed(2)
    S = 20
    tback = ref_densenet.densenet18()
    tnet = ref_cnn_linear.CNNLinearNetwork(
        tback, sequence_size=S, metadata_features=0
    )
    tnet.eval()

    model = CNNLinearNetwork(breath_block=densenet18())
    params = {
        "breath_block": transplant_densenet(tback, (2, 2, 2, 2)),
        "Dense_0": {
            "kernel": jnp.asarray(
                tnet.linear_final.weight.detach().numpy().T
            ),
            "bias": jnp.asarray(tnet.linear_final.bias.detach().numpy()),
        },
    }

    x = np.random.default_rng(2).normal(
        size=(1, S, 1, 224)
    ).astype(np.float32)
    with torch.no_grad():
        ref_logits = tnet(torch.from_numpy(x), None).numpy()
    logits = model.apply(
        {"params": params}, jnp.asarray(x), None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, atol=1e-4, rtol=1e-4
    )


def test_cnn_linear_parity_multi_sequence(ref_densenet, ref_cnn_linear):
    """Multi-sequence batch: per-sequence BN via a vmapped apply matches
    the reference loop sequence-for-sequence (the exact-parity execution
    mode; the default super-batch mode is a documented shift)."""
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    torch.manual_seed(3)
    S, B = 10, 3
    tback = ref_densenet.densenet18()
    tnet = ref_cnn_linear.CNNLinearNetwork(
        tback, sequence_size=S, metadata_features=0
    )
    tnet.eval()

    model = CNNLinearNetwork(breath_block=densenet18())
    params = {
        "breath_block": transplant_densenet(tback, (2, 2, 2, 2)),
        "Dense_0": {
            "kernel": jnp.asarray(
                tnet.linear_final.weight.detach().numpy().T
            ),
            "bias": jnp.asarray(tnet.linear_final.bias.detach().numpy()),
        },
    }

    x = np.random.default_rng(3).normal(
        size=(B, S, 1, 224)
    ).astype(np.float32)
    with torch.no_grad():
        ref_logits = tnet(torch.from_numpy(x), None).numpy()

    def one_seq(seq):
        return model.apply(
            {"params": params}, seq[None], None, True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )[0]

    logits = jax.vmap(one_seq)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, atol=1e-4, rtol=1e-4
    )

    # the bn_scope='sequence' config mode makes the SAME exactness a
    # plain apply — no vmap trick needed (the production switch for
    # reference-exact semantics; registry._bn_scope)
    model_seq = CNNLinearNetwork(breath_block=densenet18(),
                                 bn_scope="sequence")
    logits_seq = model_seq.apply(
        {"params": params}, jnp.asarray(x), None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(logits_seq), ref_logits, atol=1e-4, rtol=1e-4
    )


def transplant_resnet18(tnet):
    """Map reference ResNet(BasicBlock, [2,2,2,2]) state into the
    ResNet1D flax tree (reference: models/resnet.py:81-163).

    Flax call order in features(): Conv1d_0, BatchStatNorm_0, then
    BasicBlock_0..7 (per block: Conv1d_0/BatchStatNorm_0/Conv1d_1/
    BatchStatNorm_1 + Conv1d_2/BatchStatNorm_2 when downsampling)."""
    params = {
        "Conv1d_0": _conv_tree(tnet.conv1.weight),
        "BatchStatNorm_0": _t2f_norm(tnet.bn1),
    }
    bi = 0
    for layer_idx in range(1, 5):
        layer = getattr(tnet, "layer{}".format(layer_idx))
        for block in layer:
            tree = {
                "Conv1d_0": _conv_tree(block.conv1.weight),
                "BatchStatNorm_0": _t2f_norm(block.bn1),
                "Conv1d_1": _conv_tree(block.conv2.weight),
                "BatchStatNorm_1": _t2f_norm(block.bn2),
            }
            if block.downsample is not None:
                tree["Conv1d_2"] = _conv_tree(block.downsample[0].weight)
                tree["BatchStatNorm_2"] = _t2f_norm(block.downsample[1])
            params["BasicBlock_{}".format(bi)] = tree
            bi += 1
    return params


def test_resnet18_forward_parity():
    """Reference resnet18 weights -> ResNet1D: pooled features match.
    The reference resnet's BatchNorm keeps running stats but train()-mode
    normalization uses batch statistics — exactly BatchStatNorm."""
    ref_resnet = _load_ref("ref_resnet", "resnet.py")
    from deepards_tpu.models.resnet1d import resnet18

    torch.manual_seed(4)
    tnet = ref_resnet.resnet18()
    tnet.train()  # batch-stat normalization; resnet has no dropout

    model = resnet18()
    params = transplant_resnet18(tnet)
    x = np.random.default_rng(4).normal(size=(10, 1, 224)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4,
                               rtol=1e-4)


def test_vgg11_bn_forward_parity():
    """Reference vgg11_bn weights -> VGG1D: flattened features match
    (reference: models/vgg.py:10-145)."""
    ref_vgg = _load_ref("ref_vgg", "vgg.py")
    from deepards_tpu.models.vgg1d import vgg11_bn

    torch.manual_seed(5)
    tnet = ref_vgg.vgg11_bn()
    tnet.train()  # batch-stat normalization; vgg has no dropout layers

    model = vgg11_bn()
    params = {}
    conv_i = norm_i = 0
    for mod in tnet.features:
        name = type(mod).__name__
        if name == "Conv1d":
            params["Conv1d_{}".format(conv_i)] = {"Conv_0": {
                "kernel": _t2f_conv(mod.weight),
                "bias": jnp.asarray(mod.bias.detach().numpy()),
            }}
            conv_i += 1
        elif name == "BatchNorm1d":
            params["BatchStatNorm_{}".format(norm_i)] = _t2f_norm(mod)
            norm_i += 1

    x = np.random.default_rng(5).normal(size=(6, 1, 224)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4,
                               rtol=1e-4)


def test_cnn_lstm_end_to_end_parity(ref_densenet):
    """Full cnn_lstm per-window logits parity
    (reference: torch_cnn_lstm_combo.py:6-50).  torch LSTM gate rows are
    ordered [i, f, g, o]; flax OptimizedLSTMCell keeps input kernels
    i{i,f,g,o} (no bias) and hidden kernels h{i,f,g,o} (bias), so the
    transplanted bias is bias_ih + bias_hh.  batch=1 sequence matches the
    reference's per-sequence BN statistics."""
    ref_lstm = _load_ref("ref_cnn_lstm", "torch_cnn_lstm_combo.py")
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.recurrent import CNNLSTMNetwork

    torch.manual_seed(6)
    H = 16
    tback = ref_densenet.densenet18()
    tnet = ref_lstm.CNNLSTMNetwork(
        tback, metadata_features=0, bm_to_linear=False,
        lstm_hidden_units=H,
    )
    tnet.eval()

    model = CNNLSTMNetwork(breath_block=densenet18(), lstm_hidden_units=H)

    lstm = tnet.lstm
    w_ih = lstm.weight_ih_l0.detach().numpy()  # (4H, F) rows [i,f,g,o]
    w_hh = lstm.weight_hh_l0.detach().numpy()  # (4H, H)
    b = (lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy()
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    cell = {}
    for name, gi in gates.items():
        sl = slice(gi * H, (gi + 1) * H)
        cell["i" + name] = {"kernel": jnp.asarray(w_ih[sl].T)}
        cell["h" + name] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b[sl]),
        }
    params = {
        "breath_block": transplant_densenet(tback, (2, 2, 2, 2)),
        "OptimizedLSTMCell_0": cell,
        "Dense_0": {
            "kernel": jnp.asarray(
                tnet.linear_final.weight.detach().numpy().T
            ),
            "bias": jnp.asarray(tnet.linear_final.bias.detach().numpy()),
        },
    }

    S = 6
    x = np.random.default_rng(6).normal(size=(1, S, 1, 224)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_logits, _ = tnet(
            torch.from_numpy(x), torch.full((1, S, 9), float("nan")), None
        )
    out = model.apply(
        {"params": params}, jnp.asarray(x), None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    if isinstance(out, tuple):
        out = out[0]
    np.testing.assert_allclose(
        np.asarray(out), ref_logits.numpy(), atol=1e-4, rtol=1e-4
    )


def test_se_resnet18_forward_parity():
    """Reference se_resnet18 weights -> SENet1D: pooled features match
    (reference: models/senet.py:15-69, 171-330, 343)."""
    ref_senet = _load_ref("ref_senet", "senet.py")
    from deepards_tpu.models.senet1d import se_resnet18

    torch.manual_seed(7)
    tnet = ref_senet.se_resnet18()
    tnet.train()  # batch-stat norm; se_resnet has no dropout

    model = se_resnet18()
    layer0 = tnet.layer0
    params = {
        "Conv1d_0": _conv_tree(layer0.conv1.weight),
        "BatchStatNorm_0": _t2f_norm(layer0.bn1),
    }
    bi = 0
    for layer_idx in range(1, 5):
        layer = getattr(tnet, "layer{}".format(layer_idx))
        for block in layer:
            tree = {
                "Conv1d_0": _conv_tree(block.conv1.weight),
                "BatchStatNorm_0": _t2f_norm(block.bn1),
                "Conv1d_1": _conv_tree(block.conv2.weight),
                "BatchStatNorm_1": _t2f_norm(block.bn2),
                "SEModule_0": {
                    "Conv1d_0": {"Conv_0": {
                        "kernel": _t2f_conv(block.se_module.fc1.weight),
                        "bias": jnp.asarray(
                            block.se_module.fc1.bias.detach().numpy()
                        ),
                    }},
                    "Conv1d_1": {"Conv_0": {
                        "kernel": _t2f_conv(block.se_module.fc2.weight),
                        "bias": jnp.asarray(
                            block.se_module.fc2.bias.detach().numpy()
                        ),
                    }},
                },
            }
            if block.downsample is not None:
                tree["Conv1d_2"] = _conv_tree(block.downsample[0].weight)
                tree["BatchStatNorm_2"] = _t2f_norm(block.downsample[1])
            params["SEBasicBlock_{}".format(bi)] = tree
            bi += 1
    x = np.random.default_rng(7).normal(size=(10, 1, 224)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4,
                               rtol=1e-4)


def test_densenet18_2d_feature_parity():
    """Reference 2D densenet18 weights -> DenseNet2D: pre-pool feature
    maps match (the reference 2D backbone's forward IS the feature map,
    densenet2d.py:239-241)."""
    ref_d2 = _load_ref("ref_densenet2d", "densenet2d.py")
    from deepards_tpu.models.densenet2d import densenet18_2d

    torch.manual_seed(8)
    tnet = ref_d2.densenet18()
    tnet.train()  # batch stats; drop_rate defaults 0 -> no dropout

    model = densenet18_2d()

    def conv2d_tree(w):
        # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
        return {"Conv_0": {"kernel": jnp.asarray(
            np.transpose(w.detach().numpy(), (2, 3, 1, 0))
        )}}

    f = tnet.features
    params = {
        "Conv_0": conv2d_tree(f.conv0.weight)["Conv_0"],
        "BatchStatNorm_0": _t2f_norm(f.norm0),
        "BatchStatNorm_1": _t2f_norm(f.norm5),
    }
    li = 0
    for bi, n_layers in enumerate((2, 2, 2, 2)):
        block = getattr(f, "denseblock{}".format(bi + 1))
        for k in range(n_layers):
            dl = getattr(block, "denselayer{}".format(k + 1))
            params["DenseLayer2D_{}".format(li)] = {
                "BatchStatNorm_0": _t2f_norm(dl.norm1),
                "Conv_0": conv2d_tree(dl.conv1.weight)["Conv_0"],
                "BatchStatNorm_1": _t2f_norm(dl.norm2),
                "Conv_1": conv2d_tree(dl.conv2.weight)["Conv_0"],
            }
            li += 1
        if bi != 3:
            tr = getattr(f, "transition{}".format(bi + 1))
            params["Transition2D_{}".format(bi)] = {
                "BatchStatNorm_0": _t2f_norm(tr.norm),
                "Conv_0": conv2d_tree(tr.conv.weight)["Conv_0"],
            }

    x = np.random.default_rng(8).normal(size=(2, 1, 64, 64)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_fmap = tnet(torch.from_numpy(x)).numpy()  # (N, C, H, W)
    fmap = model.apply(
        {"params": params}, jnp.asarray(x), True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        method=lambda m, xx, det: m.forward_no_pool(xx, det),
    )
    np.testing.assert_allclose(
        np.asarray(fmap).transpose(0, 3, 1, 2), ref_fmap,
        atol=1e-4, rtol=1e-4,
    )


def test_metadata_only_end_to_end_parity():
    """Linear-chain metadata classifier transplant
    (reference: torch_metadata_only_network.py:9-26)."""
    ref_mod = _load_ref("ref_metadata_only",
                        "torch_metadata_only_network.py")
    from deepards_tpu.models.heads import MetadataOnlyNetwork

    torch.manual_seed(0)
    ref = ref_mod.MetadataOnlyNetwork()
    meta = np.random.default_rng(0).normal(size=(4, 2, 9)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref(None, torch.from_numpy(meta)).numpy()

    model = MetadataOnlyNetwork()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((4, 1, 1, 224), np.float32), meta, True,
    )["params"]
    for i, lin in enumerate((ref.linear1, ref.linear2, ref.linear3)):
        key = "Dense_{}".format(i)
        params[key]["kernel"] = jnp.asarray(
            lin.weight.detach().numpy().T)
        params[key]["bias"] = jnp.asarray(lin.bias.detach().numpy())
    out = model.apply({"params": params},
                      np.zeros((4, 1, 1, 224), np.float32), meta, True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)


def test_compr_to_rf_lower_median_semantics():
    """torch.median takes the LOWER middle value on even counts
    (reference: torch_cnn_linear_network.py:45 with S=20 windows);
    jnp.median would average the two."""
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(5, 20, 7)).astype(np.float32)
    ref = torch.median(torch.from_numpy(feats), dim=1)[0].numpy()
    ours = np.sort(feats, axis=1)[:, (feats.shape[1] - 1) // 2]
    np.testing.assert_allclose(ours, ref, atol=0)
    # and differs from the averaging median on generic data
    assert not np.allclose(ours, np.median(feats, axis=1))


def test_protopnet_rf_math_matches_reference():
    """Receptive-field machinery vs the reference's ProtoPNet
    (reference: models/protopnet1d/model.py:11-110): layer rf info and
    per-prototype rf boundaries over the densenet18 conv_info chain."""
    import sys
    import types

    # model.py imports deepards.models.densenet at module level; only the
    # rf functions are under test, so a stub satisfies the import
    deepards_pkg = types.ModuleType("deepards")
    deepards_pkg.__path__ = []
    models_pkg = types.ModuleType("deepards.models")
    models_pkg.__path__ = []
    densenet_mod = types.ModuleType("deepards.models.densenet")
    densenet_mod.densenet18 = lambda *a, **k: None
    saved = {k: sys.modules.get(k) for k in
             ("deepards", "deepards.models", "deepards.models.densenet")}
    sys.modules.update({
        "deepards": deepards_pkg,
        "deepards.models": models_pkg,
        "deepards.models.densenet": densenet_mod,
    })
    try:
        ref = _load_ref("ref_ppnet_model",
                        "protopnet1d/model.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    from deepards_tpu.models.densenet1d import densenet18 as our_densenet
    from deepards_tpu.models.protopnet1d import (
        compute_proto_layer_rf_info,
        compute_rf_boundaries,
    )

    ks, ss, ps = our_densenet().conv_info()
    proto_kernel = 1
    ref_info = ref.compute_proto_layer_rf_info_v2(
        224, ks, ss, ps, proto_kernel)
    our_info = compute_proto_layer_rf_info(224, ks, ss, ps, proto_kernel)
    np.testing.assert_allclose(
        np.asarray(our_info, np.float64),
        np.asarray(ref_info, np.float64))

    for pos in range(7):
        ref_rf = ref.compute_rf_prototype(224, [0, 0, pos], ref_info)
        our_lo, our_hi = compute_rf_boundaries(pos, our_info, seq_len=224)
        assert ref_rf[1] == our_lo and ref_rf[2] == our_hi, pos


@pytest.fixture(scope="module")
def ref_gradcam():
    """The reference's own gradcam.py, loaded with a stub deepards.dataset
    (its module-level import; the cam classes never touch it)."""
    import sys
    import types

    pkg = types.ModuleType("deepards")
    ds_stub = types.ModuleType("deepards.dataset")
    pkg.dataset = ds_stub
    saved = {k: sys.modules.get(k) for k in ("deepards", "deepards.dataset")}
    sys.modules["deepards"] = pkg
    sys.modules["deepards.dataset"] = ds_stub
    try:
        path = "/root/reference/deepards/gradcam.py"
        if not os.path.exists(path):
            pytest.skip("reference checkout not available")
        spec = importlib.util.spec_from_file_location("ref_gradcam_mod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_gradcam_differential_vs_reference(ref_densenet, ref_cnn_linear,
                                           ref_gradcam, monkeypatch):
    """Cam parity: the split-forward + jax.grad cams equal the
    reference's own autograd-hook cams on transplanted weights, for all
    three normalization variants (reference: gradcam.py:28-205)."""
    from deepards_tpu.explain.gradcam import (
        FracTotalNormCam,
        MaxMinNormCam,
        UnNormalizedCam,
    )
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork

    # the reference one_hot path calls .cuda(); CPU-only environment
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **kw: self)

    torch.manual_seed(7)
    S = 4
    tback = ref_densenet.densenet18()
    tnet = ref_cnn_linear.CNNLinearNetwork(
        tback, sequence_size=S, metadata_features=0
    )
    tnet.eval()  # dropout off; BN unaffected (track_running_stats=False)

    model = CNNLinearNetwork(breath_block=densenet18())
    params = {
        "breath_block": transplant_densenet(tback, (2, 2, 2, 2)),
        "Dense_0": {
            "kernel": jnp.asarray(
                tnet.linear_final.weight.detach().numpy().T
            ),
            "bias": jnp.asarray(tnet.linear_final.bias.detach().numpy()),
        },
    }

    x = np.random.default_rng(9).normal(size=(S, 1, 224)).astype(np.float32)
    tx = torch.from_numpy(x)

    for target in (0, 1):
        # MaxMin: averaged cam + per-read cam rows (uint8, allow the
        # quantization boundary to differ by 1)
        ref_cam, ref_out = ref_gradcam.MaxMinNormCam(tnet).generate_cam(
            tx, target)
        cam, out = MaxMinNormCam(model, params).generate_cam(x, target)
        np.testing.assert_allclose(
            np.asarray(out), ref_out.detach().numpy(),
            atol=1e-3, rtol=1e-3,
        )
        assert cam.shape == ref_cam.shape == (7,)
        assert np.abs(cam.astype(int) - ref_cam.astype(int)).max() <= 1

        ref_rcam, _ = ref_gradcam.MaxMinNormCam(tnet).generate_read_cam(
            tx, target)
        rcam, _ = MaxMinNormCam(model, params).generate_read_cam(x, target)
        assert rcam.shape == ref_rcam.shape == (S, 7)
        assert np.abs(rcam.astype(int) - ref_rcam.astype(int)).max() <= 1

        # UnNormalized: raw float comparison
        ref_un, _ = ref_gradcam.UnNormalizedCam(tnet).generate_cam(
            tx, target)
        un, _ = UnNormalizedCam(model, params).generate_cam(x, target)
        np.testing.assert_allclose(un, ref_un, atol=1e-3, rtol=1e-2)

        # FracTotal read cams: the reference divides without a zero
        # guard (gradcam.py:189), so compare only where the denominator
        # is meaningfully nonzero
        ref_ft, _ = ref_gradcam.FracTotalNormCam(tnet).generate_read_cam(
            tx, target)
        ft, _ = FracTotalNormCam(model, params).generate_read_cam(
            x, target)
        un_t, _ = UnNormalizedCam(model, params).generate_read_cam(
            x, target)
        un_o, _ = UnNormalizedCam(model, params).generate_read_cam(
            x, (target + 1) % 2)
        denom = un_t + un_o
        mask = denom > 1e-5
        assert mask.any()
        assert np.abs(
            ft.astype(int)[mask] - ref_ft.astype(int)[mask]
        ).max() <= 1


@pytest.fixture(scope="module")
def ref_protopnet(ref_densenet):
    """protopnet1d/model.py imports deepards.models.densenet at module
    level; alias it to the already-loaded reference module."""
    import sys
    import types

    mods = {
        "deepards": types.ModuleType("deepards"),
        "deepards.models": types.ModuleType("deepards.models"),
        "deepards.models.densenet": ref_densenet,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        return _load_ref("ref_ppnet_model", "protopnet1d/model.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_protopnet_end_to_end_parity(ref_densenet, ref_protopnet):
    """Full PPNet (logits, min_distances) parity on transplanted weights
    — backbone, bottleneck add-on chain, prototype vectors, identity
    last layer (reference: protopnet1d/model.py:113-296)."""
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.protopnet1d import construct_ppnet

    torch.manual_seed(11)
    # S=20 is forced: the reference hardcodes the class-identity repeat
    # at 20 windows (model.py:144 .repeat((20, 1))) and crashes on any
    # other sub_batch_size in non-average mode
    S, B, P, C = 20, 1, 4, 128
    tback = ref_densenet.densenet18()
    tnet = ref_protopnet.construct_PPNet(
        tback, sub_batch_size=S, prototype_shape=(P, C, 1), num_classes=2,
    )
    tnet.eval()

    model = construct_ppnet(densenet18(), sub_batch_size=S,
                            n_prototypes=P // 2, proto_channels=C)
    # transplant: backbone + add-on conv chain + prototypes + last layer
    add_on = {}
    conv_i = 0
    for m in tnet.add_on_layers:
        if isinstance(m, torch.nn.Conv1d):
            add_on["Conv_{}".format(conv_i)] = {
                "kernel": _t2f_conv(m.weight),
                "bias": jnp.asarray(m.bias.detach().numpy()),
            }
            conv_i += 1
    assert conv_i >= 2
    params = {
        "breath_block": transplant_densenet(tback, (2, 2, 2, 2)),
        "add_on_layers": add_on,
        "prototype_vectors": jnp.asarray(
            tnet.prototype_vectors.detach().numpy()
        ),
        "last_layer": {
            "kernel": jnp.asarray(
                tnet.last_layer.weight.detach().numpy().T
            ),
        },
    }

    x = np.random.default_rng(11).normal(
        size=(B, S, 1, 224)
    ).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_min_d = tnet(torch.from_numpy(x), None)
    logits, min_d = model.apply(
        {"params": params}, jnp.asarray(x), None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(min_d), ref_min_d.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=1e-3, rtol=1e-3
    )

    # push surface too: latent patches + full distance maps
    with torch.no_grad():
        ref_feats, ref_dists = tnet.push_forward(torch.from_numpy(x))
    feats, dists = model.apply(
        {"params": params}, jnp.asarray(x), None, True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        method=model.push_forward,
    )
    # ours: feats (B,S,L',C), dists (B,S,L'',P); reference:
    # (B,S,C,L'), (B,S,P,L'')
    np.testing.assert_allclose(
        np.asarray(feats).transpose(0, 1, 3, 2), ref_feats.numpy(),
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dists).transpose(0, 1, 3, 2), ref_dists.numpy(),
        atol=1e-3, rtol=1e-3,
    )
