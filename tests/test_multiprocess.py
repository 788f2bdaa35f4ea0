"""TRUE multi-process distributed training (SURVEY §2.11).

Round-2 believed multi-process groups could not form in this JAX build;
they do once the CPU backend is given an explicit collectives
implementation (gloo), which `parallel.mesh.initialize_distributed` now
configures.  This test launches TWO real OS processes, forms one global
2-device data mesh across them, runs sharded train steps whose gradient
all-reduce crosses the process boundary, and asserts both processes end
with identical parameters that match a single-process run bit-for-bit
(up to float tolerance).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # single local device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from deepards_tpu.parallel.mesh import initialize_distributed
initialize_distributed("127.0.0.1:" + port, 2, pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import flax.linen as nn
import optax

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2  # one local CPU device per process
mesh = Mesh(np.array(jax.devices()), ("data",))


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(4, (5,))(x))
        return nn.Dense(2)(h.reshape(x.shape[0], -1))


model = Tiny()
rng = np.random.default_rng(0)
X = rng.normal(size=(8, 32, 1)).astype(np.float32)   # GLOBAL batch
Y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 8)]
params = model.init(jax.random.PRNGKey(0), jnp.asarray(X[:1]))
tx = optax.sgd(0.1)
opt = tx.init(params)
sh = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())
lo = pid * 4
gx = jax.make_array_from_process_local_data(
    sh, jnp.asarray(X[lo:lo + 4]), X.shape)
gy = jax.make_array_from_process_local_data(
    sh, jnp.asarray(Y[lo:lo + 4]), Y.shape)
params = jax.device_put(params, rep)
opt = jax.device_put(opt, rep)


@jax.jit
def step(params, opt, x, y):
    def loss_fn(p):
        return optax.softmax_cross_entropy(model.apply(p, x), y).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt)
    return optax.apply_updates(params, updates), opt, loss


for _ in range(3):
    params, opt, loss = step(params, opt, gx, gy)
flat = np.concatenate([
    np.asarray(jax.device_get(l)).ravel()
    for l in jax.tree_util.tree_leaves(params)
])
print("RESULT", pid, repr(float(np.abs(flat).sum())), repr(float(loss)))
'''


def _single_process_reference():
    """The same 3 steps on the full batch, no distribution."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.relu(nn.Conv(4, (5,))(x))
            return nn.Dense(2)(h.reshape(x.shape[0], -1))

    model = Tiny()
    rng = np.random.default_rng(0)
    X = rng.normal(size=(8, 32, 1)).astype(np.float32)
    Y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 8)]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(X[:1]))
    tx = optax.sgd(0.1)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            return optax.softmax_cross_entropy(
                model.apply(p, x), y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    gx, gy = jnp.asarray(X), jnp.asarray(Y)
    for _ in range(3):
        params, opt, loss = step(params, opt, gx, gy)
    flat = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(params)
    ])
    return float(np.abs(flat).sum()), float(loss)


@pytest.mark.slow
def test_two_process_data_parallel_matches_single(tmp_path):
    child_py = tmp_path / "child.py"
    child_py.write_text(CHILD.format(repo=REPO))
    port = str(21000 + (os.getpid() % 4000))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child_py), str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, chk, loss = line.split()
                results[int(pid)] = (float(eval(chk)), float(eval(loss)))
    assert set(results) == {0, 1}
    # both processes hold identical replicated params
    assert results[0] == results[1]
    # and the cross-process all-reduce reproduces the single-process run
    ref_chk, ref_loss = _single_process_reference()
    np.testing.assert_allclose(results[0][0], ref_chk, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], ref_loss, rtol=1e-5)


TRAINER_CHILD = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
data_path = sys.argv[3]; cohort_file = sys.argv[4]; results = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from deepards_tpu.parallel.mesh import initialize_distributed
initialize_distributed("127.0.0.1:" + port, 2, pid)
assert jax.process_count() == 2
from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import make_trainer

conf = Configuration(overrides=dict(
    data_path=data_path,
    cohort_file=cohort_file,
    experiment_num=1,
    network="cnn_linear",
    base_network="densenet18",
    dataset_type="unpadded_centered_sequences",
    n_sub_batches=2,
    kfolds=2,
    only_fold=0,
    epochs=2,
    batch_size=8,
    compute_dtype="float32",
    results_dir=results,
    seed=3,
))
trainer = make_trainer(conf, verbose=False)
resobj = trainer.train_and_test()
aucs = [round(float(v), 6) for v in resobj.get_meter("test_auc", 0).values]
losses = [round(float(v), 5) for v in resobj.get_meter("loss", 0).values]
print("TRAINER_RESULT", pid, repr((aucs, losses[:4])))
'''


@pytest.mark.slow
def test_two_process_full_trainer_fold(synthetic_cohort, tmp_path):
    """The REAL trainer across two OS processes on one global data mesh:
    device-cache epoch scans with cross-process gradient all-reduce,
    eval with the cross-host allgather (`mesh.fetch_global`), and
    patient-vote aggregation — both processes must report identical fold
    AUCs/losses, matching a single-process run of the same seed."""
    child_py = tmp_path / "trainer_child.py"
    child_py.write_text(TRAINER_CHILD.format(repo=REPO))
    port = str(25000 + (os.getpid() % 4000))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child_py), str(pid), port,
             synthetic_cohort["data_path"],
             synthetic_cohort["cohort_file"],
             str(tmp_path / "res{}".format(pid))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        for line in out.splitlines():
            if line.startswith("TRAINER_RESULT"):
                parts = line.split(" ", 2)
                results[int(parts[1])] = eval(parts[2])
    assert set(results) == {0, 1}
    # both processes saw identical global results
    assert results[0] == results[1]
    aucs_mp, losses_mp = results[0]
    assert len(aucs_mp) == 2 and all(np.isfinite(aucs_mp))

    # single-process run of the same seed/config must agree
    from deepards_tpu.config import Configuration
    from deepards_tpu.train.loop import make_trainer

    conf = Configuration(overrides=dict(
        data_path=synthetic_cohort["data_path"],
        cohort_file=synthetic_cohort["cohort_file"],
        experiment_num=1,
        network="cnn_linear",
        base_network="densenet18",
        dataset_type="unpadded_centered_sequences",
        n_sub_batches=2,
        kfolds=2,
        only_fold=0,
        epochs=2,
        batch_size=8,
        compute_dtype="float32",
        results_dir=str(tmp_path / "res_single"),
        seed=3,
    ))
    trainer = make_trainer(conf, verbose=False)
    resobj = trainer.train_and_test()
    aucs_one = [
        round(float(v), 6) for v in resobj.get_meter("test_auc", 0).values
    ]
    losses_one = [
        round(float(v), 5) for v in resobj.get_meter("loss", 0).values
    ]
    np.testing.assert_allclose(aucs_mp, aucs_one, atol=1e-6)
    np.testing.assert_allclose(losses_mp, losses_one[:4], atol=1e-3)
