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
if pid < 0:
    # single-process ORACLE on the SAME 2-device mesh geometry: the
    # partitioned program (reduction-tree shapes inside BN sums, shard
    # layouts) must be identical to the 2-process run, or the comparison
    # measures mesh-geometry float noise instead of the cross-process
    # semantics under test
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
else:
    os.environ.pop("XLA_FLAGS", None)  # one local device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
if pid >= 0:
    from deepards_tpu.parallel.mesh import initialize_distributed
    initialize_distributed("127.0.0.1:" + port, 2, pid)
    assert jax.process_count() == 2
assert len(jax.devices()) == 2
from deepards_tpu.config import Configuration
from deepards_tpu.train.loop import make_trainer

overrides = dict(
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
    # damped lr: the gloo all-reduce and the single-process reduction
    # legitimately differ by ~1 ULP per step (measured: eval-only test
    # losses agree to 6e-8); at the default lr the SGD/clip/batch-stat
    # feedback on this tiny cohort amplifies that chaotically.  At 1e-4
    # the TRAIN-LOSS trajectory stays comparable (atol 1e-3 below);
    # trained AUC equality is NOT assertable across collective
    # implementations (near-init argmax votes sit on ULP knife edges),
    # so the compounding-free EVAL leg below carries the exactness
    # claim instead.
    learning_rate=1e-4,
    compute_dtype="float32",
    results_dir=results,
    seed=3,
)

# compounding-free EVAL leg: identical init params in every layout, no
# update feedback — sharded-program semantics (mask, BN statistics,
# padding, on-device gather, cross-host allgather) must reproduce the
# single-process run to float-reduction noise
ev = dict(overrides, epochs=1, no_train=True,
          results_dir=results + "_ev")
resobj = make_trainer(Configuration(overrides=ev),
                      verbose=False).train_and_test()
ev_aucs = [round(float(v), 6)
           for v in resobj.get_meter("test_auc", 0).values]
ev_losses = [round(float(v), 6)
             for v in resobj.get_meter("test_loss", 0).values]
print("EVAL_RESULT", pid, repr((ev_aucs, ev_losses)))

resobj = make_trainer(Configuration(overrides=overrides),
                      verbose=False).train_and_test()
aucs = [round(float(v), 6) for v in resobj.get_meter("test_auc", 0).values]
losses = [round(float(v), 5) for v in resobj.get_meter("loss", 0).values]
print("TRAINER_RESULT", pid, repr((aucs, losses[:4])))
'''


@pytest.mark.slow
def test_two_process_full_trainer_fold(synthetic_cohort, tmp_path):
    """The REAL trainer across two OS processes on one global data mesh:
    device-cache epoch scans with cross-process gradient all-reduce,
    eval with the cross-host allgather (`mesh.fetch_global`), and
    patient-vote aggregation.  Claims, strongest assertable first:

    1. both processes report identical global results (the allgather /
       global-view machinery);
    2. a compounding-free EVAL-ONLY fold (fixed init params) matches a
       single-process run of the SAME 2-device mesh geometry to float
       tolerance, AUC exactly — sharded semantics, no SGD feedback;
    3. the damped-lr trained loss trajectory stays within 1e-3 of the
       single-process run.  Trained AUC equality is deliberately NOT
       asserted: the gloo and local all-reduces differ by ~1 ULP per
       step (measured 6e-8 on eval losses), SGD amplifies that
       chaotically on this tiny cohort, and near-init argmax votes sit
       on knife edges — cross-implementation trajectory equality would
       test luck, not semantics."""
    child_py = tmp_path / "trainer_child.py"
    child_py.write_text(TRAINER_CHILD.format(repo=REPO))
    port = str(25000 + (os.getpid() % 4000))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    def parse(out):
        got = {}
        for line in out.splitlines():
            if line.startswith(("TRAINER_RESULT", "EVAL_RESULT")):
                key, pid, rest = line.split(" ", 2)
                got[key] = eval(rest)
        return got

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
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        results[pid] = parse(out)
        assert {"TRAINER_RESULT", "EVAL_RESULT"} <= set(results[pid])
    # claim 1: both processes saw identical global results
    assert results[0] == results[1]
    aucs_mp, losses_mp = results[0]["TRAINER_RESULT"]
    assert len(aucs_mp) == 2 and all(np.isfinite(aucs_mp))

    # single-process oracle on the SAME 2-device mesh geometry (pid=-1
    # in the child script), so the partitioned program matches and the
    # only difference is the gloo all-reduce vs the local reduction
    single = subprocess.run(
        [sys.executable, str(child_py), "-1", port,
         synthetic_cohort["data_path"],
         synthetic_cohort["cohort_file"],
         str(tmp_path / "res_single")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert single.returncode == 0, single.stderr[-3000:]
    oracle = parse(single.stdout)
    assert {"TRAINER_RESULT", "EVAL_RESULT"} <= set(oracle)

    # claim 2: compounding-free eval-only equality (tight)
    ev_aucs_mp, ev_losses_mp = results[0]["EVAL_RESULT"]
    ev_aucs_one, ev_losses_one = oracle["EVAL_RESULT"]
    assert ev_aucs_mp == ev_aucs_one
    np.testing.assert_allclose(ev_losses_mp, ev_losses_one,
                               rtol=1e-5, atol=1e-6)

    # claim 3: damped-lr trained loss trajectory stays comparable
    _, losses_one = oracle["TRAINER_RESULT"]
    np.testing.assert_allclose(losses_mp, losses_one[:4], atol=1e-3)
