"""Device mesh, sharding specs, and host-gather helpers.

The distributed-communication layer of the framework (SURVEY.md §2.11):
single-slice data parallelism via GSPMD — batches are sharded over the
``data`` mesh axis, parameters are replicated (optionally sharded over
``model`` for the wide final Linear), and XLA inserts the gradient
all-reduce over ICI.  This replaces the reference's ``nn.DataParallel``
single-process replication (reference: deepards/train_ards_detector.py:96).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, cpu_collectives="gloo"):
    """Initialize the multi-host JAX runtime (call once, before any
    device op, on every host of a pod slice).  No-op when single-process
    or when already initialized.  Collectives then ride ICI within the
    slice and DCN across slices, with no further code changes — GSPMD
    sees the global mesh.

    On the CPU backend, cross-process collectives need an explicit
    implementation (``jax_cpu_collectives_implementation``): with gloo
    set, true multi-process groups form and GSPMD all-reduces span
    processes (pinned by tests/test_multiprocess.py — two real
    processes, one global mesh, gradients identical to single-process).
    """
    import jax

    try:
        if cpu_collectives:
            try:
                jax.config.update(
                    "jax_cpu_collectives_implementation", cpu_collectives
                )
            except Exception:
                pass  # backend already initialized or unknown impl
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # already initialized or single-process environment
        pass


def make_mesh(dp_devices=-1, model_devices=1, devices=None):
    """Build a (data, model) mesh.  dp_devices=-1 uses all local devices
    divided by model_devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp_devices == -1:
        dp_devices = n // model_devices
    use = dp_devices * model_devices
    grid = np.asarray(devices[:use]).reshape(dp_devices, model_devices)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh):
    """Shard leading (batch) axis over data; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding.  Pads the
    batch up to a multiple of the dp size if needed (returns the pad mask
    so loss/metrics can ignore padded rows)."""
    dp = mesh.shape[DATA_AXIS]
    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    pad = (-b) % dp
    if pad:
        batch = jax.tree_util.tree_map(
            lambda x: np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            ),
            batch,
        )
    mask = np.ones(b + pad, dtype=np.float32)
    if pad:
        mask[b:] = 0.0
    sharding = batch_sharding(mesh)
    out = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
    mask = jax.device_put(mask, sharding)
    return out, mask


def replicate_tree(mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fetch_global(x):
    """Device array -> full host numpy array, multi-process safe.

    The cross-host eval gather (SURVEY §2.11): patient-level vote
    aggregation needs every process to see ALL window predictions.  In a
    single process this is a plain fetch; across processes the sharded
    output is allgathered first (np.asarray on a multi-process-sharded
    array raises).  The reference did this implicitly with
    .cpu().tolist() (train_ards_detector.py:462-463)."""
    import numpy as np

    if jax.process_count() > 1:
        arr = getattr(x, "sharding", None)
        if arr is not None and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
    return np.asarray(x)


def fetch_global_list(xs):
    """fetch_global over a list in ONE host transfer when possible.

    Single-process (the common case): one batched jax.device_get for
    the whole list instead of a device round trip per element.  Across
    processes each non-addressable element still needs its own
    allgather, so fall back to per-element fetch_global there."""
    import numpy as np

    xs = list(xs)
    if jax.process_count() > 1 and any(
        getattr(x, "sharding", None) is not None
        and not x.is_fully_addressable
        for x in xs
    ):
        return [fetch_global(x) for x in xs]
    return [np.asarray(x) for x in jax.device_get(xs)]


# shard the classifier-head Dense (and its optimizer trace, which mirrors
# the param tree) over the model axis: kernel (F, out) column-sharded,
# bias (out,) sharded.  Matched by substring against the pytree key path.
HEAD_DENSE_MODEL_RULES = (
    ("Dense_0']['kernel", P(None, MODEL_AXIS)),
    ("Dense_0']['bias", P(MODEL_AXIS)),
)


def shard_state(mesh, tree, rules=()):
    """Place a train-state pytree on the mesh: every leaf replicated unless
    a (path-substring, PartitionSpec) rule matches — used to shard wide
    head layers over the ``model`` axis (tensor parallelism) while the
    backbone stays replicated (data parallelism)."""
    from jax.tree_util import keystr, tree_map_with_path

    def put(path, x):
        spec = P()
        name = keystr(path)
        ndim = getattr(x, "ndim", 0)
        for pat, rule_spec in rules:
            axis_sizes = [
                mesh.shape[a] for a in rule_spec if a is not None
            ]
            if (
                pat in name
                and ndim >= len(rule_spec)
                and all(s > 1 for s in axis_sizes)
            ):
                # only apply when the sharded dims divide evenly
                dims = x.shape[: len(rule_spec)]
                ok = all(
                    a is None or dims[i] % mesh.shape[a] == 0
                    for i, a in enumerate(rule_spec)
                )
                if ok:
                    spec = rule_spec
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return tree_map_with_path(put, tree)
