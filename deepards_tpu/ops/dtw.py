"""Dynamic time warping on TPU: batched anti-diagonal wavefront kernel.

Replaces the reference's C-backed ``dtwco.warping.core.dtw`` calls
(reference: deepards/dtw_lib.py:6,330-338 — the single biggest non-NN
compute, hours-scale on CPU per dtw_lib.py:258-274) with a device-batched
DP.  The O(n^2) table is computed one anti-diagonal at a time: each of the
2n-1 sequential steps updates up to n cells in parallel across VPU lanes,
and thousands of pairs batch across sublanes.

Two implementations with identical numerics:
- ``dtw_scan``: pure jax.lax.scan (runs anywhere; reference numerics)
- ``dtw_pallas``: Pallas TPU kernel with the diagonals held in VMEM

Both support per-pair lengths (sequences are padded to a fixed n) and
return the classic unconstrained Euclidean DTW distance, matching dtwco's
default (validated against a numpy DP in tests).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 8.5e37  # large-but-finite f32 sentinel (avoids inf-inf NaNs)


def dtw_numpy(a, b):
    """Plain O(n*m) numpy DP — the correctness oracle."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = abs(a[i - 1] - b[j - 1])
            D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return D[n, m]


def _diag_step(carry, d, a, b_rev, la, lb, n):
    """One anti-diagonal update shared by scan path.

    carry: (prev (B,n), prev2 (B,n), result (B,))
    diagonal d covers cells (i, d-i); cell value stored at lane i.
    """
    prev, prev2, result = carry
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    j_idx = d - i_idx
    valid = (i_idx <= jnp.minimum(d, n - 1)) & (j_idx >= 0)
    in_len = (i_idx < la[:, None]) & (j_idx < lb[:, None])

    # b[d-i] at lane i == roll(reversed b, d+1) (see module docstring)
    b_diag = jnp.roll(b_rev, d + 1, axis=1)
    cost = jnp.abs(a - b_diag)

    up = prev  # (i, j-1)
    left = jnp.roll(prev, 1, axis=1)  # (i-1, j)
    diag = jnp.roll(prev2, 1, axis=1)  # (i-1, j-1)
    first_lane = i_idx == 0
    left = jnp.where(first_lane, BIG, left)
    diag = jnp.where(first_lane, BIG, diag)
    # origin cell (0,0) has no predecessors: min term is 0
    is_origin = (i_idx == 0) & (j_idx == 0)
    best = jnp.minimum(jnp.minimum(up, left), diag)
    best = jnp.where(is_origin, 0.0, best)
    cur = cost + best
    cur = jnp.where(valid & in_len, cur, BIG)

    # capture D[la-1, lb-1] when this diagonal passes through it
    is_final = (i_idx == la[:, None] - 1) & (j_idx == lb[:, None] - 1)
    result = jnp.where(is_final.any(axis=1),
                       jnp.where(is_final, cur, 0.0).sum(axis=1), result)
    return (cur, prev, result), None


@functools.partial(jax.jit, static_argnames=("n",))
def _dtw_scan_impl(a, b, la, lb, n):
    bsz = a.shape[0]
    b_rev = b[:, ::-1]
    prev = jnp.full((bsz, n), BIG)
    prev2 = jnp.full((bsz, n), BIG)
    result = jnp.zeros((bsz,))

    def step(carry, d):
        return _diag_step(carry, d, a, b_rev, la, lb, n)

    (prev, prev2, result), _ = jax.lax.scan(
        step, (prev, prev2, result), jnp.arange(2 * n - 1)
    )
    return result


def dtw_scan(a, b, la=None, lb=None):
    """Batched DTW distances.

    a, b: (B, n) float arrays (zero-padded); la, lb: (B,) true lengths
    (default: full length).  Returns (B,) float32 distances.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 1:
        a = a[None]
        b = b[None]
    n = a.shape[1]
    if la is None:
        la = jnp.full((a.shape[0],), n, jnp.int32)
    if lb is None:
        lb = jnp.full((b.shape[0],), n, jnp.int32)
    return _dtw_scan_impl(a, b, jnp.asarray(la, jnp.int32),
                          jnp.asarray(lb, jnp.int32), n)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _dtw_kernel(a_ref, brev_ref, la_ref, lb_ref, out_ref, prev_ref,
                prev2_ref, bdiag_ref):
    """One grid step handles a (Bt, n) tile of pairs; the 2n-1 diagonal
    recursion runs in a fori_loop with the two previous diagonals kept in
    VMEM scratch.  The diagonal's b values come from a reversed-b buffer
    rolled by a STATIC shift of 1 per step (Mosaic cannot lower rolls with
    traced shifts).  Per-pair scalars (lengths, result) are (Bt, 1) —
    Mosaic requires >=2D layouts."""
    import jax.numpy as jnp

    bt, n = a_ref.shape
    a = a_ref[:]
    la = la_ref[:]  # (bt, 1)
    lb = lb_ref[:]
    prev_ref[:] = jnp.full((bt, n), BIG)
    prev2_ref[:] = jnp.full((bt, n), BIG)
    # at diagonal d, lane i needs b[d-i] == roll(rev_b, d+1)[i]
    bdiag_ref[:] = jnp.roll(brev_ref[:], 1, axis=1)
    out_ref[:] = jnp.zeros((bt, 1), jnp.float32)

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(d, result):
        prev = prev_ref[:]
        prev2 = prev2_ref[:]
        j_idx = d - i_idx
        valid = (i_idx <= jnp.minimum(d, n - 1)) & (j_idx >= 0)
        in_len = (i_idx < la) & (j_idx < lb)
        b_diag = bdiag_ref[:]
        cost = jnp.abs(a - b_diag)
        up = prev
        left = jnp.roll(prev, 1, axis=1)
        diag = jnp.roll(prev2, 1, axis=1)
        first_lane = i_idx == 0
        left = jnp.where(first_lane, BIG, left)
        diag = jnp.where(first_lane, BIG, diag)
        is_origin = (i_idx == 0) & (j_idx == 0)
        best = jnp.minimum(jnp.minimum(up, left), diag)
        best = jnp.where(is_origin, 0.0, best)
        cur = cost + best
        cur = jnp.where(valid & in_len, cur, BIG)
        is_final = (i_idx == la - 1) & (j_idx == lb - 1)
        result = jnp.where(
            is_final.any(axis=1, keepdims=True),
            jnp.where(is_final, cur, 0.0).sum(axis=1, keepdims=True),
            result,
        )
        prev2_ref[:] = prev
        prev_ref[:] = cur
        bdiag_ref[:] = jnp.roll(b_diag, 1, axis=1)
        return result

    out_ref[:] = jax.lax.fori_loop(0, 2 * n - 1, body, out_ref[:])


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _dtw_pallas_impl(a, b_rev, la, lb, block_b=128, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n = a.shape
    grid = (bsz // block_b,)
    out = pl.pallas_call(
        _dtw_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, n), jnp.float32),
            pltpu.VMEM((block_b, n), jnp.float32),
            pltpu.VMEM((block_b, n), jnp.float32),
        ],
        interpret=interpret,
    )(a, b_rev, la[:, None], lb[:, None])
    return out[:, 0]


def dtw_pallas(a, b, la=None, lb=None, block_b=128, interpret=None):
    """Pallas-backed batched DTW (pads the batch to a block multiple)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 1:
        a = a[None]
        b = b[None]
    bsz, n = a.shape
    if la is None:
        la = jnp.full((bsz,), n, jnp.int32)
    if lb is None:
        lb = jnp.full((bsz,), n, jnp.int32)
    la = jnp.asarray(la, jnp.int32)
    lb = jnp.asarray(lb, jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_b = min(block_b, max(8, bsz))
    pad = (-bsz) % block_b
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
        la = jnp.pad(la, (0, pad), constant_values=1)
        lb = jnp.pad(lb, (0, pad), constant_values=1)
    out = _dtw_pallas_impl(a, b[:, ::-1], la, lb, block_b=block_b,
                           interpret=interpret)
    return out[:bsz]


def dtw_batch(a, b, la=None, lb=None):
    """Dispatch: Pallas on TPU, scan elsewhere."""
    if jax.default_backend() == "tpu":
        return dtw_pallas(a, b, la, lb)
    return dtw_scan(a, b, la, lb)


def dtw_full(a, b):
    """Single-pair DTW with the full accumulated-cost matrix and the
    optimal warping path (dtwco's ``dtw(x, y, dist_only=False)``,
    consumed by the reference's cam-alignment analysis,
    scripts/exploratory/dtw_grad_cam.py:17,66).

    Returns (distance, cost_matrix (n, m), (path_x, path_y)) with the
    path ordered from (0, 0) to (n-1, m-1).  Host numpy: path extraction
    is a sequential backtrack over a single pair (cold analysis path);
    the batched device kernels above remain the hot path for distances.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    cost = np.abs(a[:, None] - b[None, :])
    for i in range(1, n + 1):
        D[i, 1:] = cost[i - 1]
        prev = D[i - 1]
        run = D[i]
        for j in range(1, m + 1):
            run[j] += min(prev[j], prev[j - 1], run[j - 1])
    acc = D[1:, 1:]
    # backtrack the optimal alignment
    i, j = n - 1, m - 1
    px, py = [i], [j]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            step = np.argmin(
                (D[i, j], D[i, j + 1], D[i + 1, j])
            )
            if step == 0:
                i -= 1
                j -= 1
            elif step == 1:
                i -= 1
            else:
                j -= 1
        px.append(i)
        py.append(j)
    return (
        float(acc[n - 1, m - 1]),
        acc,
        (np.asarray(px[::-1]), np.asarray(py[::-1])),
    )
