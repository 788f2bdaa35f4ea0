"""Breath-science primitives: inspiration→expiration crossover (x0)
detection and per-breath flow-time features.

This is a from-scratch numpy implementation of the subset of the reference's
``ventmap``/``ucdpvanalysis`` dependency actually consumed by the pipeline
(reference: deepards/dataset.py:494-504 lists the 9 flow-time features;
truncate_lim at deepards/dataset.py:1183-1204 uses the x0 heuristic).  The
algorithms follow the published SAM heuristics in intent (largest positive
area-under-curve portion + first sustained positive→negative crossing) but
are vectorized and simplified; numerical parity with the legacy code is
validated statistically, not bitwise.
"""
import numpy as np

_trapezoid = getattr(np, "trapezoid", np.trapz)

DT = 0.02  # ventilator sampling period, 50 Hz
FS = 50.0

# The 9 flow-time features used as metadata / regression targets
# (order matters; reference: deepards/dataset.py:494-504).
FLOW_TIME_FEATURE_NAMES = [
    "mean_flow_from_pef",
    "inst_RR",
    "slope_minF_to_zero",
    "pef_+0.16_to_zero",
    "iTime",
    "eTime",
    "I:E ratio",
    "dyn_compliance",
    "tve:tvi ratio",
]


def _first_neg_crossing(flow):
    """First index where flow goes from >=0 to a sustained negative value.

    Follows the intent of the SAM ``findx0`` heuristic: a crossing counts
    when the next sample is clearly negative (<= -5 l/min) or goes negative
    and stays/deepens negative shortly after.
    """
    flow = np.asarray(flow, dtype=np.float64)
    n = len(flow)
    if n < 3:
        return n - 1 if n else 0
    f0 = flow[:-2]
    f1 = flow[1:-1]
    f2 = flow[2:]
    # pad a lookahead of 3 further samples for the "dribble" clause
    f4 = np.concatenate([flow[4:], np.full(min(3, n - 1), np.nan)])[: n - 2]
    cond = (f0 >= 0) & (
        ((f1 <= -5) & (f2 < 0))
        | ((f1 < 0) & (f2 <= -5))
        | ((f1 < 0) & (f4 <= -5))
    )
    idx = np.nonzero(cond)[0]
    if len(idx):
        return int(idx[0]) + 1
    return n - 1


def _largest_pos_auc_end(flow):
    """Index one past the positive portion with the largest AUC (SAM x02)."""
    flow = np.asarray(flow, dtype=np.float64)
    n = len(flow)
    if n < 2:
        return n - 1 if n else 0
    pos = flow[:-1] > 0
    if not pos.any():
        return n - 1
    # segment boundaries of contiguous positive runs
    padded = np.concatenate([[False], pos, [False]])
    starts = np.nonzero(padded[1:] & ~padded[:-1])[0]
    ends = np.nonzero(~padded[1:] & padded[:-1])[0]  # exclusive
    aucs = np.array([_trapezoid(flow[s:e], dx=DT) for s, e in zip(starts, ends)])
    best = int(np.argmax(aucs))
    return int(ends[best])


def find_x0_index(flow):
    """Locate the inspiration→expiration crossover sample of a breath.

    Combines the two SAM detectors with the heuristic "use the later one"
    rule (important for nubbin breaths).  Returns an index into ``flow``.
    """
    x01 = _first_neg_crossing(flow)
    x02 = _largest_pos_auc_end(flow)
    return max(x01, x02)


def _slope_minf_to_zero(flow, dt=DT, t_offset=0.0):
    """Slope (l/min/s) from (min flow + offset) back up toward zero flow.

    NaN when undefined (no expiratory data / nonpositive slope), matching
    the legacy convention.
    """
    flow = np.asarray(flow, dtype=np.float64)
    if len(flow) == 0:
        return np.nan
    min_idx = int(np.argmin(flow)) + int(round(t_offset / dt))
    if min_idx >= len(flow):
        return np.nan
    seg = flow[min_idx:]
    neg = seg[seg < 0]
    if len(neg) == 0:
        return np.nan
    # closest-to-zero negative point after min flow
    rel_zero_idx = int(np.argmax(np.where(seg < 0, seg, -np.inf)))
    if rel_zero_idx == 0:
        return np.nan
    slope = (seg[rel_zero_idx] - seg[0]) / (rel_zero_idx * dt)
    return slope if slope >= 0 else np.nan


def _mean_flow_from_pef(flow, dt=DT, t_offset=0.16):
    flow = np.asarray(flow, dtype=np.float64)
    if len(flow) == 0:
        return np.nan
    idx = int(np.argmin(flow)) + int(round(t_offset / dt))
    seg = flow[idx:]
    if len(seg) == 0:
        return np.nan
    return float(seg.mean())


def flow_time_features(flow, pressure=None, dt=DT):
    """Compute the 9 flow-time features for a single breath.

    ``flow`` in l/min.  ``pressure`` (cm H2O) is used for dynamic
    compliance; when absent dyn_compliance is NaN.  Returns a (9,) float64
    array ordered as FLOW_TIME_FEATURE_NAMES.
    """
    flow = np.asarray(flow, dtype=np.float64)
    n = len(flow)
    if n == 0:
        return np.full(9, np.nan)
    x0 = find_x0_index(flow)
    x0 = min(max(x0, 1), n)
    i_time = x0 * dt
    e_time = max((n - x0) * dt, dt)
    ie_ratio = i_time / e_time
    inst_rr = 60.0 / (i_time + e_time)
    # tidal volumes in ml: flow l/min -> integral * 1000 / 60
    tvi = _trapezoid(np.clip(flow[:x0], 0, None), dx=dt) * 1000.0 / 60.0
    tve = -_trapezoid(np.clip(flow[x0:], None, 0), dx=dt) * 1000.0 / 60.0
    tve_tvi = tve / tvi if tvi > 0 else np.nan

    if pressure is not None and len(pressure):
        pressure = np.asarray(pressure, dtype=np.float64)
        pip = float(pressure.max())
        peep = float(pressure[-min(5, len(pressure)):].mean())
        denom = pip - peep
        dyn_c = (tvi / 1000.0) / denom if denom > 0 else np.nan
    else:
        dyn_c = np.nan

    return np.array([
        _mean_flow_from_pef(flow, dt),
        inst_rr,
        _slope_minf_to_zero(flow, dt),
        _slope_minf_to_zero(flow, dt, t_offset=0.16),
        i_time,
        e_time,
        ie_ratio,
        dyn_c,
        tve_tvi,
    ])
