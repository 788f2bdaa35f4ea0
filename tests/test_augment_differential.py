"""Differential tests for the 1D window-warping augmentations against
the reference's OWN augmentation.py (loaded from /root/reference at test
time, read-only).

The reference draws from the global legacy np.random stream and finds
x0 via ventmap.SAM; here ventmap is shimmed with the vendored
ucdpvanalysis SAM (the oracle our x0 detector is pinned against) and
our rng-keyed transforms are driven by a proxy that replays the SAME
legacy stream — so with equal seeds the warp outputs must match
EXACTLY (reference: deepards/augmentation.py:8-165).
"""
import importlib.util
import os
import sys
import tarfile
import types

import numpy as np
import pytest

# full-sweep module: heavyweight e2e/differential tests, excluded from
# the default quick gate (run with `pytest -m ''`)
pytestmark = pytest.mark.slow

REF_AUG = "/root/reference/deepards/augmentation.py"
TARBALL = "/root/reference/build/static/ucdpvanalysis-1.5.tar.gz"


class LegacyRng:
    """Replays the global legacy np.random stream through the
    Generator-style surface our transforms consume."""

    def random(self):
        return np.random.rand()

    def uniform(self, lo, hi):
        return np.random.uniform(lo, hi)

    def integers(self, lo, hi):
        return np.random.randint(lo, hi)

    def choice(self, arr, size=None):
        return np.random.choice(arr, size=size)


@pytest.fixture(scope="module")
def ref_augmentation(tmp_path_factory):
    if not (os.path.exists(REF_AUG) and os.path.exists(TARBALL)):
        pytest.skip("reference checkout not available")
    root = tmp_path_factory.mktemp("ucdpv_aug")
    with tarfile.open(TARBALL) as tf:
        tf.extractall(root)
    pkg_root = os.path.join(str(root), "ucdpvanalysis-1.5")
    import scipy.integrate

    if not hasattr(scipy.integrate, "simps"):
        scipy.integrate.simps = scipy.integrate.simpson
    sys.path.insert(0, pkg_root)
    try:
        spec = importlib.util.spec_from_file_location(
            "vendored_sam_aug",
            os.path.join(pkg_root, "algorithms", "SAM.py"))
        sam = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sam)
    finally:
        sys.path.remove(pkg_root)

    # ventmap shim: adapt the vendored SAM to the newer ventmap
    # signatures the reference augmentation calls
    # (find_x0s_multi_algorithms(flow, rel_t, dt=dt);
    #  x0_heuristic(x0s, rel_t) -> (i_time, x0_index))
    ventmap = types.ModuleType("ventmap")
    ventmap_sam = types.ModuleType("ventmap.SAM")

    def find_x0s_multi_algorithms(flow, rel_t, dt=0.02):
        return sam.find_x0s_multi_algorithms(
            list(flow), list(rel_t), rel_t[-1], dt)

    def x0_heuristic(x0s, rel_t):
        return sam.x0_heuristic(x0s, None, rel_t)

    ventmap_sam.find_x0s_multi_algorithms = find_x0s_multi_algorithms
    ventmap_sam.x0_heuristic = x0_heuristic
    ventmap.SAM = ventmap_sam
    saved = {k: sys.modules.get(k) for k in ("ventmap", "ventmap.SAM")}
    sys.modules["ventmap"] = ventmap
    sys.modules["ventmap.SAM"] = ventmap_sam
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_augmentation", REF_AUG)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _sub_batch():
    """Breath windows with clear I/E structure plus a nubbin (no x0)."""
    rng = np.random.default_rng(8)
    out = np.zeros((4, 1, 224), np.float32)
    for b in range(3):
        insp_len = 40 + 15 * b
        insp = 35.0 * np.sin(np.linspace(0, np.pi, insp_len)) ** 0.8
        exp = -25.0 * np.exp(-np.linspace(0, 4, 224 - insp_len))
        out[b, 0] = np.concatenate([insp, exp]) + rng.normal(
            0, 0.3, 224)
    # nubbin: inspiration only, never crosses zero
    out[3, 0] = 20.0 * np.sin(np.linspace(0, np.pi * 0.45, 224))
    return out


@pytest.mark.parametrize("use_i", [True, False])
def test_ie_programmable_warp_matches_reference(ref_augmentation, use_i):
    from deepards_tpu.data.augment import IEWindowWarpingIEProgrammable

    x = _sub_batch()
    np.random.seed(1234)
    ref_out = ref_augmentation.IEWindowWarpingIEProgrammable(
        0.5, 2.0, 1.0, use_i)(x.copy().astype(np.float64))
    np.random.seed(1234)
    ours = IEWindowWarpingIEProgrammable(0.5, 2.0, 1.0, use_i=use_i)(
        x.copy().astype(np.float64), rng=LegacyRng())
    np.testing.assert_allclose(ours, ref_out, atol=1e-9)


def test_naive_window_warping_matches_reference(ref_augmentation):
    from deepards_tpu.data.augment import NaiveWindowWarping

    x = _sub_batch()
    np.random.seed(77)
    ref_out = ref_augmentation.NaiveWindowWarping(
        0.5, 2.0, 1.0)(x.copy().astype(np.float64))
    np.random.seed(77)
    ours = NaiveWindowWarping(0.5, 2.0, 1.0)(
        x.copy().astype(np.float64), rng=LegacyRng())
    np.testing.assert_allclose(ours, ref_out, atol=1e-9)


def test_probability_gate_skips_identically(ref_augmentation):
    from deepards_tpu.data.augment import NaiveWindowWarping

    x = _sub_batch()
    np.random.seed(5)
    ref_out = ref_augmentation.NaiveWindowWarping(
        0.5, 2.0, 0.0)(x.copy().astype(np.float64))
    np.random.seed(5)
    ours = NaiveWindowWarping(0.5, 2.0, 0.0)(
        x.copy().astype(np.float64), rng=LegacyRng())
    np.testing.assert_array_equal(ours, ref_out)
    np.testing.assert_array_equal(ref_out, x)  # gate=0 -> untouched
