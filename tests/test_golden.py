"""Golden-field parity on real bundled images.

Goldens are produced by the literal NumPy reference ports
(scripts/make_goldens.py) on crops of the bundled Yosemite / Beanbags
frames. The acceptance budget follows BASELINE.json's north star:
engine flow within 2% average endpoint error of the reference fields.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLD, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run scripts/make_goldens.py")
    return np.load(path)


def test_flow_nd_golden_epe():
    """Flagship warping flow vs the literal oracle on Yosemite (crop):
    AEE must be <= 2% of the mean golden flow magnitude."""
    from pde_tpu.utils.io import load_yosemite
    from pde_tpu.models.flow_nd import flow_nd

    g = _load("flow_nd_yosemite.npz")
    y0, y1, _, _ = load_yosemite()
    u, v = flow_nd(y0[:128, :160], y1[:128, :160], "grad", "gradmag", solver=2)
    u, v = np.asarray(u), np.asarray(v)
    epe = np.sqrt((u - g["u"]) ** 2 + (v - g["v"]) ** 2)
    mag = np.sqrt(g["u"] ** 2 + g["v"] ** 2).mean()
    rel = epe.mean() / mag
    assert rel < 0.02, f"AEE {epe.mean():.4f}px = {rel*100:.2f}% of mean |flow| {mag:.3f}"


def test_flow_nd_golden_gt_accuracy():
    """Engine accuracy vs ground truth must match the oracle's (within
    5% relative) — parity in the metric users actually care about."""
    from pde_tpu.utils.io import load_yosemite
    from pde_tpu.models.flow_nd import flow_nd

    g = _load("flow_nd_yosemite.npz")
    y0, y1, _, _ = load_yosemite()
    gtu, gtv = g["gtu"], g["gtv"]
    valid = np.isfinite(gtu) & (np.abs(gtu) < 1e3)
    u, v = flow_nd(y0[:128, :160], y1[:128, :160], "grad", "gradmag", solver=2)
    u, v = np.asarray(u), np.asarray(v)

    def aee(uu, vv):
        return np.mean(np.sqrt((uu - gtu)[valid] ** 2 + (vv - gtv)[valid] ** 2))

    engine_aee = aee(u, v)
    oracle_aee = aee(g["u"], g["v"])
    assert engine_aee < oracle_aee * 1.05 + 0.01, (engine_aee, oracle_aee)


def test_flow_hs_golden_epe():
    from pde_tpu.utils.io import load_yosemite
    from pde_tpu.models.flow_hs import flow_hs

    g = _load("flow_hs_yosemite.npz")
    y0, y1, _, _ = load_yosemite()
    u, v = flow_hs(y0[:128, :160], y1[:128, :160], solver=2, iter=200)
    uo, vo = g["u"], g["v"]
    # golden is the sequential-ALR field at iter=200 (converged); the PCG
    # engine at the same count must land on the same flow within 2% AEE
    u, v = np.asarray(u), np.asarray(v)
    epe = np.sqrt((u - uo) ** 2 + (v - vo) ** 2)
    scale = np.sqrt(uo**2 + vo**2).mean()
    assert epe.mean() / scale < 0.02, epe.mean() / scale


def test_tv4_golden_parity():
    from pde_tpu.models.tv_denoise import tv_denoise4

    g = _load("tv4_beanbags.npz")
    out = np.asarray(tv_denoise4(g["img"], solver=1))
    ref = g["out"]
    rng = ref.max() - ref.min()
    assert np.abs(out - ref).max() < 0.08 * rng
    assert np.sqrt(np.mean((out - ref) ** 2)) < 0.02 * rng
