"""Flow visualisation (HSV direction/magnitude coding, flow2color.m)."""

from __future__ import annotations

import numpy as np


def flow2color(u: np.ndarray, v: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """(H, W) flow -> (H, W, 3) float RGB in [0,1].

    Hue encodes direction, value encodes magnitude (saturation 1), as in
    matlab/optical_flow/flow2color.m:26-47.
    """
    u = np.nan_to_num(np.asarray(u, dtype=np.float64))
    v = np.nan_to_num(np.asarray(v, dtype=np.float64))
    mag = np.sqrt(u * u + v * v)
    if max_mag is None:
        max_mag = mag.max() or 1.0
    hue = (np.arctan2(-v, -u) / np.pi + 1.0) / 2.0
    val = np.clip(mag / max_mag, 0.0, 1.0)
    sat = np.ones_like(hue)

    # hsv -> rgb
    h6 = (hue % 1.0) * 6.0
    i = np.floor(h6).astype(int) % 6
    f = h6 - np.floor(h6)
    p = val * (1 - sat)
    q = val * (1 - sat * f)
    t = val * (1 - sat * (1 - f))
    rgb = np.zeros(u.shape + (3,))
    conds = [
        (val, t, p), (q, val, p), (p, val, t),
        (p, q, val), (t, p, val), (val, p, q),
    ]
    for k, (r, g, b) in enumerate(conds):
        m = i == k
        rgb[m, 0], rgb[m, 1], rgb[m, 2] = r[m], g[m], b[m]
    return rgb.astype(np.float32)
