"""Replicate-border filtering (MATLAB ``imfilter(..., 'replicate')`` semantics).

The reference's convolutions are *correlations* (no kernel flip) with
replicate (clamp) padding — both the MATLAB ``imfilter`` calls
(e.g. /root/reference/matlab/optical_flow/FlowEminND_llin_2D_v10.m:420-423)
and the hand-rolled C conv primitives
(/root/reference/mex/source/library/imageDerivatives.c:66-211, which clamp
the out-of-range taps to the edge sample). XLA's conv is also a
correlation, so kernels are passed through unflipped.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _pad_edge(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 2) + [(ph, ph), (pw, pw)]
    return jnp.pad(x, pad, mode="edge")


def imfilter_replicate(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Correlate ``x`` (..., H, W) with a 2-D ``kernel``, replicate borders.

    Equivalent to MATLAB ``imfilter(x, kernel, 'replicate')`` for odd-sized
    kernels (the only kind the reference uses).

    The filters here are tiny (3- and 5-tap) and the images effectively
    single-channel, a shape where XLA:TPU's convolution emitter puts the
    batch of 1-2 frames in the 128 vector lanes (~1% utilisation, ~3 ms
    per call — profiled as HALF the fused flow_nd frame time). Static
    kernels are therefore unrolled into shift-and-add elementwise taps,
    which the VPU runs at full width and XLA fuses into the surrounding
    arithmetic; a (rare) traced kernel falls back to the general conv.
    """
    try:
        # concrete (host) kernel values; raises for traced kernels —
        # including np constants converted to jnp INSIDE a trace, which
        # become constant tracers
        kval = np.asarray(kernel, dtype=np.float32)
        if kval.ndim == 1:
            kval = kval[None, :]
    except Exception:
        kval = None
    if kval is not None:
        kh, kw = kval.shape
        assert kh % 2 == 1 and kw % 2 == 1, "only odd kernels supported"
        *lead, h, w = x.shape
        xp = _pad_edge(x, kh // 2, kw // 2)
        out = None
        for i in range(kh):
            for j in range(kw):
                kv = float(kval[i, j])
                if kv == 0.0:
                    continue
                term = xp[..., i:i + h, j:j + w] * kv
                out = term if out is None else out + term
        return jnp.zeros_like(x) if out is None else out

    kernel = jnp.asarray(kernel, dtype=x.dtype)
    if kernel.ndim == 1:
        kernel = kernel[None, :]
    kh, kw = kernel.shape
    assert kh % 2 == 1 and kw % 2 == 1, "only odd kernels supported"
    *lead, h, w = x.shape
    xp = _pad_edge(x.reshape((-1, h, w)), kh // 2, kw // 2)[:, None]  # (N,1,H+,W+)
    out = lax.conv_general_dilated(
        xp,
        kernel[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,  # keep f32 on the MXU (no bf16 demotion)
    )
    return out[:, 0].reshape(*lead, h, w)


def separable_filter(x: jnp.ndarray, kv, kh) -> jnp.ndarray:
    """Vertical then horizontal 1-D correlation, replicate borders.

    ``kv`` acts along H (rows), ``kh`` along W (cols). Either may be None.
    Kernels stay host-side (NumPy) so imfilter_replicate can unroll them
    into fused shift-and-add taps (see its docstring).
    """
    if kv is not None:
        x = imfilter_replicate(x, np.asarray(kv, dtype=np.float32)[:, None])
    if kh is not None:
        x = imfilter_replicate(x, np.asarray(kh, dtype=np.float32)[None, :])
    return x


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    """Unnormalised 1-D Gaussian samples on a centered window."""
    r = (size - 1) / 2.0
    xs = np.arange(size) - r
    return np.exp(-(xs**2) / (2.0 * sigma**2))


@functools.lru_cache(maxsize=None)
def gaussian_kernel_2d(size: int, sigma: float) -> np.ndarray:
    """MATLAB ``fspecial('gaussian', [size size], sigma)`` (sum == 1)."""
    k1 = gaussian_kernel_1d(size, sigma)
    k2 = np.outer(k1, k1)
    return (k2 / k2.sum()).astype(np.float32)


#: 1-4-6-4-1 binomial low-pass of the FMG pyramid
#: (FlowEminNDFASFMG_elin_2D_v10.m:98-110)
binomial5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0
