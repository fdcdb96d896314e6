"""In-loop observability without breaking jit.

The reference drops ``imagesc``/``drawnow`` straight into its hot loops
(DispSegmentation.m:395,644-645, GAC_v10a.m:117) — a host-side UI effect
per iteration. The TPU-native equivalents, both strictly opt-in and free
when unused:

* model-level ``collect``/``progress`` hooks — the drivers' Python-level
  loops (pyramid levels, outer fixed points) call back on the host
  between jitted calls; no device sync beyond what the caller does with
  the fields (flow_nd/flow_ad/disparity/... ``collect=`` arguments).
* ``probe(tag, value)`` — inside a jitted loop, ship a scalar (residual
  norm, energy, live-pixel count) to the host via ``jax.debug.callback``.
  Non-blocking: callbacks are queued by the runtime, the device never
  stalls on the host. Use sparingly — every probe is a device->host
  transfer.

Example::

    from pde_tpu.utils.observe import probe

    def body(i, state):
        ...
        probe("residual", jnp.linalg.norm(r))
        return state
"""

from __future__ import annotations

from typing import Callable

import jax

_sinks: list[Callable[[str, float], None]] = []


def add_sink(fn: Callable[[str, float], None]) -> None:
    """Register a host-side consumer for probe values (default: print)."""
    _sinks.append(fn)


def clear_sinks() -> None:
    _sinks.clear()


def _emit(tag: str, value) -> None:
    if _sinks:
        for fn in _sinks:
            fn(tag, float(value))
    else:
        print(f"[probe] {tag} = {float(value):.6g}", flush=True)


def probe(tag: str, value) -> None:
    """Report a scalar from inside jitted code (non-blocking host callback)."""
    jax.debug.callback(lambda v: _emit(tag, v), value, ordered=False)
