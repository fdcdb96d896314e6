"""Typed per-algorithm configs (the reference's ``param`` structs).

The reference uses a defaults struct overridden by name/value varargin
pairs (``matlab/setParameters.m:20-39``; unknown names silently ignored).
Here every driver has a frozen dataclass of the same parameter names and
tuned default values; ``with_overrides`` applies keyword overrides and
*rejects* unknown names (the silent-ignore of the reference is a footgun
we choose not to reproduce).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

T = TypeVar("T")


def with_overrides(cfg: T, **overrides: Any) -> T:
    unknown = set(overrides) - {f.name for f in dataclasses.fields(cfg)}
    if unknown:
        raise TypeError(f"unknown parameter(s) {sorted(unknown)} for {type(cfg).__name__}")
    return dataclasses.replace(cfg, **overrides)
