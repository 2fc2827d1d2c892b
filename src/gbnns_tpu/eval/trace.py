"""Tracing / profiling hooks.

Capability: SURVEY.md §5.1 — the reference's only observability is
wall-clock timers and distance-computation counters; the rebuild adds
device-level tracing (Perfetto via ``jax.profiler``) and per-program cost
introspection from the XLA compiler, while keeping the reference's
dist-comps counter as an explicit kernel output (``SearchResult.n_dist``).
"""

from __future__ import annotations

import contextlib
import json
from typing import Any, Callable

import jax


@contextlib.contextmanager
def profile_trace(out_dir: str):
    """Capture a Perfetto/XPlane device trace of the enclosed block.
    View with Perfetto UI or TensorBoard's profile plugin."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args, static_argnames=(), **kwargs) -> dict[str, Any]:
    """XLA's compiled cost model for ``fn(*args)``: FLOPs, bytes accessed,
    and utilization estimates — the rebuild's per-kernel replacement for
    hand-counted distance computations when tuning tiles."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn, static_argnames=static_argnames)
    compiled = jitted.lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-module list
        costs = costs[0] if costs else {}
    wanted = {k: v for k, v in costs.items()
              if k in ("flops", "bytes accessed", "transcendentals",
                       "utilization operand 0 {}", "optimal_seconds")}
    return {"all": dict(costs), "summary": wanted,
            "flops": costs.get("flops", float("nan")),
            "bytes": costs.get("bytes accessed", float("nan"))}


def memory_analysis(fn: Callable, *args, **kwargs) -> dict[str, Any]:
    """Compiled memory footprint (bytes) per space, when the backend
    reports it."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    mem = compiled.memory_analysis()
    out = {}
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "generated_code_size_in_bytes"):
        out[attr] = getattr(mem, attr, None)
    return out


def dump_report(path: str, report: dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=str)
