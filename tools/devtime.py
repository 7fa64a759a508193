"""Trustworthy device timing through the axon tunnel.

Wall-clock around `block_until_ready` is unreliable over the TPU tunnel (it
can return before execution finishes), so this measures real on-device time
from the profiler trace: run the jitted fn `iters` times under
`jax.profiler.trace`, then sum the duration of the `jit_<name>` XLA-executable
events and divide by the run count.

Usage:
    from tools.devtime import devtime
    ms = devtime(jitted_fn, *args)               # mean device ms per call
    ms, ops = devtime(jitted_fn, *args, top=10)  # + top-10 op breakdown
"""

from __future__ import annotations

import glob
import gzip
import json
import tempfile

import jax


def _trace_events(trace_dir: str):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = []
    for f in files:
        ev.extend(json.load(gzip.open(f)).get("traceEvents", []))
    return ev


def devtime(fn, *args, iters: int = 5, top: int = 0, warmup: int = 1):
    """Mean on-device milliseconds per call of `fn(*args)`.

    With top > 0, also returns the top-N (name, total_ms_across_iters) op
    list, useful for finding the hot HLO inside the program.
    """
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
        events = _trace_events(td)
    total = 0.0
    ops: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            total += e["dur"]
        elif top and not name.startswith("$"):
            ops[name] = ops.get(name, 0.0) + e["dur"]
    ms = total / iters / 1000.0
    if top:
        ranked = sorted(ops.items(), key=lambda kv: -kv[1])[:top]
        return ms, [(k, v / 1000.0) for k, v in ranked]
    return ms
