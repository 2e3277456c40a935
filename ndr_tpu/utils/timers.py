"""Hierarchical named-timer facade (the reference's `benchmark` module).

API parity with MeshFEM's GlobalBenchmark (GlobalBenchmark.hh:14-59 and
the `benchmark` python module, python_bindings/benchmark.cc:7-30):
``reset()``, ``start_timer_section(name)`` / ``stop_timer_section(name)``,
scoped sections, ``report()``, ``to_dict()``.

On TPU the fine-grained on-device timeline comes from ``jax.profiler``
(use :func:`trace` around a region to dump a TensorBoard trace); these
wall-clock timers measure host-side phases (setup, compile, per-step) and
block on device completion when ``sync=True`` so the numbers mean what
they say.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class _Section:
    __slots__ = ("total", "count", "children")

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self.children = defaultdict(_Section)


class Benchmark:
    """Hierarchical accumulating timers with reset/report/to_dict."""

    def __init__(self, sync: bool = True):
        self._root = _Section()
        self._stack = []  # (name, start_time, section)
        self.sync = sync

    # -- core API (names mirror the reference's python bindings) ----------

    def reset(self):
        self._root = _Section()
        self._stack = []

    def start_timer_section(self, name: str):
        parent = self._stack[-1][2] if self._stack else self._root
        sec = parent.children[name]
        self._stack.append((name, time.perf_counter(), sec))

    def stop_timer_section(self, name: str):
        if self.sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        top_name, start, sec = self._stack.pop()
        if top_name != name:
            raise RuntimeError(f"Timer mismatch: stopping {name!r}, open {top_name!r}")
        sec.total += time.perf_counter() - start
        sec.count += 1

    @contextlib.contextmanager
    def section(self, name: str):
        self.start_timer_section(name)
        try:
            yield
        finally:
            self.stop_timer_section(name)

    def to_dict(self) -> Dict:
        def walk(sec):
            return {
                name: {
                    "seconds": child.total,
                    "count": child.count,
                    "children": walk(child),
                }
                for name, child in sec.children.items()
            }

        return walk(self._root)

    def report(self, file=None) -> str:
        lines = []

        def walk(sec, depth):
            for name, child in sec.children.items():
                lines.append(
                    f"{'  ' * depth}{name}: {child.total:.4f}s ({child.count} calls)"
                )
                walk(child, depth + 1)

        walk(self._root, 0)
        out = "\n".join(lines)
        if file is not None:
            print(out, file=file)
        return out


# module-level default instance (parity with the global C++ benchmark)
_default = Benchmark()

reset = _default.reset
start_timer_section = _default.start_timer_section
stop_timer_section = _default.stop_timer_section
section = _default.section
to_dict = _default.to_dict
report = _default.report


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context for on-device timelines."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
