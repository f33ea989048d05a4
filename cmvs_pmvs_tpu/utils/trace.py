"""Tracing / profiling: structured per-phase timing + xprof capture.

The reference's observability is wall-clock `time()` deltas printed per
phase and a vestigial, never-incremented status array (reference
source/pmvs/findMatch.cpp:188-219, seed.cpp:75-92, expand.cpp:30-55,
filter.cpp:30-85; SURVEY.md section 5.1). Here each phase is a named
span: wall time, device time (block_until_ready at span exit so jitted
work is attributed to the phase that launched it), and counters; spans
nest and export as JSON. `Tracer(profile_dir=...)` additionally wraps
the run in a jax.profiler trace so xprof/tensorboard shows per-kernel
device timelines, and every span becomes a TraceAnnotation visible in
the trace viewer.
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Span:
    name: str
    seconds: float = 0.0
    count: int = 0
    counters: dict = field(default_factory=dict)


class Tracer:
    """Hierarchical phase timer with optional xprof capture.

    Usage:
        tracer = Tracer(profile_dir="/tmp/xprof")  # dir optional
        with tracer.trace():
            with tracer.span("seed"):
                ...
            tracer.add_counter("seed", "patches", 123)
        tracer.report()  # -> dict; tracer.write(path) -> json file
    """

    def __init__(self, profile_dir: str | None = None, enabled: bool = True):
        self.profile_dir = profile_dir
        self.enabled = enabled
        self.spans: dict[str, Span] = {}
        self._order: list[str] = []
        self._stack: list[str] = []

    @contextmanager
    def trace(self):
        """Whole-run context; starts/stops the jax profiler when a
        profile_dir is set."""
        if not self.enabled or self.profile_dir is None:
            yield self
            return
        import jax
        with jax.profiler.trace(self.profile_dir):
            yield self

    @contextmanager
    def span(self, name: str, block: bool = False):
        """Time a phase. Nested spans get dotted names. `block=True`
        inserts a device sync at exit so async-dispatched work lands in
        this span's wall time."""
        if not self.enabled:
            yield
            return
        full = ".".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.time()
        try:
            import jax
            with jax.profiler.TraceAnnotation(full):
                yield
            if block:
                # attribute in-flight device work to this span
                (jax.device_put(0) + 0).block_until_ready()
        finally:
            self._stack.pop()
            dt = time.time() - t0
            sp = self.spans.get(full)
            if sp is None:
                sp = self.spans[full] = Span(full)
                self._order.append(full)
            sp.seconds += dt
            sp.count += 1

    def add_counter(self, span_name: str, key: str, value):
        sp = self.spans.get(span_name)
        if sp is None:
            sp = self.spans[span_name] = Span(span_name)
            self._order.append(span_name)
        sp.counters[key] = sp.counters.get(key, 0) + value

    def report(self) -> dict:
        return {n: {"seconds": round(self.spans[n].seconds, 4),
                    "count": self.spans[n].count,
                    **self.spans[n].counters}
                for n in self._order}

    def write(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=1)

    def summary(self) -> str:
        rep = self.report()
        width = max((len(n) for n in rep), default=4)
        lines = [f"{n:<{width}}  {v['seconds']:>9.2f}s x{v['count']}"
                 + "".join(f"  {k}={v[k]}" for k in v
                           if k not in ("seconds", "count"))
                 for n, v in rep.items()]
        return "\n".join(lines)
