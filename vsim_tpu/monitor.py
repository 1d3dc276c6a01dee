"""Per-phase performance monitor — the reference's monitor.c reborn.

Reference: ~60 named timer slots accumulated per thread with wall-clock and
CPU ticks (monitor.c:37-67), reported as an indented table with seconds and
%-of-total (show_time_sep, monitor.c:196-262), plus an rusage dump
(show_time, monitor.c:69-118).

Here: a process-global registry of named spans (context managers), nestable
for the hierarchical report, with wall and CPU time, call counts, and an
optional hook into jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import threading
import time
from typing import Dict, List, Optional


@dataclasses.dataclass
class SpanStat:
    name: str
    depth: int
    wall_s: float = 0.0
    cpu_s: float = 0.0
    calls: int = 0


class Monitor:
    def __init__(self):
        self._stats: Dict[str, SpanStat] = {}
        self._stack: List[str] = []
        self._lock = threading.Lock()
        self._t_start = time.perf_counter()

    def reset(self):
        with self._lock:
            self._stats.clear()
            self._stack.clear()
            self._t_start = time.perf_counter()

    @contextlib.contextmanager
    def span(self, name: str):
        depth = len(self._stack)
        path = "/".join(self._stack + [name])
        self._stack.append(name)
        w0 = time.perf_counter()
        c0 = time.process_time()
        try:
            yield
        finally:
            w1 = time.perf_counter()
            c1 = time.process_time()
            self._stack.pop()
            with self._lock:
                st = self._stats.setdefault(path, SpanStat(name=name, depth=depth))
                st.wall_s += w1 - w0
                st.cpu_s += c1 - c0
                st.calls += 1

    def record(self, name: str, wall_s: float, calls: int = 1,
               depth: int = 0) -> None:
        """Inject an externally measured duration (e.g. a device-time phase
        from chain_time) into the report table."""
        with self._lock:
            st = self._stats.setdefault(name, SpanStat(name=name, depth=depth))
            st.wall_s += wall_s
            st.calls += calls

    def stats(self) -> Dict[str, SpanStat]:
        return dict(self._stats)

    def report(self, total: Optional[float] = None) -> str:
        """Indented table, reference show_time_sep style (monitor.c:196-262):
        seconds, CPU seconds, call count, % of total wall."""
        if total is None:
            total = time.perf_counter() - self._t_start
        lines = [
            f"{'span':<40} {'wall_s':>10} {'cpu_s':>10} {'calls':>7} {'%tot':>6}"
        ]
        for path in sorted(self._stats):
            st = self._stats[path]
            pct = 100.0 * st.wall_s / total if total > 0 else 0.0
            label = "  " * st.depth + st.name
            lines.append(
                f"{label:<40} {st.wall_s:>10.4f} {st.cpu_s:>10.4f}"
                f" {st.calls:>7d} {pct:>5.1f}%"
            )
        lines.append(f"{'TOTAL':<40} {total:>10.4f}")
        return "\n".join(lines)

    def show(self):
        print(self.report())
        try:
            import resource

            ru = resource.getrusage(resource.RUSAGE_SELF)
            print(
                f"rusage: utime={ru.ru_utime:.2f}s stime={ru.ru_stime:.2f}s "
                f"maxrss={ru.ru_maxrss // 1024}MB"
            )
        except ImportError:
            pass


_GLOBAL = Monitor()

span = _GLOBAL.span
reset = _GLOBAL.reset
report = _GLOBAL.report
show = _GLOBAL.show
stats = _GLOBAL.stats
record = _GLOBAL.record


def chain_time(step_fn, params, init, reps=8, n_short=2, n_long=10):
    """Median per-step DEVICE seconds of jitted ``step_fn(params, carry) ->
    carry`` — the per-phase attribution method of tools/decode_profile.py
    promoted into the monitor (reference: the per-op timer slots of
    monitor.c:37-67, which the TPU's async dispatch makes meaningless for
    host-side spans).

    Times a chained ``lax.scan`` (output feeds next input, defeating CSE and
    keeping steps serialized on device) at two lengths and differences them,
    cancelling dispatch/tunnel constants.  ``params`` rides as an explicit
    argument so multi-GB weights don't bake into the executable."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("n",))
    def loop(params, carry, n):
        def body(c, _):
            return step_fn(params, c), None

        carry, _ = jax.lax.scan(body, carry, None, length=n)
        return carry

    def run(n):
        c = loop(params, jax.tree.map(jnp.copy, init), n=n)
        leaf = jax.tree.leaves(c)[0]
        float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(n_short)  # compile
    run(n_long)  # compile

    def t(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max((t(n_long) - t(n_short)) / (n_long - n_short), 1e-9)


@contextlib.contextmanager
def jax_trace(logdir: str = "/tmp/vsim_tpu_trace"):
    """Wrap a region in a jax profiler trace (TensorBoard-viewable)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
