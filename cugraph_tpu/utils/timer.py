"""Per-phase timing — the HighResTimer analog.

ref: cpp/src/utilities/high_res_timer.hpp:27 (start/stop/display per
label) and the Louvain timer wrappers that sync + barrier in MG
(community/detail/common_methods.hpp:34-71).

TPU equivalent: block_until_ready() plays the role of the device sync (and
of the MG comm barrier — jax collectives are globally ordered inside a
step, so a blocking host read is a barrier). jax.profiler traces can wrap
any region via trace_context.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class HighResTimer:
    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._open: Dict[str, float] = {}

    def start(self, label: str) -> None:
        self._open[label] = time.perf_counter()

    def stop(self, label: str, sync=None) -> float:
        """sync: optional array/pytree to block_until_ready before reading
        the clock (device-time-accurate, like the reference's cudaStreamSync)."""
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._open.pop(label)
        self._totals[label] += dt
        self._counts[label] += 1
        return dt

    @contextlib.contextmanager
    def range(self, label: str, sync_result: bool = False):
        self.start(label)
        holder = {}
        try:
            yield holder
        finally:
            self.stop(label, sync=holder.get("sync"))

    def display(self, out=None) -> str:
        lines = [
            f"{label}: {self._totals[label]*1e3:10.3f} ms "
            f"({self._counts[label]} calls)"
            for label in sorted(self._totals)
        ]
        text = "\n".join(lines)
        if out is not None:
            print(text, file=out)
        return text

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()
        self._open.clear()


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler wrapper: `with profiler_trace('/tmp/trace'): ...` then
    inspect with TensorBoard/xprof. The TPU answer to CUDA -lineinfo
    profiles (cpp/CMakeLists.txt:79)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
