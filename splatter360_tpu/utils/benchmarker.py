"""Timing + memory artifacts (SURVEY.md §5 tracing parity).

Benchmarker mirrors /root/reference/src/misc/benchmarker.py:12-40: wall-clock context
manager per tag with per-call amortization, dumped to benchmark.json; peak memory uses
jax device memory stats instead of torch.cuda (dump_memory -> peak_memory.json).
block_until_ready is the caller's responsibility for accurate device timings (the
evaluator does it); jax.profiler traces can be captured with the `trace` helper.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import jax


class Benchmarker:
    def __init__(self):
        self.execution_times = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def dump(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(dict(self.execution_times), indent=2))

    def dump_memory(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        stats = {}
        for i, dev in enumerate(jax.local_devices()):
            try:
                s = dev.memory_stats()
            except Exception:
                s = None
            if s:
                stats[f"device_{i}"] = {
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        path.write_text(json.dumps(stats, indent=2))

    def summarize(self) -> dict:
        out = {}
        for tag, times in self.execution_times.items():
            out[tag] = sum(times) / max(len(times), 1)
        return out

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)


@contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TPU equivalent of torch profiler/NVTX: none in
    the reference — this is added capability)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
