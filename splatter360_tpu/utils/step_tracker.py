"""Global-step sharing for data workers (SURVEY.md §2.2).

The reference shares the trainer step with torch DataLoader workers via shared memory
(src/misc/step_tracker.py:9-23) to drive the bounded-sampler curriculum. Our input
pipeline runs threads in-process, so a plain mutable cell with a lock suffices; for
multi-process loaders a multiprocessing.Value drop-in is provided.
"""

from __future__ import annotations

import multiprocessing as mp
import threading


class StepTracker:
    def __init__(self, multiprocess: bool = False):
        if multiprocess:
            self._value = mp.Value("q", 0)
            self._lock = None
        else:
            self._value = 0
            self._lock = threading.Lock()

    def set_step(self, step: int) -> None:
        if self._lock is None:
            with self._value.get_lock():
                self._value.value = int(step)
        else:
            with self._lock:
                self._value = int(step)

    def get_step(self) -> int:
        if self._lock is None:
            with self._value.get_lock():
                return int(self._value.value)
        with self._lock:
            return int(self._value)
