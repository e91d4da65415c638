"""Structured per-stage timing and logging.

The reference brackets every driver with `Sys.time()` and narrates stages
with `cat()` (R/SHARP.R:48,282-290). We keep the same observable milestones
but as structured records so results can carry their timing breakdown
(none is published by the reference — we produce our own, SURVEY.md §6).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Dict, List


_VERBOSE = os.environ.get("SHARP_TPU_VERBOSE", "0") not in ("0", "", "false")


def log(msg: str) -> None:
    if _VERBOSE:
        print(f"[sharp_tpu] {msg}", file=sys.stderr, flush=True)


class StageTimer:
    """Accumulates wall-clock per named stage; cheap enough to always run."""

    def __init__(self) -> None:
        self.records: List[Dict] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        log(f"stage {name} ...")
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            self.records.append({"stage": name, "seconds": dt})
            log(f"stage {name} done in {dt:.3f}s")

    def total(self) -> float:
        return time.perf_counter() - self._t0

    def as_dict(self) -> Dict:
        return {
            "total_seconds": self.total(),
            "stages": list(self.records),
        }
