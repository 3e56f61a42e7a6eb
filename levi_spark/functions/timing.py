"""Wall-clock stage instrumentation shared by queries and lifecycle
operators: timings land in ``STAGE_TIMINGS[scope][stage]`` and echo to
stderr when ``LEVI_STAGE_TIMING=1``. The tool behind bench-top-query
analysis — a multi-second lifecycle operation is only fixable once you
know which of its scans/commits/syncs owns the time."""

from __future__ import annotations

import os
import sys
import time

STAGE_TIMINGS: dict[str, dict[str, float]] = {}


class stage_timer:
    def __init__(self, scope: str, stage: str):
        self.scope, self.stage = scope, stage

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        sec = time.perf_counter() - self._t0
        STAGE_TIMINGS.setdefault(self.scope, {})[self.stage] = round(sec, 4)
        if os.environ.get("LEVI_STAGE_TIMING"):
            print(
                f"[stage] {self.scope}.{self.stage}: {sec:.3f}s",
                file=sys.stderr,
            )
        return False
