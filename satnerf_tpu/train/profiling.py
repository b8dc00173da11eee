"""Profiling: phase timing report + on-demand device trace capture.

ref: framework/pipelines.py:302-305 (Lightning SimpleProfiler report into
<run_dp>/profiler) and the per-step timing scalars
(base_ray_pipeline.py:92-97). TPU-native additions: ``jax.profiler`` trace
capture of a window of training steps, enabled by the
``SATNERF_TPU_PROFILE_DIR`` env var (inspect with TensorBoard / xprof).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager


class PhaseProfiler:
    """Wall-clock accounting per named phase, dumped like SimpleProfiler."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'phase':<28}{'calls':>8}{'total_s':>12}{'mean_ms':>12}"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<28}{c:>8}{t:>12.3f}{t / c * 1e3:>12.3f}")
        return "\n".join(lines)

    def dump(self, run_dp: str) -> None:
        os.makedirs(run_dp, exist_ok=True)
        with open(os.path.join(run_dp, "profiler.txt"), "w") as f:
            f.write(self.report() + "\n")


class TraceCapture:
    """Capture a jax.profiler device trace over a step window.

    Enabled when SATNERF_TPU_PROFILE_DIR is set; captures steps
    [start, start+n) once per run.
    """

    def __init__(self, start_step: int = 20, n_steps: int = 10) -> None:
        self.dir = os.environ.get("SATNERF_TPU_PROFILE_DIR")
        self.start = start_step
        self.stop = start_step + n_steps
        self._active = False
        self._done = False
        self._covered_first: int | None = None
        self._covered_last: int | None = None
        self._blocks: set[int] = set()

    def step(self, step: int, block: int = 1) -> None:
        """Called once per dispatch covering steps [step, step+block).

        With steps_per_dispatch > 1 a dispatch is the finest traceable unit,
        so the window is aligned to blocks: the trace starts at the first
        dispatch that overlaps [start, stop) and the exact covered step range
        + block size are recorded in trace_window.json alongside the trace.
        """
        if self.dir is None or self._done:
            return
        import jax

        if self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            self._write_window()
            return
        if not self._active and step + block > self.start and step < self.stop:
            jax.profiler.start_trace(self.dir)
            self._active = True
            self._covered_first = step
        if self._active:
            self._covered_last = step + block - 1
            self._blocks.add(block)

    def _write_window(self) -> None:
        import json

        os.makedirs(self.dir, exist_ok=True)
        with open(os.path.join(self.dir, "trace_window.json"), "w") as f:
            json.dump(
                {
                    "first_step": self._covered_first,
                    "last_step": self._covered_last,
                    # all distinct dispatch sizes observed in the window
                    # (blocks shrink to 1 near log/epoch/drop boundaries)
                    "steps_per_dispatch": max(self._blocks or {1}),
                    "block_sizes": sorted(self._blocks),
                },
                f,
            )

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            self._write_window()
