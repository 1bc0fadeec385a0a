"""Hierarchical profiler: nested wall-time sample tree + device trace hooks.

TPU-native analog of the reference's dual profiler
(src/Core/Profiler.{hpp,cpp}: static CPU sample tree with RAII
ProfilerRegion nesting, Profiler.hpp:23-36; GPU timestamps ingested per pass
and drawn as a timeline, Profiler.cpp:36-130). Device-side timing on TPU
rides ``jax.profiler`` traces; this module provides the host-side region
tree, per-frame ring buffer, and a text report in place of the ImGui
flamegraph.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Sample:
    label: str
    start: float = 0.0
    duration: float = 0.0
    children: list = field(default_factory=list)


class Profiler:
    """Singleton-style profiler (the reference's is fully static)."""

    def __init__(self, history: int = 256):
        self._root: Optional[Sample] = None
        self._stack: list[Sample] = []
        self.frame_times = deque(maxlen=history)  # FPS plot ring buffer
        self._frame_start: Optional[float] = None
        self.enabled = True

    # -- frame lifecycle (reference: begin_frame, Application.cpp:19) ------
    def begin_frame(self):
        now = time.perf_counter()
        if self._frame_start is not None:
            self.frame_times.append(now - self._frame_start)
        self._frame_start = now
        self._root = Sample("frame", start=now)
        self._stack = [self._root]

    # -- regions (reference: ProfilerRegion RAII, CommandBuffer.hpp:315) ---
    @contextlib.contextmanager
    def region(self, label: str, sync=None):
        """Time a region. Pass ``sync=jax_array`` (or any object with
        block_until_ready) to include device completion — the analog of the
        reference's GPU timestamps."""
        if not self.enabled:
            yield
            return
        if self._root is None:
            self.begin_frame()
        s = Sample(label, start=time.perf_counter())
        self._stack[-1].children.append(s)
        self._stack.append(s)
        try:
            yield s
        finally:
            if sync is not None and hasattr(sync, "block_until_ready"):
                sync.block_until_ready()
            s.duration = time.perf_counter() - s.start
            self._stack.pop()

    def end_frame(self):
        if self._root is not None and self._frame_start is not None:
            self._root.duration = time.perf_counter() - self._frame_start

    # -- reporting (replaces the ImGui timeline, Profiler.cpp:36-130) ------
    def report(self) -> str:
        lines = []
        if self.frame_times:
            ft = sum(self.frame_times) / len(self.frame_times)
            lines.append(
                f"frames: {len(self.frame_times)}  mean {ft * 1000:.1f} ms "
                f"({1.0 / max(ft, 1e-9):.1f} fps)"
            )

        def walk(s: Sample, depth: int):
            lines.append(
                f"{'  ' * depth}{s.label:<24s} {s.duration * 1000:9.2f} ms"
            )
            for c in s.children:
                walk(c, depth + 1)

        if self._root is not None:
            walk(self._root, 0)
        return "\n".join(lines)

    @contextlib.contextmanager
    def device_trace(self, logdir: str):
        """Capture a jax.profiler trace (view with TensorBoard/Perfetto) —
        the deep-dive analog of RenderDoc labels."""
        import jax

        with jax.profiler.trace(logdir):
            yield


PROFILER = Profiler()


def region(label: str, sync=None):
    return PROFILER.region(label, sync)
