"""Restartable multi-step workflow DAG — the cascalog-checkpoint module
(cascalog-checkpoint/src/cascalog/checkpoint.clj:26-145) re-expressed as a
driver-side Python runner.

Semantics preserved:
- named steps with explicit deps (``deps="last"`` / ``deps="all"`` /
  list of step names — checkpoint.clj ``:deps :last/:all``)
- a marker file per completed step: on restart, completed steps are skipped
  (checkpoint.clj token files)
- per-step temp dirs (``:tmp-dirs``)
- bounded parallel execution of independent steps (threads + semaphore)
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class Step:
    name: str
    fn: Callable[..., Any]
    deps: Any = "last"  # "last" | "all" | list of names | None
    tmp_dirs: list = field(default_factory=list)


class Workflow:
    """Usage::

        wf = Workflow("/tmp/wf-markers")
        wf.step("ingest", lambda: ...)
        wf.step("clean", lambda: ..., deps="last")
        wf.step("report", lambda: ..., deps=["ingest", "clean"])
        wf.run(max_parallel=4)

    Completed steps write ``<dir>/<name>.done``; a re-run after failure
    skips them (checkpoint.clj's restart token behavior).
    """

    def __init__(self, marker_dir: str):
        self.marker_dir = marker_dir
        self.steps: list[Step] = []

    def step(self, name: str, fn: Optional[Callable[..., Any]] = None,
             deps: Any = "last", tmp_dirs: Optional[list] = None):
        """Register a step.  Callable form ``wf.step("n", fn)`` returns the
        workflow for chaining; with ``fn`` omitted it's a decorator:
        ``@wf.step("n", deps=[...])``."""
        if fn is None:
            def deco(f):
                self.step(name, f, deps=deps, tmp_dirs=tmp_dirs)
                return f
            return deco
        if any(s.name == name for s in self.steps):
            raise ValueError(f"duplicate step name {name!r}")
        self.steps.append(Step(name, fn, deps, tmp_dirs or []))
        return self

    # -- internals -----------------------------------------------------------

    def _resolve_deps(self) -> dict[str, list[str]]:
        resolved: dict[str, list[str]] = {}
        for i, s in enumerate(self.steps):
            if s.deps is None:
                resolved[s.name] = []
            elif s.deps == "last":
                resolved[s.name] = [self.steps[i - 1].name] if i else []
            elif s.deps == "all":
                resolved[s.name] = [p.name for p in self.steps[:i]]
            else:
                names = {p.name for p in self.steps}
                bad = [d for d in s.deps if d not in names]
                if bad:
                    raise ValueError(f"step {s.name}: unknown deps {bad}")
                resolved[s.name] = list(s.deps)
        return resolved

    def _marker(self, name: str) -> str:
        return os.path.join(self.marker_dir, f"{name}.done")

    def run(self, max_parallel: int = 4) -> dict[str, str]:
        """Execute; returns {step: 'done'|'skipped'}.  Raises on first step
        failure (after letting in-flight steps finish), leaving markers so a
        re-run resumes."""
        os.makedirs(self.marker_dir, exist_ok=True)
        deps = self._resolve_deps()
        status: dict[str, str] = {}
        done: set[str] = set()
        lock = threading.Lock()
        errors: list = []

        for s in self.steps:
            if os.path.exists(self._marker(s.name)):
                status[s.name] = "skipped"
                done.add(s.name)

        pending = [s for s in self.steps if s.name not in done]

        def run_step(s: Step) -> None:
            # parallelism is bounded by the pool's max_workers
            try:
                for d in s.tmp_dirs:
                    os.makedirs(d, exist_ok=True)
                s.fn()
                with open(self._marker(s.name), "w") as f:
                    f.write("ok")
                with lock:
                    done.add(s.name)
                    status[s.name] = "done"
            except Exception as e:
                with lock:
                    errors.append((s.name, e))

        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            futures = {}
            while len(done) < len(self.steps) and not errors:
                launched = False
                for s in pending:
                    if s.name in futures or s.name in done:
                        continue
                    if all(d in done for d in deps[s.name]):
                        futures[s.name] = pool.submit(run_step, s)
                        launched = True
                running = [f for n, f in futures.items() if n not in done]
                if running:
                    wait(running, return_when="FIRST_COMPLETED")
                elif not launched:
                    break
        if errors:
            name, e = errors[0]
            raise RuntimeError(f"workflow step {name!r} failed: {e}") from e
        unfinished = [s.name for s in self.steps if s.name not in done]
        if unfinished:
            raise RuntimeError(
                f"workflow steps never became runnable (dependency cycle or "
                f"dep on an impossible step): {unfinished}")
        return status
