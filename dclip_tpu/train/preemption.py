"""Graceful preemption handling for TPU-VM training.

Cloud TPU maintenance events and spot reclaims deliver SIGTERM with a
short grace window. The reference's only interruption story is the
KeyboardInterrupt handler around its epoch loop
(train_contrastive_teacher.py:404-420) — a SIGTERM there kills the
process mid-step and loses everything since the last per-epoch save.

`PreemptionGuard` converts the signal into a cooperative stop: the
handler only sets a flag; the trainer checks it at step boundaries and
raises `Preempted`, which `BaseTrainer.fit` turns into a tagged
"preempt" checkpoint (atomic write, newest weights preserved) before
unwinding. The CLIs catch `Preempted` and exit cleanly so supervisors
treat it as a graceful shutdown; a later run with `--resume` restarts
from the last epoch checkpoint as usual.

Multihost: each process gets its own signal, but a process that stops
unilaterally would hang the others inside the next collective. Under
`jax.process_count() > 1` the guard therefore only honors the flag at
agreement points: every `sync_every` steps all processes all-gather
their local flags and stop together iff ANY process saw the signal.
The agreement is a [P] bool gather — microseconds on ICI/DCN — but it
is also a host sync point, so it runs every `sync_every` steps (not
every step) to keep JAX's async dispatch pipeline full between points.
"""
from __future__ import annotations

import signal
from typing import Callable, Optional, Sequence

import numpy as np


class Preempted(RuntimeError):
    """Raised at a step boundary after a preemption signal arrived."""


class PreemptionGuard:
    """Context manager: installs cooperative SIGTERM handling around fit().

    Previous handlers are chained (called after the flag is set) and
    restored on exit, so embedding applications keep their own behavior.
    """

    def __init__(
        self,
        signals: Sequence[int] = (signal.SIGTERM,),
        sync_every: int = 16,
        _allgather: Optional[Callable[[bool], Sequence[bool]]] = None,
        _process_count: Optional[int] = None,
    ):
        self.signals = tuple(signals)
        self.sync_every = max(int(sync_every), 1)
        self._flag = False
        self._agreed = False
        self._prev: dict = {}
        self._installed = False
        self._allgather = _allgather
        self._process_count = _process_count

    # -- signal plumbing -----------------------------------------------------

    def _handler(self, signum, frame):
        self._flag = True
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def __enter__(self) -> "PreemptionGuard":
        for s in self.signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                # Not the main thread (e.g. a test runner worker): stay a
                # no-op guard rather than refusing to train.
                self._prev.pop(s, None)
        self._installed = True
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev if prev is not None else signal.SIG_DFL)
        self._prev.clear()
        self._installed = False

    # -- queries ---------------------------------------------------------------

    @property
    def requested(self) -> bool:
        """This process saw a signal (no cross-process agreement)."""
        return self._flag

    def _processes(self) -> int:
        if self._process_count is not None:
            return self._process_count
        import jax

        return jax.process_count()

    def _gather(self, flag: bool) -> Sequence[bool]:
        if self._allgather is not None:
            return self._allgather(flag)
        from jax.experimental import multihost_utils

        return [
            bool(x)
            for x in np.asarray(
                multihost_utils.process_allgather(np.asarray(flag))
            ).ravel()
        ]

    def should_stop(self, step: int) -> bool:
        """Check at a step boundary; `step` is the 0-based step index.

        Single-process: the local flag, checked every step (free).
        Multi-process: sticky agreement evaluated at steps where
        `step % sync_every == 0` — all processes reach the same
        all-gather in the same order, so they stop in lockstep.
        """
        if self._agreed:
            return True
        if self._processes() <= 1:
            return self._flag
        if step % self.sync_every == 0:
            self._agreed = any(self._gather(self._flag))
        return self._agreed
