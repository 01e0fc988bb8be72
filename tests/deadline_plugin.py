"""Per-test deadline watchdog (pytest plugin).

A wedged TPU compile through the tunnel blocks inside an extension call
and ignores signals, so one hung test could otherwise eat the whole
pytest invocation with zero tests reported (observed in round 3: a
fast-tier run externally killed at 9.6 min during a tunnel-degradation
window). This plugin arms a daemon timer per test; past the deadline it
prints the offending nodeid plus every thread's stack and hard-exits the
process — failing loudly is the only option left when the main thread is
stuck in an uninterruptible C call (SIGALRM-style in-band timeouts never
fire there).

Deadline: ``DCLIP_TEST_DEADLINE`` seconds per test (default 300; 0
disables). The default is generous on purpose — tunnel degradation
windows of several minutes are environmental, not bugs (docs/STATUS.md
"Operational notes") — while still bounding a truly wedged compile to one
test's budget instead of the caller's patience.

Wired into tests/conftest.py by hook import; standalone so the injection
test (tests/test_watchdog.py) can load it with ``-p deadline_plugin``
into a bare subprocess pytest without dragging in the jax-heavy conftest.
"""
from __future__ import annotations

import faulthandler
import os
import sys
import threading

import pytest

EXIT_CODE = 2


def _deadline() -> float:
    return float(os.environ.get("DCLIP_TEST_DEADLINE", "300"))


def _expire(item, deadline: float) -> None:
    nodeid = item.nodeid
    # pytest's fd-level capture would swallow the diagnostic (and os._exit
    # discards capture buffers); restore the real stderr first.
    try:
        capman = item.config.pluginmanager.get_plugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
    except Exception:
        pass
    sys.stderr.write(
        f"\n[deadline_plugin] test exceeded DCLIP_TEST_DEADLINE="
        f"{deadline:.0f}s: {nodeid}\n"
        "thread stacks follow; exiting hard (a wedged compile cannot be "
        "interrupted in-band)\n"
    )
    faulthandler.dump_traceback(file=sys.stderr)
    sys.stderr.flush()
    os._exit(EXIT_CODE)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    deadline = _deadline()
    # Known-heavy tests (full CLI pipeline drives on a 1-core host) carry
    # an explicit @pytest.mark.deadline(seconds) override; scaled by the
    # same env knob so a degraded-tunnel session can stretch everything.
    marker = item.get_closest_marker("deadline")
    if marker is not None and deadline > 0:
        deadline = float(marker.args[0]) * (deadline / 300.0)
    if deadline <= 0:
        yield
        return
    timer = threading.Timer(deadline, _expire, args=(item, deadline))
    timer.daemon = True
    timer.start()
    try:
        yield
    finally:
        timer.cancel()
