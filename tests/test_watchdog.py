"""Forced-hang injection for the per-test deadline watchdog.

VERDICT r3 "What's weak" #3: one wedged compile could eat a whole pytest
invocation. tests/deadline_plugin.py bounds every test to
DCLIP_TEST_DEADLINE seconds; these tests prove the timeout path actually
fires (hung test -> loud hard exit naming the test) and that healthy
tests pass untouched. The inner pytest runs a bare tmp file with only the
plugin loaded — no jax import, no TPU client, so it never contends for
the tunneled device lock.
"""
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # spawns subprocess pytests

_PLUGIN_DIR = os.path.dirname(os.path.abspath(__file__))


def _run_inner(test_file, deadline: str):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "DCLIP_TEST_DEADLINE")
    }
    env.update(
        {"PYTHONPATH": _PLUGIN_DIR, "DCLIP_TEST_DEADLINE": deadline}
    )
    return subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q",
            "-p", "deadline_plugin", "-p", "no:cacheprovider",
            str(test_file),
        ],
        env=env, capture_output=True, text=True, timeout=120,
    )


def test_deadline_kills_hung_test(tmp_path):
    f = tmp_path / "test_hang.py"
    f.write_text(
        textwrap.dedent(
            """
            import time

            def test_wedged():
                time.sleep(90)  # stands in for a hung remote compile
            """
        )
    )
    r = _run_inner(f, deadline="2")
    from deadline_plugin import EXIT_CODE

    assert r.returncode == EXIT_CODE, (r.returncode, r.stdout, r.stderr)
    assert "DCLIP_TEST_DEADLINE" in r.stderr
    assert "test_wedged" in r.stderr  # the culprit is named
    assert "Thread" in r.stderr or "File" in r.stderr  # stacks dumped


def test_deadline_leaves_healthy_tests_alone(tmp_path):
    f = tmp_path / "test_ok.py"
    f.write_text(
        textwrap.dedent(
            """
            def test_quick():
                assert 1 + 1 == 2
            """
        )
    )
    r = _run_inner(f, deadline="60")
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "1 passed" in r.stdout


def test_deadline_marker_extends_budget(tmp_path):
    """@pytest.mark.deadline(N) stretches the watchdog for known-heavy
    tests (scaled by DCLIP_TEST_DEADLINE/300 so env tuning still applies):
    a 3s test under a 2s env deadline survives with a deadline(600)
    marker (600 * 2/300 = 4s effective)."""
    f = tmp_path / "test_marked.py"
    f.write_text(
        textwrap.dedent(
            """
            import time

            import pytest

            @pytest.mark.deadline(600)
            def test_heavy_but_legit():
                time.sleep(3)
            """
        )
    )
    r = _run_inner(f, deadline="2")
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "1 passed" in r.stdout


def test_deadline_zero_disables(tmp_path):
    f = tmp_path / "test_ok2.py"
    f.write_text("def test_quick():\n    assert True\n")
    r = _run_inner(f, deadline="0")
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
