"""bench.py driver contract: ONE parseable JSON line, even on total failure."""

import importlib.util
import io
import json
import os
import contextlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_supervisor_emits_error_json_when_all_attempts_fail(monkeypatch):
    """A wedged TPU tunnel (observed: device-init futex hang) must still
    produce one JSON line with the driver's schema, value 0, and an error
    marker — never an empty stdout."""
    bench = _load_bench()

    class DeadProc:
        returncode = 1

        def communicate(self, timeout=None):
            return ("", "")

        def kill(self):
            pass

        def wait(self):
            pass

    import subprocess

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: DeadProc())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench._run_supervised()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    assert rc == 1 and len(lines) == 1
    d = json.loads(lines[0])
    assert d["metric"] == "pigan_train_steps_per_sec"
    assert d["value"] == 0.0 and d["vs_baseline"] == 0.0 and "error" in d


def test_supervisor_passes_through_good_run(monkeypatch):
    bench = _load_bench()
    good = json.dumps({"metric": "pigan_train_steps_per_sec", "value": 5.0,
                       "unit": "steps/s", "vs_baseline": 2.5})

    class GoodProc:
        returncode = 0

        def communicate(self, timeout=None):
            return (good + "\n", "")

    import subprocess

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: GoodProc())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench._run_supervised()
    assert rc == 0
    assert json.loads(buf.getvalue().strip())["value"] == 5.0
