"""Auto-resume wrapper (ofb_tpu/utils/resilience.py, SURVEY §5.3).

The wrapper must re-exec ONLY for transient relay/transport failures and
only when a resumable running_ckpt exists; NaN aborts (SystemExit), model
errors, exhausted budgets, and checkpoint-less runs all re-raise.
"""

import json
import os

import pytest

from ofb_tpu.utils import resilience


def _mk_running_ckpt(tmp_path):
    out = tmp_path / "run"
    rck = out / "running_ckpt"
    rck.mkdir(parents=True)
    (rck / "meta.json").write_text(json.dumps({"epoch": 3}))
    return str(out), str(rck)


class _Args:
    def __init__(self, output_dir, auto_resume=2):
        self.output_dir = output_dir
        self.auto_resume = auto_resume


def _relay_error():
    return RuntimeError(
        "INTERNAL: http://127.0.0.1:8103/remote_compile: read body: "
        "response body closed before all bytes were read")


def test_is_transient_markers():
    assert resilience.is_transient(_relay_error())
    assert resilience.is_transient(RuntimeError("backend UNAVAILABLE"))
    assert not resilience.is_transient(ValueError("bad shape (3, 4)"))
    assert not resilience.is_transient(KeyError("params"))


def test_is_transient_env_extension(monkeypatch):
    err = RuntimeError("flaky-custom-failure-xyz")
    assert not resilience.is_transient(err)
    monkeypatch.setenv("OFB_TRANSIENT_MARKERS", "weird, flaky-custom")
    assert resilience.is_transient(err)


def _capture_exec(monkeypatch):
    calls = {}

    def fake_execve(path, argv, env):
        calls["path"], calls["argv"], calls["env"] = path, argv, env
        raise SystemExit(0)  # exec never returns; simulate process swap

    monkeypatch.setattr(os, "execve", fake_execve)
    return calls


def test_reexecs_on_transient_with_ckpt(tmp_path, monkeypatch):
    out, rck = _mk_running_ckpt(tmp_path)
    calls = _capture_exec(monkeypatch)
    monkeypatch.delenv(resilience._ENV_LEFT, raising=False)

    def run(args):
        raise _relay_error()

    with pytest.raises(SystemExit):
        resilience.run_with_auto_resume(run, _Args(out, auto_resume=2))
    assert calls["argv"][-3:] == ["--resume", "--checkpoint", rck]
    assert calls["env"][resilience._ENV_LEFT] == "1"


def test_budget_carried_across_execs(tmp_path, monkeypatch):
    out, _ = _mk_running_ckpt(tmp_path)
    _capture_exec(monkeypatch)
    # simulates the re-exec'd process: env budget overrides args budget
    monkeypatch.setenv(resilience._ENV_LEFT, "0")

    def run(args):
        raise _relay_error()

    with pytest.raises(RuntimeError, match="remote_compile"):
        resilience.run_with_auto_resume(run, _Args(out, auto_resume=99))


def test_non_transient_reraises(tmp_path, monkeypatch):
    out, _ = _mk_running_ckpt(tmp_path)
    _capture_exec(monkeypatch)
    monkeypatch.delenv(resilience._ENV_LEFT, raising=False)

    with pytest.raises(ValueError):
        resilience.run_with_auto_resume(
            lambda a: (_ for _ in ()).throw(ValueError("bad")), _Args(out))


def test_no_ckpt_reexecs_fresh(tmp_path, monkeypatch):
    """Pre-checkpoint dead zone (VERDICT r4 #4): a transient failure
    during the FIRST compile re-execs WITHOUT --resume (fresh start) —
    the budget still applies, but the rung is not abandoned."""
    calls = _capture_exec(monkeypatch)
    monkeypatch.delenv(resilience._ENV_LEFT, raising=False)
    monkeypatch.setattr(
        resilience.sys, "argv",
        ["scripts/search.py", "--epochs", "3", "--output_dir", "x"])

    def run(args):
        raise _relay_error()

    with pytest.raises(SystemExit):
        resilience.run_with_auto_resume(
            run, _Args(str(tmp_path / "empty"), auto_resume=2))
    assert "--resume" not in calls["argv"]
    assert "--checkpoint" not in calls["argv"]
    assert calls["env"][resilience._ENV_LEFT] == "1"


def test_fresh_argv_strips_stale_resume_flags(monkeypatch):
    """A fresh re-exec after an earlier --resume exec must strip the
    stale flags — appending can't undo a store_true --resume."""
    monkeypatch.setattr(
        resilience.sys, "argv",
        ["scripts/search.py", "--epochs", "3",
         "--resume", "--checkpoint", "old/running_ckpt",
         "--output_dir", "x"])
    argv = resilience._fresh_argv()
    assert "--resume" not in argv and "--checkpoint" not in argv
    assert "old/running_ckpt" not in argv
    assert argv[1:] == ["scripts/search.py", "--epochs", "3",
                        "--output_dir", "x"]


def test_nan_abort_systemexit_passes_through(tmp_path, monkeypatch):
    """Engine NaN aborts use sys.exit(1); the wrapper must not retry."""
    out, _ = _mk_running_ckpt(tmp_path)
    calls = _capture_exec(monkeypatch)
    monkeypatch.delenv(resilience._ENV_LEFT, raising=False)

    def run(args):
        raise SystemExit(1)

    with pytest.raises(SystemExit) as ei:
        resilience.run_with_auto_resume(run, _Args(out))
    assert ei.value.code == 1
    assert "argv" not in calls  # no exec happened


def test_success_path_no_exec(tmp_path, monkeypatch):
    calls = _capture_exec(monkeypatch)
    resilience.run_with_auto_resume(lambda a: None, _Args(str(tmp_path)))
    assert "argv" not in calls
