"""Transient-failure auto-resume for the long-running CLIs (SURVEY §5.3).

The TPU relay this machine trains through can drop mid-run — observed at
epoch 30 of a 100-epoch search (runs/organic_a8/search1.log):

    JaxRuntimeError: INTERNAL: http://127.0.0.1:8103/remote_compile:
    read body: response body closed before all bytes were read

Checkpoint/resume replays prune decisions deterministically (BENCH.md
"Organic kills at DeiT-S scale": identical event order across the crash),
so the right reaction to a *transient infrastructure* error is to restart
from ``<output_dir>/running_ckpt``. The restart is a fresh ``exec`` of
the same command line rather than an in-process retry: the wedged relay
client state dies with the process image, and every piece of jit cache /
device state is rebuilt from the checkpoint exactly as a manual re-launch
would (which is what the reference's run_exp.sh stages rely on a human
to do — reference engine.py has no failure handling of its own).

Never retried:
  * NaN aborts — the engine exits via ``sys.exit(1)`` (SystemExit).
  * model/user errors — anything not matching the transient markers.
  * multi-host runs — one host re-execing while peers continue would
    desync the collectives; restart policy belongs to the job scheduler
    there (process_count() > 1 re-raises).
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Sequence

# Substrings that mark an error as transient relay/transport trouble.
# Extendable without a code change via OFB_TRANSIENT_MARKERS (comma-sep).
_DEFAULT_MARKERS: Sequence[str] = (
    "remote_compile",
    "read body",
    "response body closed",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Broken pipe",
    "connection closed",
    "Failed to connect",
    "Socket closed",
)

_ENV_LEFT = "OFB_AUTO_RESUME_LEFT"


def transient_markers() -> Sequence[str]:
    extra = os.environ.get("OFB_TRANSIENT_MARKERS", "")
    if extra:
        return tuple(_DEFAULT_MARKERS) + tuple(
            m for m in (s.strip() for s in extra.split(",")) if m)
    return _DEFAULT_MARKERS


def is_transient(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}"
    return any(m in text for m in transient_markers())


def _resume_argv(checkpoint: str) -> list:
    # Appending wins with argparse (last occurrence of an option is
    # kept), so no need to strip earlier --resume/--checkpoint flags.
    return [sys.executable] + sys.argv + ["--resume",
                                          "--checkpoint", checkpoint]


def _fresh_argv() -> list:
    """argv for a from-scratch re-exec: any --resume/--checkpoint left by
    an earlier auto-resume exec must be STRIPPED (appending can't undo a
    store_true flag)."""
    argv, skip = [], False
    for a in sys.argv:
        if skip:
            skip = False
            continue
        if a == "--resume" or a.startswith("--resume="):
            continue
        if a == "--checkpoint":
            skip = True
            continue
        if a.startswith("--checkpoint="):
            continue
        argv.append(a)
    return [sys.executable] + argv


def run_with_auto_resume(run: Callable, args) -> None:
    """Run ``run(args)``; on a transient relay error, re-exec this CLI
    with ``--resume --checkpoint <output_dir>/running_ckpt``.

    Budgeted by ``args.auto_resume`` (attempts remaining carried across
    execs in ``OFB_AUTO_RESUME_LEFT`` so a flapping relay cannot restart
    forever).
    """
    left = int(os.environ.get(_ENV_LEFT,
                              str(getattr(args, "auto_resume", 0))))
    try:
        run(args)
        return
    except Exception as exc:  # noqa: BLE001 — filtered below
        if left <= 0 or not is_transient(exc):
            raise
        try:
            import jax
            multi_host = jax.process_count() > 1
        except Exception:  # pragma: no cover — jax failed before init
            multi_host = False
        if multi_host:
            raise
        out = getattr(args, "output_dir", "") or ""
        rck = os.path.join(out, "running_ckpt")
        if os.path.exists(os.path.join(rck, "meta.json")):
            argv = _resume_argv(rck)
            how = f"--resume --checkpoint {rck}"
        else:
            # Pre-checkpoint dead zone (VERDICT r4 #4): a relay failure
            # during the FIRST compile has no checkpoint to resume from.
            # Losing zero completed epochs, a fresh start IS the resume.
            argv = _fresh_argv()
            how = "a fresh start (no running_ckpt yet)"
        print(f"[auto-resume] transient failure "
              f"({type(exc).__name__}: {str(exc).splitlines()[0][:200]}); "
              f"re-exec with {how} "
              f"({left - 1} attempts left)", flush=True)
        os.environ[_ENV_LEFT] = str(left - 1)
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable, argv, dict(os.environ))
