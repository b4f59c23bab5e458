"""Real 2-process jax.distributed tests (SURVEY §5.2; round-1 VERDICT
weak #2 replaced the same-process tautology with this).

Spawns two worker processes joined via a Gloo-backed coordination service,
runs ONE sharded search step over the 2-process global mesh with
DIFFERENT per-host batch halves, compresses host-side on each replica,
and evaluates over a rank-sharded val feed. Asserts:

  * both ranks print bitwise-identical compress-decision digests;
  * both report identical FULL-val-set eval stats;
  * those equal a single-process run of the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(args, timeout=600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    return subprocess.Popen([sys.executable, WORKER, *map(str, args)],
                            env=env, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _last_json(out):
    for line in reversed(out.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise AssertionError(f"no JSON line in: {out[-1500:]}")


def test_two_process_consensus_and_full_set_eval(tmp_path):
    port = _free_port()
    ckdir = str(tmp_path / "mh_orbax")
    p0 = _run([0, port, ckdir])
    p1 = _run([1, port, ckdir])
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=600)
    assert p0.returncode == 0, err0[-2000:]
    assert p1.returncode == 0, err1[-2000:]
    r0, r1 = _last_json(out0), _last_json(out1)

    # identical prune decisions on every host, no collective needed
    assert r0["digest"] == r1["digest"]
    # multi-host orbax checkpoint: both processes participated, both
    # restored identical bytes, meta written by process 0 only
    assert r0["ckpt_digest"] is not None
    assert r0["ckpt_digest"] == r1["ckpt_digest"]
    assert os.path.exists(os.path.join(ckdir, "meta.json"))
    # every host reports the same full-set eval stats
    assert r0["acc1"] == r1["acc1"] and r0["acc5"] == r1["acc5"]
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)

    # and they match a single-process run of the same global batch
    ps = _run(["single"])
    outs, errs = ps.communicate(timeout=600)
    assert ps.returncode == 0, errs[-2000:]
    rs = _last_json(outs)
    assert rs["digest"] == r0["digest"]
    assert rs["acc1"] == r0["acc1"] and rs["acc5"] == r0["acc5"]
    np.testing.assert_allclose(rs["loss"], r0["loss"], rtol=1e-5)


def test_two_process_cli_search_and_finetune(tmp_path):
    """The ACTUAL CLIs (scripts/search.py 2 epochs -> scripts/finetune.py)
    under 2 jax.distributed processes: rank-identical compress logs and
    byte-identical best/running/finetune checkpoints (each rank forced to
    write its own artifact dir). Catches any rank-divergent host-side
    branch in the CLI loop (VERDICT r2 weak #4; reference
    utils.py:221-244)."""
    worker = os.path.join(REPO, "tests", "multiproc_cli_worker.py")
    port = _free_port()
    outbase = str(tmp_path / "cli")

    def run(rank):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_PLATFORMS"] = "cpu"
        return subprocess.Popen(
            [sys.executable, worker, str(rank), str(port), outbase],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)

    p0, p1 = run(0), run(1)
    out0, err0 = p0.communicate(timeout=900)
    out1, err1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, (err0[-3000:], out0[-1000:])
    assert p1.returncode == 0, (err1[-3000:], out1[-1000:])

    # rank-identical compress decision logs
    def compress_lines(out):
        return [ln for ln in out.splitlines()
                if "prune" in ln or "Compression" in ln]
    assert compress_lines(out0) == compress_lines(out1)

    # byte-identical artifacts (tensor parts) + identical scrubbed meta
    def digests(out):
        for ln in out.splitlines():
            if ln.startswith("CLI_DIGEST "):
                return json.loads(ln[len("CLI_DIGEST "):])
        raise AssertionError(f"no CLI_DIGEST line: {out[-1500:]}")
    d0, d1 = digests(out0), digests(out1)
    assert d0 == d1
    for part in ("search_best", "search_running", "ft_best"):
        assert any(k.endswith(".msgpack") for k in d0[part]), \
            f"{part} has no tensor parts: {sorted(d0[part])}"
