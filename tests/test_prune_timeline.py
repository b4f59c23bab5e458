"""Prune-event timeline parser (scripts/prune_timeline.py).

The parser turns search-CLI stdout into the organic-kill evidence table;
it must attribute events to fractional epochs, carry the (converged)
marker, and deduplicate events replayed across a crash+resume overlap
(runs/organic_a8: search1 died at epoch 30, search2 replayed its tail
with identical decisions — the real logs contained 4 such replays).
"""

import json
import runpy
import sys

LOG1 = """\
Epoch [19] [40/78] loss_param: 1.0 (1.0)
Start Compression
  block7.mlp: prune event
Epoch [19] [50/78] loss_param: 1.0 (1.0)
Epoch [20] [20/78] loss_param: 1.0 (1.0)
Start Compression
  block7.mlp: prune event (converged)
  embed: prune event
Traceback (most recent call last):
jax.errors.JaxRuntimeError: INTERNAL: remote_compile: read body
"""

# resume replays epoch 20's events identically, then continues
LOG2 = """\
Epoch [20] [20/78] loss_param: 1.0 (1.0)
Start Compression
  block7.mlp: prune event (converged)
  embed: prune event
Epoch [21] [10/78] loss_param: 1.0 (1.0)
Start Compression
  embed: prune event (converged)
"""

LOGTXT = "\n".join(
    json.dumps({"epoch": e, "train_searched_gflops": 2.0 - e * 0.01})
    for e in (19, 20, 21))


def _run(tmp_path, extra=()):
    l1 = tmp_path / "search1.log"
    l2 = tmp_path / "search2.log"
    lt = tmp_path / "log.txt"
    out = tmp_path / "timeline.json"
    l1.write_text(LOG1)
    l2.write_text(LOG2)
    lt.write_text(LOGTXT)
    argv = sys.argv
    try:
        sys.argv = ["prune_timeline.py", str(l1), str(l2),
                    "--log-txt", str(lt), "--json-out", str(out),
                    *extra]
        try:
            runpy.run_path("scripts/prune_timeline.py", run_name="__main__")
        except SystemExit as e:  # parser exits 0 on no events
            assert e.code in (0, None)
    finally:
        sys.argv = argv
    return json.loads(out.read_text()) if out.exists() else None


def test_dedups_resume_replay(tmp_path):
    r = _run(tmp_path)
    s = r["summary"]
    # 6 raw events, 2 replayed (block7.mlp converged + embed @ e20.26)
    assert s["n_events"] == 4
    assert s["n_converged"] == 2
    assert s["first_event_epoch"] == 19.51
    assert s["modules"] == ["block7.mlp", "embed"]


def test_events_sorted_and_annotated(tmp_path):
    r = _run(tmp_path)
    ev = r["events"]
    fracs = [e["frac_epoch"] for e in ev]
    assert fracs == sorted(fracs)
    first = ev[0]
    assert first["module"] == "block7.mlp" and not first["converged"]
    assert first["epoch"] == 19
    assert first["searched_gflops"] == round(2.0 - 19 * 0.01, 4)
    last = ev[-1]
    assert last["module"] == "embed" and last["converged"]


def test_no_dedup_keeps_replays(tmp_path):
    r = _run(tmp_path, extra=("--no-dedup",))
    assert r["summary"]["n_events"] == 6
