"""Frontier table generator (scripts/frontier.py): join, preference
order, and fallbacks."""

import json
import runpy
import sys


def _mk_root(tmp_path, name, rows, ladder=None):
    root = tmp_path / name
    root.mkdir()
    (root / "hard_eval.json").write_text(json.dumps(
        {"probe_cfg": {}, "rows": rows}))
    if ladder is not None:
        (root / "ladder.json").write_text(json.dumps(ladder))
    return root


def test_join_prefers_final_and_sorts(tmp_path, capsys):
    acc = {"/v/easy": 100.0, "/v/hard": 90.0}
    root = _mk_root(
        tmp_path, "r",
        rows=[
            {"name": "dense/best", "acc1": {**acc, "/v/hard": 95.0},
             "checkpoint": "x"},
            {"name": "dense/final", "acc1": {**acc, "/v/hard": 94.0},
             "checkpoint": "x"},
            {"name": "t0.25/final", "acc1": acc, "checkpoint": "x"},
        ],
        ladder=[{"name": "dense", "gflops": 4.6, "params": 22_000_000},
                {"name": "t0.25", "gflops": 0.8, "params": 3_800_000}])
    out = tmp_path / "frontier.json"
    argv = sys.argv
    try:
        sys.argv = ["frontier.py", "--spec", f"lad={root}",
                    "--out", str(out)]
        runpy.run_path("scripts/frontier.py", run_name="__main__")
    finally:
        sys.argv = argv
    rows = json.loads(out.read_text())
    assert [r["label"] for r in rows] == ["lad/dense", "lad/t0.25"]
    # 'final' outranks 'best' for the vit family
    assert rows[0]["kind"] == "final"
    assert rows[0]["acc1"]["/v/hard"] == 94.0
    table = capsys.readouterr().out
    assert "lad/dense" in table and "22.00M" in table


def test_swin_family_prefers_ft(tmp_path, capsys):
    acc = {"/v/hard": 80.0}
    root = _mk_root(
        tmp_path, "s",
        rows=[
            {"name": "t0.45/exported", "acc1": acc, "checkpoint": "x"},
            {"name": "t0.45/ft", "acc1": {"/v/hard": 85.0},
             "checkpoint": "x"},
        ])
    argv = sys.argv
    try:
        sys.argv = ["frontier.py", "--spec", f"swin={root}:swin"]
        runpy.run_path("scripts/frontier.py", run_name="__main__")
    finally:
        sys.argv = argv
    table = capsys.readouterr().out
    assert "swin/t0.45" in table and "85.0" in table
