"""STATUS.json manifests (scripts/run_status.py): stage detection and
resume pointers from checkpoint metas + JSON-line logs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def test_run_status_stages(tmp_path):
    root = tmp_path / "ladder"
    # rung A: search stage 1 in flight (epoch 12 of 100, fuse 50)
    _write(str(root / "t0.25/running_ckpt/meta.json"),
           {"epoch": 12, "finish_search": False,
            "args": {"epochs": 100, "fuse_point": 50, "target_flops": 1.15}})
    with open(str(root / "t0.25/log.txt"), "w") as f:
        f.write(json.dumps({"epoch": 12, "n_gflops": 2.0}) + "\n")
    # rung B: finetune in flight
    _write(str(root / "t0.45/running_ckpt/meta.json"),
           {"epoch": 99, "finish_search": False,
            "args": {"epochs": 100, "fuse_point": 100, "target_flops": 2.07}})
    _write(str(root / "t0.45/ft/running_ckpt/meta.json"), {"epoch": 30})
    _write(str(root / "t0.45/ft/best/meta.json"), {"epoch": 28, "acc1": 91.0})
    # dense comparator present
    _write(str(root / "dense_ft/best/meta.json"), {"epoch": 50, "acc1": 95.0})

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_status.py"),
         "--root", str(root)], capture_output=True, text=True, check=True)
    assert out.returncode == 0

    a = json.load(open(str(root / "t0.25/STATUS.json")))
    assert a["stage"] == "search1"
    assert a["search_epoch"] == 12 and not a["search_done"]
    assert a["resumable_from"].endswith("t0.25/running_ckpt")
    assert a["searched_gflops"] == 2.0

    b = json.load(open(str(root / "t0.45/STATUS.json")))
    assert b["stage"] == "finetune"
    assert b["search_done"] and b["ft_epoch"] == 30
    assert b["ft_best_acc1"] == 91.0
    assert b["resumable_from"].endswith("t0.45/ft/running_ckpt")

    top = json.load(open(str(root / "STATUS.json")))
    assert len(top["rungs"]) == 3          # two rungs + dense
    assert top["rungs"][-1]["ft_best_acc1"] == 95.0
    assert not top["hard_eval"] and not top["summary"]
