"""Swin search CLI smoke: one tiny epoch through scripts/search_swin.py,
forced convergence, exported sliced subnet artifact."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_swin_search_cli_smoke(tmp_path):
    out = str(tmp_path / "swin")
    argv = ["search_swin.py", "--data-set", "SYNTHETIC", "--tiny-test",
            "--epochs", "1", "--batch-size", "64", "--accum-iter", "1",
            "--output_dir", out, "--compute-dtype", "float32",
            "--compress-thresh", "1.5", "--num_workers", "0",
            "--force-finish", "--export-finetune-epochs", "1",
            # exercises the device-cache feed path through the full CLI
            # (bit-identical to the host feed — tests/test_data_and_optim)
            "--cache-device"]
    code = (f"import sys; sys.argv = {argv!r}; "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; "
            "runpy.run_path('scripts/search_swin.py', run_name='__main__')")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "saved model_exported" in r.stdout
    assert "exported subnet acc1" in r.stdout
    assert "finetuned subnet acc1" in r.stdout
    meta = json.load(open(os.path.join(out, "model_exported", "meta.json")))
    assert meta["exported"] and meta["family"] == "swin"
    assert all(b["mlp_hidden"] > 0 for b in meta["blocks"])
    ft = json.load(open(os.path.join(out, "model_finetuned", "meta.json")))
    assert ft["exported"] and "acc1" in ft
