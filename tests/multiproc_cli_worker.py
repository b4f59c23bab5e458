"""Worker for the 2-process CLI test (tests/test_multiprocess.py).

Unlike multiproc_worker.py (library-level step/eval/orbax), this drives the
ACTUAL CLIs — scripts/search.py then scripts/finetune.py — under a real
2-process jax.distributed cluster, the situation where a rank-divergent
branch in the CLI's host-side logic (best-checkpoint selection, plateau
tracking, compress bookkeeping) would silently corrupt a run
(reference utils.py:221-244 contract).

Both ranks are forced to write their own artifact dirs (is_main_process
patched to True) so the parent can assert the checkpoint BYTES are
rank-identical.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def _sha(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read())
    return h.hexdigest()


def dir_digests(d):
    """Tensor-part digests + path-normalized meta for a checkpoint dir.

    meta.json embeds the CLI args (incl. the per-rank output_dir used by
    this test), so string values containing the rank dir are dropped
    before comparison; every numeric field (acc1, epoch, ...) stays."""
    out = {}
    for fn in sorted(os.listdir(d)):
        p = os.path.join(d, fn)
        if fn.endswith(".msgpack"):
            out[fn] = _sha(p)
        elif fn == "meta.json":
            with open(p) as f:
                meta = json.load(f)

            def scrub(node):
                if isinstance(node, dict):
                    return {k: scrub(v) for k, v in node.items()}
                if isinstance(node, list):
                    return [scrub(v) for v in node]
                if isinstance(node, str) and "rank" in node:
                    return "<path>"
                return node
            out[fn] = scrub(meta)
    return out


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    outbase = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2

    # force per-rank artifact writes for the byte-compare (prod behavior is
    # process-0-only; here each rank writes its own dir)
    import ofb_tpu.core.checkpoint as ckpt_mod
    import ofb_tpu.utils.logging as olog
    olog.is_main_process = lambda: True
    ckpt_mod.is_main_process = lambda: True

    import scripts.finetune as ft
    import scripts.search as se

    out = os.path.join(outbase, f"rank{rank}")
    common = ["--data-set", "DIGITS", "--tiny-test", "--batch-size", "8",
              "--accum-iter", "1", "--num_workers", "0",
              "--compute-dtype", "float32", "--seed", "0"]
    recipe = ["--aa", "", "--reprob", "0", "--min-crop-scale", "0.55",
              "--no-hflip", "--smoothing", "0.0", "--blr", "2e-3",
              "--blr_decoder", "2e-3"]
    sargs = se.get_args_parser().parse_args(common + recipe + [
        "--epochs", "2", "--output_dir", out, "--target_flops", "0.0002",
        "--fuse_point", "3", "--warmup-epochs", "1"])
    se.main(sargs)

    ft_out = out + "_ft"
    ft_recipe = ["--mixup", "0", "--cutmix", "0", "--reprob", "0",
                 "--aa", "", "--blr", "4e-3", "--layer-decay", "1.0",
                 "--smoothing", "0.0", "--drop-path", "0.0",
                 "--min-crop-scale", "0.55", "--no-hflip"]
    fargs = ft.get_args_parser().parse_args(common + ft_recipe + [
        "--finetune", os.path.join(out, "best"), "--epochs", "2",
        "--output_dir", ft_out, "--warmup-epochs", "1"])
    ft.main(fargs)

    ckpt_mod.wait_for_pending_saves()
    digests = {
        "search_best": dir_digests(os.path.join(out, "best")),
        "search_running": dir_digests(os.path.join(out, "running_ckpt")),
        "ft_best": dir_digests(os.path.join(ft_out, "best")),
    }
    print("CLI_DIGEST " + json.dumps(digests), flush=True)


if __name__ == "__main__":
    main()
