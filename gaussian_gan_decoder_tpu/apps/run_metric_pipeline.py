"""Batch metric runner.

Equivalent of /root/reference/eg3d/run_metric_pipeline.py:17-28, which
subprocess-runs calc_metrics.py over a hardcoded config list. Here the
batch comes from a JSON file (a list of argv lists for
apps/calc_metrics), each entry run in its own subprocess so one run's
device memory / compilation state cannot leak into the next — the same
isolation the reference gets from its subprocess.run loop.

  batch.json: [["--checkpoint", "a.ckpt", "--metrics", "fid50k_full"],
               ["--network_pkl", "g.pkl", "--metrics", "kid50k,is50k"]]

  python -m gaussian_gan_decoder_tpu.apps.run_metric_pipeline \
      --batch batch.json [--dry_run]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", required=True,
                   help="JSON file: list of calc_metrics argv lists")
    p.add_argument("--dry_run", action="store_true",
                   help="print the commands without running them")
    p.add_argument("--stop_on_error", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    with open(args.batch) as f:
        batch = json.load(f)
    assert isinstance(batch, list), "batch JSON must be a list of argv lists"
    results = []
    for i, item_args in enumerate(batch):
        cmd = [sys.executable, "-m",
               "gaussian_gan_decoder_tpu.apps.calc_metrics", *map(str, item_args)]
        print(f"[{i + 1}/{len(batch)}] {' '.join(cmd)}", flush=True)
        if args.dry_run:
            results.append({"args": item_args, "returncode": None})
            continue
        r = subprocess.run(cmd)
        results.append({"args": item_args, "returncode": r.returncode})
        if r.returncode != 0 and args.stop_on_error:
            break
    print(json.dumps({"runs": results}))
    return results


if __name__ == "__main__":
    rs = main()
    sys.exit(0 if all(r["returncode"] in (0, None) for r in rs) else 1)
