"""Cross-method benchmark table production - twin of tools/run_comparison.py.

Aggregates metrics.json + fps.json from multiple method output dirs into one
comparison table (the reference compares vs 3dgs/2dgs/gaussian_shader/
3dgs_dr/ref_gaussian/envgs)."""

from __future__ import annotations

import argparse
import json
import os


def collect(model_path):
    out = {}
    mp = os.path.join(model_path, "metrics.json")
    if os.path.exists(mp):
        with open(mp) as f:
            out["metrics"] = json.load(f)
    fp = os.path.join(model_path, "fps.json")
    if os.path.exists(fp):
        with open(fp) as f:
            out["fps"] = float(f.read().strip())
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="run_comparison", allow_abbrev=False)
    p.add_argument("--methods", nargs="+", required=True,
                   help="name=path pairs")
    p.add_argument("--out", default="comparison.json")
    args = p.parse_args(argv)

    table = {}
    for spec in args.methods:
        name, path = spec.split("=", 1)
        table[name] = collect(path)

    print(json.dumps(table, indent=2))
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
