"""Tabulate the TPU measurement backlog's outputs (artifacts/r3_backlog).

Each backlog step writes JSON lines (bench.py, bench_render_sweep,
bench_train_step) or CSV trajectories (train A/Bs); this collects them into
one readable summary for RESULTS.md integration.

Usage: python tools/summarize_backlog.py [dir]
"""

from __future__ import annotations

import json
import os
import sys


def json_lines(path):
    out = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out.append(json.loads(line))
                    except ValueError:
                        pass
    except OSError:
        pass
    return out


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "r3_backlog")
    if not os.path.isdir(d):
        print(f"no backlog dir at {d}")
        return

    print(f"== backlog summary: {d} ==")
    prog = os.path.join(d, "progress.log")
    if os.path.exists(prog):
        with open(prog) as f:
            lines = f.read().strip().splitlines()
        print(f"progress: {len(lines)} steps, last: {lines[-1]}")

    for name in sorted(os.listdir(d)):
        path = os.path.join(d, name)
        if name.endswith(".json"):
            # whole-file JSON (viewer fps traces, hw_equality comparison)
            try:
                obj = json.load(open(path))
                print(f"\n-- {name} --")
                print("  " + json.dumps(obj))
                continue
            except ValueError:
                pass
        if name.endswith((".json", ".log", ".err")):
            rows = json_lines(path)
            if rows:
                print(f"\n-- {name} --")
                for r in rows:
                    print("  " + json.dumps(r))
        if name.endswith("_scores.csv"):
            with open(path) as f:
                csv_lines = f.read().strip().splitlines()
            if len(csv_lines) > 1:
                print(f"\n-- {name} --")
                print("  " + csv_lines[0])
                print("  " + csv_lines[-1])


if __name__ == "__main__":
    main()
