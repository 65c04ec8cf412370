"""Format a comparison.json into a LaTeX table - twin of
tools/format_scores_to_latex.py."""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(prog="format_scores_to_latex",
                                allow_abbrev=False)
    p.add_argument("--input", default="comparison.json")
    p.add_argument("--passes", nargs="*",
                   default=["diffuse", "specular", "render"])
    p.add_argument("--metric", default="psnr")
    args = p.parse_args(argv)

    with open(args.input) as f:
        table = json.load(f)

    cols = " & ".join(args.passes)
    lines = [
        "\\begin{tabular}{l" + "c" * len(args.passes) + "c}",
        f"method & {cols} & FPS \\\\",
        "\\hline",
    ]
    for name, data in table.items():
        vals = []
        for rp in args.passes:
            v = data.get("metrics", {}).get(rp, {}).get(args.metric)
            vals.append(f"{v:.2f}" if v is not None else "-")
        fps = data.get("fps")
        fps_s = f"{fps:.1f}" if fps is not None else "-"
        lines.append(f"{name} & " + " & ".join(vals) + f" & {fps_s} \\\\")
    lines.append("\\end{tabular}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
