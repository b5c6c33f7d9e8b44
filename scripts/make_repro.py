"""Regenerate BENCH/REPRO.md from two full bench JSON files.

Usage: python scripts/make_repro.py rep1.json rep2.json [note...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rep1 = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    rep2 = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])
    extra_note = " ".join(sys.argv[3:])
    q1, q2 = rep1["queries"], rep2["queries"]
    names = [n for n in q1 if n in q2] + [n for n in q2 if n not in q1]
    agree = sum(
        1
        for n in names
        if n in q1 and n in q2
        and (abs(q1[n] - q2[n]) <= 0.25 * max(q1[n], q2[n]) or abs(q1[n] - q2[n]) <= 0.6)
    )
    lines = [
        "# BENCH reproducibility — two independent full runs (sf0.1, local[32])",
        "",
        "Each rep is a fresh `python bench.py` (fresh JVM) with the default",
        "warm protocol (1 discarded warm-up + min-of-2 timed runs per query;",
        "sub-3s queries get two extra reps).",
        "",
        f"Headline pip_join throughput: rep1 {rep1['value']:,.0f} pages/s, "
        f"rep2 {rep2['value']:,.0f} pages/s "
        f"({rep1['n_pages']:,} pages @ sf{rep1['sf']}; min-of-reps "
        f"{min(q1['pip_join'], q2['pip_join']):.2f} s).",
        "",
        f"Agreement: {agree}/{len(names)} queries reproduce within 25% or 0.6 s",
        "(the sub-second band is timer/JIT noise-dominated); larger gaps are",
        "the host's documented all-core kernel-storm noise — BASELINE.md",
        "carries the /proc/stat evidence.  The honest per-query number on",
        "this hardware is the MIN across reps.",
    ]
    if extra_note:
        lines += ["", extra_note]
    lines += ["", "| query | rep1 s | rep2 s | min s |", "|---|---|---|---|"]
    for n in names:
        a = f"{q1[n]:.2f}" if n in q1 else "—"
        b = f"{q2[n]:.2f}" if n in q2 else "—"
        m = min(v for v in (q1.get(n), q2.get(n)) if v is not None)
        lines.append(f"| {n} | {a} | {b} | {m:.2f} |")
    out = os.path.join(REPO, "BENCH", "REPRO.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} queries, agreement {agree}")


if __name__ == "__main__":
    main()
