"""Scaling-efficiency evidence: same job, two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency >= 0.8
going from N to 4N executors.  No real cluster exists in this sandbox, so
(per the driver's instruction) the SAME flagship job runs at local[8] and
local[32] on identical input and we report throughput at both plus
efficiency = (T_8 / T_32) / 4.

Methodology (why it looks the way it does):

* Input is a MATERIALIZED parquet table of sf0.1 pages replicated
  SPARK_GRAFT_SCALE x (default 2048 -> 935,651,328 rows, ~9 GB) — the
  lake-table model: both levels read the same files and scan parallelism
  follows cores.  Runtime at local[8] is ~20 s, so per-job constants
  (<0.5 s) are noise.
* The sandbox host throws multi-second all-core kernel-time storms
  (hypervisor jitter; also self-inflicted before the -Xms fix in
  bench.py).  Single sessions are therefore unreliable in BOTH
  directions.  Each level runs in SPARK_GRAFT_SESSIONS fresh JVMs
  (default 3), INTERLEAVED (8, 32, 8, 32, ...) so slow host phases hit
  both levels equally, with WARM in-session repeats; the reported number
  is the min across all samples of a level — steady-state capability.
* All raw samples are written to BENCH/BASELINE.md for transparency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.environ.get("SPARK_GRAFT_SCALING_QUERIES", "pip_join")
SCALE = os.environ.get("SPARK_GRAFT_SCALE", "2048")
SESSIONS = int(os.environ.get("SPARK_GRAFT_SESSIONS", "4"))
LEVELS = (8, 32)
PAGES_PARQUET = f"/tmp/ssb_sgis_scaled_pages_x{SCALE}.parquet"


def materialize_pages() -> None:
    """Write the scaled page table to parquet ONCE (the lake-table model:
    both levels read the same files; scan parallelism follows cores)."""
    if os.path.isdir(PAGES_PARQUET):
        return
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "24g")
  .config("spark.driver.extraJavaOptions", "-Xms24g -XX:+AlwaysPreTouch")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ssb_sgis_spark.sources.pages import pages_df
df = pages_df(spark, "/root/testdata/sf0.1")
base = df.repartition(64)
out = (base.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({SCALE} - 1))))
  .withColumn("uid", F.col("uid") * {SCALE} + F.col("_k"))
  .withColumn("x", F.col("x") + F.col("_k") * 0.0001)
  .drop("_k"))
out.write.mode("overwrite").parquet({PAGES_PARQUET!r})
print("rows", spark.read.parquet({PAGES_PARQUET!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def run_level(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_QUERIES=QUERIES,
        SPARK_GRAFT_PAGES_PARQUET=PAGES_PARQUET,
        SPARK_GRAFT_WARM="3",
        # the flagship is pure JVM; 32 concurrent tasks want more heap
        # than the bench default (6g is sized for Python-interop runs —
        # measured 12.7s vs 6.1s at local[32] on the 935M-row input)
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from bench at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    materialize_pages()
    samples: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for s in range(SESSIONS):
        for c in LEVELS:  # interleaved: 8, 32, 8, 32, ...
            r = run_level(c)
            samples[c].append(r)
            print(f"session {s} local[{c}]: {r['queries']}", flush=True)
    n_pages = samples[LEVELS[0]][0]["n_pages"]

    def best(c, q):
        vals = [r["queries"][q] for r in samples[c] if q in r["queries"]]
        return min(vals) if vals else None

    lines = [
        "# BENCH — scaling efficiency (local[8] vs local[32])",
        "",
        "North-rule criterion: throughput scaling efficiency >= 0.8 from N to",
        "4N executors.  Sandbox evidence (per driver instruction): the same",
        f"job on the same input ({n_pages:,} pages = sf0.1 x {SCALE},",
        "materialized parquet) at two local parallelism levels.",
        f"{SESSIONS} interleaved fresh-JVM sessions per level, 1 warm-up +",
        "3 timed runs each; reported value = min across a level's samples",
        "(the host throws multi-second all-core kernel-jitter storms that",
        "hit individual samples in both directions — see raw samples below).",
        "",
        "| query | local[8] s | local[32] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    effs = {}
    for q in QUERIES.split(","):
        t8, t32 = best(8, q), best(32, q)
        if not t8 or not t32:
            continue
        sp = t8 / t32
        eff = sp / (LEVELS[1] / LEVELS[0])
        effs[q] = eff
        lines.append(f"| {q} | {t8:.2f} | {t32:.2f} | {sp:.2f}x | {eff:.2f} |")
    t8 = best(8, "pip_join")
    t32 = best(32, "pip_join")
    lines += [
        "",
        f"Flagship (pip_join) throughput: **{n_pages / t8:,.0f} pages/s @ local[8]**, "
        f"**{n_pages / t32:,.0f} pages/s @ local[32]**.",
        f"Flagship scaling efficiency: **{effs.get('pip_join', 0):.2f}** "
        f"(criterion: >= 0.8).",
        "",
        "What made this scale (round-2 fixes, each measured on this host):",
        "- PIP refine moved from Arrow mapInPandas to a whole-stage-codegen",
        "  unrolled expression inside the broadcast hash join (no Python",
        "  workers in the hot path at all).",
        "- Driver JVM runs with -Xms == -Xmx + AlwaysPreTouch: G1 heap",
        "  grow/uncommit churn was causing all-core page-fault/TLB storms",
        "  (GC threads at 100% kernel time) that INVERTED scaling at 32",
        "  threads.",
        "- 32 MB input splits (~280 tasks) so the final scheduling wave",
        "  can't idle most of a 32-core box (72x128MB splits -> 3 ragged",
        "  waves, measured ~2x slower at local[32]).",
        "",
        "Raw samples (all sessions, seconds):",
        "```json",
    ]
    for c in LEVELS:
        for r in samples[c]:
            lines.append(json.dumps({"cpus": c, **{k: r[k] for k in ("queries", "n_pages")}}))
    lines += ["```", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    print("\n".join(lines[:22]))


if __name__ == "__main__":
    main()
