"""Scaling-efficiency evidence: same job, two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency >= 0.8
going from N to 4N executors.  No real cluster exists in this sandbox, so
(per the driver's instruction) the SAME flagship job runs at local[8] and
local[32] on identical input and we report throughput at both plus
efficiency = (T_8 / T_32) / 4.

The input is the sf0.1 page table replicated SPARK_GRAFT_SCALE x (default
8 -> ~3.7M pages) so the job runs long enough that JVM/py4j constants
don't drown the measurement.  Each level runs in a fresh subprocess
(fresh JVM).  Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.environ.get(
    "SPARK_GRAFT_SCALING_QUERIES", "pip_join,pip_within_distance,cell_index"
)
# big enough that the measured window is CPU-bound engine work (tens of
# seconds at local[8]), not per-job scheduling constants
SCALE = os.environ.get("SPARK_GRAFT_SCALE", "128")
LEVELS = (8, 32)
PAGES_PARQUET = f"/tmp/ssb_sgis_scaled_pages_x{SCALE}.parquet"


def materialize_pages() -> int:
    """Write the scaled page table to parquet ONCE (the lake-table model:
    both levels read the same files; scan parallelism follows cores)."""
    if os.path.isdir(PAGES_PARQUET):
        return -1
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "48g").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ssb_sgis_spark.sources.pages import pages_df
df = pages_df(spark, "/root/testdata/sf0.1")
base = df.repartition(32)
out = (base.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({SCALE} - 1))))
  .withColumn("uid", F.col("uid") * {SCALE} + F.col("_k"))
  .withColumn("x", F.col("x") + F.col("_k") * 0.001)
  .drop("_k"))
out.write.mode("overwrite").option("parquet.block.size", 16 * 1024 * 1024).parquet({PAGES_PARQUET!r})
print("rows", spark.read.parquet({PAGES_PARQUET!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)
    return 0


def run_level(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_QUERIES=QUERIES,
        SPARK_GRAFT_PAGES_PARQUET=PAGES_PARQUET,
        SPARK_GRAFT_WARM="3",
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
    raise RuntimeError(f"no JSON from bench at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    materialize_pages()
    results = {c: run_level(c) for c in LEVELS}
    n_pages = results[LEVELS[0]]["n_pages"]
    lines = [
        "# BENCH — scaling efficiency (local[8] vs local[32])",
        "",
        "North-rule criterion: throughput scaling efficiency >= 0.8 from N to",
        "4N executors.  Sandbox evidence (per driver instruction): the same",
        f"job on the same input ({n_pages:,} pages = sf0.1 x {SCALE}) at two",
        "local parallelism levels, fresh JVM each.",
        "",
        "| query | local[8] s | local[32] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    effs = {}
    for q in QUERIES.split(","):
        t8 = results[8]["queries"].get(q)
        t32 = results[32]["queries"].get(q)
        if not t8 or not t32:
            continue
        sp = t8 / t32
        eff = sp / (LEVELS[1] / LEVELS[0])
        effs[q] = eff
        lines.append(f"| {q} | {t8:.2f} | {t32:.2f} | {sp:.2f}x | {eff:.2f} |")
    tp8 = n_pages / results[8]["queries"]["pip_join"]
    tp32 = n_pages / results[32]["queries"]["pip_join"]
    lines += [
        "",
        f"Flagship (pip_join) throughput: **{tp8:,.0f} pages/s @ local[8]**, "
        f"**{tp32:,.0f} pages/s @ local[32]**.",
        f"Flagship scaling efficiency: **{effs.get('pip_join', 0):.2f}** "
        f"(criterion: >= 0.8).",
        "",
        "Raw bench JSON:",
        "```json",
        json.dumps(results[8]),
        json.dumps(results[32]),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    print("\n".join(lines[:20]))


if __name__ == "__main__":
    main()
