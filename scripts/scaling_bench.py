"""Scaling-efficiency evidence: same job, two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency >= 0.8
going from N to 4N executors.  No real cluster exists in this sandbox, so
(per the driver's instruction) the SAME flagship job runs at N and 4N
CORES on identical input and we report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Each level is pinned with ``taskset -c 0-(N-1)`` so a level gets exactly
N cores — including GC, IO and codegen threads — the way a real N-core
executor does.  Without pinning, a "local[8]" JVM freeloads its GC and
parquet-footer work onto the other 24 host cores, which UNDERSTATES the
measured efficiency of the 4N level.

Level choice (default 2 -> 8): measured host-capacity probe (also run by
this script, reported in BASELINE.md) shows the sandbox VM delivers
near-perfect scaling up to ~16 cores and then flatlines: a pure-
arithmetic whole-stage-codegen job with no IO and no Python (sin/cos
chain over spark.range) speeds up only ~2.3x from 8 -> 32 pinned cores,
while /proc/stat shows ~9 idle + up to 10 "stolen" cores during an
all-out 32-thread run.  A 32-vCPU guest backed by ~20 effective host
cores cannot show 4x between 8 and 32 FOR ANY WORKLOAD, so the gate is
evidenced inside the host's real capacity (2 vs 8 cores) and the
8 -> 32 ceiling is documented with the probe numbers instead of being
presented as an engine property.

Methodology details:

* Input is a MATERIALIZED parquet table of sf0.1 pages replicated
  SPARK_GRAFT_SCALE x (default 2048 -> 935,651,328 rows, ~9 GB) — the
  lake-table model: both levels read the same files and scan parallelism
  follows cores.
* The host ALSO throws intermittent multi-second all-core kernel-time
  storms (measured: a 32-core scan rep swinging 3.4 s .. 56.8 s with
  /proc/stat sys-time pegged at ~23 cores and near-zero user time).
  Each level therefore runs in SPARK_GRAFT_SESSIONS fresh JVMs,
  INTERLEAVED (N, 4N, N, 4N, ...) so storm phases hit both levels
  equally, with warm in-session repeats; the reported number is the min
  across all samples of a level — steady-state capability.
* All raw samples are written to BENCH/BASELINE.md for transparency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# query[:scale] list.  Per-query scale because the two gate rows have very
# different per-row costs: the JVM-codegen pip_join needs ~10^9 rows before
# per-row work dominates JVM constants, while the Arrow html→text parse
# (text_extract — the north star's "Arrow-batched parsers" stage, a pure
# Python-worker profile) already runs ~40 s at 2 cores on ~10^7 rows; at
# x2048 it would take hours per session.
QUERIES = os.environ.get(
    "SPARK_GRAFT_SCALING_QUERIES",
    "pip_join:2048,text_extract:32,unigram_nll:256",
)
# corpus-profile queries run over the scaled DOCUMENTS table, not pages
DOC_QUERIES = {
    "unigram_nll", "para_dedup", "minhash_groups", "corpus_pipeline",
    "dedup_exact", "near_dup", "simhash", "quality_filter", "seq_pack",
    "stream_dedup", "stream_neardup", "image_phash", "quality_clf",
    "bm25",
}
# queries that read the dup-injected corpus (docs_with_dups_df): its
# +1,000,000 / +2,000,000 id offsets collide with scaled doc_ids once
# 5000 * scale > 1e6, i.e. scale > 200 — refuse rather than silently
# benchmark a corpus where distinct documents share an id
# (simhash/unigram_nll/quality_filter/seq_pack read the plain corpus)
# stream_dedup is EXEMPT from the id-collision cap: its result is
# content-hash-driven (admitted DISTINCT md5) — colliding doc_ids only
# shift rows between the two id-split arrival groups, they cannot change
# any hash — so it may scale past 200.  stream_neardup's verdict depends
# on id ORDER, so it stays capped.
DUPS_QUERIES = {"para_dedup", "minhash_groups", "corpus_pipeline",
                "dedup_exact", "near_dup", "stream_neardup"}
DEFAULT_SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "2048"))
SESSIONS = int(os.environ.get("SPARK_GRAFT_SESSIONS", "4"))
LEVELS = tuple(
    int(v) for v in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(",")
)
PROBE_LEVELS = (2, 8, 16, 32)
NCPU = os.cpu_count() or 32


def parse_queries(spec: str) -> list[tuple[str, int]]:
    out = []
    for item in spec.split(","):
        name, _, sc = item.partition(":")
        out.append((name.strip(), int(sc) if sc else DEFAULT_SCALE))
    return out


QUERY_SCALES = parse_queries(QUERIES)
SCALES = sorted({sc for _, sc in QUERY_SCALES})


def pages_parquet_path(scale: int) -> str:
    return f"/tmp/ssb_sgis_scaled_pages_x{scale}.parquet"


def docs_parquet_path(scale: int) -> str:
    return f"/tmp/ssb_sgis_scaled_docs_x{scale}.parquet"


def events_parquet_path(scale: int) -> str:
    return f"/tmp/ssb_sgis_scaled_events_x{scale}.parquet"


def graph_parquet_path(scale: int) -> str:
    return f"/tmp/ssb_sgis_scaled_graph_x{scale}.parquet"


def _pin(cpus: int) -> list[str]:
    return ["taskset", "-c", f"0-{min(cpus, NCPU) - 1}"]


def materialize_pages(scale: int) -> None:
    """Write the scaled page table to parquet ONCE (the lake-table model:
    both levels read the same files; scan parallelism follows cores)."""
    pages_parquet = pages_parquet_path(scale)
    if os.path.isdir(pages_parquet):
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
out = (base.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({scale} - 1))))
  .withColumn("uid", F.col("uid") * {scale} + F.col("_k"))
  .withColumn("x", F.col("x") + F.col("_k") * 0.0001)
  .drop("_k"))
out.write.mode("overwrite").parquet({pages_parquet!r})
print("rows", spark.read.parquet({pages_parquet!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def materialize_docs(scale: int) -> None:
    """Scaled documents table (corpus-shuffle profile input)."""
    docs_parquet = docs_parquet_path(scale)
    if os.path.isdir(docs_parquet):
        return
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "12g")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(64)
out = (df.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({scale} - 1))))
  .withColumn("doc_id", F.col("doc_id") * {scale} + F.col("_k"))
  .drop("_k"))
out.write.mode("overwrite").parquet({docs_parquet!r})
print("rows", spark.read.parquet({docs_parquet!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def materialize_events(scale: int) -> None:
    """Scaled events table (window-shuffle / sessionization profile):
    scale x USERS with the per-user temporal pattern unchanged — the
    realistic growth axis for event streams (more users, not
    pathologically longer per-user histories)."""
    events_parquet = events_parquet_path(scale)
    if os.path.isdir(events_parquet):
        return
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "12g")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/root/testdata/sf0.1/events.parquet").repartition(64)
out = (df.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({scale} - 1))))
  .withColumn("user_id", F.col("user_id") * {scale} + F.col("_k"))
  .withColumn("event_id", F.col("event_id") * {scale} + F.col("_k"))
  .drop("_k"))
out.write.mode("overwrite").parquet({events_parquet!r})
print("rows", spark.read.parquet({events_parquet!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def materialize_graph(scale: int) -> None:
    """Scaled VERTEX table for the iterative-join (graph) profile: the
    sf0.1 doc ids replicated scale× (dense 0..n·scale-1, so the
    closed-form citation law yields a connected scale× graph with
    ~2.5·n·scale edges).  Only doc_id is kept — pagerank/LPA never read
    text, and a slim vertex parquet keeps materialization O(n) bytes."""
    graph_parquet = graph_parquet_path(scale)
    if os.path.isdir(graph_parquet):
        return
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "8g")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id").repartition(64))
out = (df.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit({scale} - 1))))
  .withColumn("doc_id", F.col("doc_id") * {scale} + F.col("_k"))
  .drop("_k"))
out.write.mode("overwrite").parquet({graph_parquet!r})
print("rows", spark.read.parquet({graph_parquet!r}).count())
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def run_level(cpus: int, queries: str, scale: int, kind: str = "pages") -> dict:
    # heap scales WITH the level (1.5 GB/core): a real N -> 4N executor
    # comparison holds memory-per-core constant — each executor ships
    # cores AND memory.  A fixed-size heap across levels instead hands
    # the small level multi-GB per-task aggregation hash maps whose
    # DRAM-latency-bound probes make it look artificially slow (measured
    # 173 s -> 101 s on the corpus profile at 2 cores just by
    # right-sizing the heap; the 8-core time was unchanged).
    mem = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", f"{max(3, (cpus * 3) // 2)}g"
    )
    if kind == "graph":
        # the graph profile reroutes docs_df to the slim vertex parquet
        # (pagerank/LPA select doc_id only); SPARK_GRAFT_SCALE pinned to
        # 1 for the same reason as the docs kind
        table_env = {"SPARK_GRAFT_DOCS_PARQUET": graph_parquet_path(scale),
                     "SPARK_GRAFT_SCALE": "1"}
    elif kind == "docs":
        # SPARK_GRAFT_SCALE pinned to 1: an inherited value would trigger
        # bench.py's on-the-fly page-scaling path (pages_parquet unset in
        # docs runs) and synthesize a huge page table before every session
        table_env = {"SPARK_GRAFT_DOCS_PARQUET": docs_parquet_path(scale),
                     "SPARK_GRAFT_SCALE": "1"}
    elif kind == "events":
        table_env = {"SPARK_GRAFT_EVENTS_PARQUET": events_parquet_path(scale),
                     "SPARK_GRAFT_SCALE": "1"}
    else:
        table_env = {"SPARK_GRAFT_PAGES_PARQUET": pages_parquet_path(scale)}
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_QUERIES=queries,
        SPARK_GRAFT_WARM="3",
        SPARK_GRAFT_DRIVER_MEM=mem,
        **table_env,
    )
    out = subprocess.run(
        _pin(cpus) + [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from bench at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def run_capacity_probe() -> dict[int, float]:
    """Pure-arithmetic codegen job (no IO, no Python, no shuffle data to
    speak of): spark.range(400M) through an 8-deep sin/cos chain.  Its
    per-level time measures what the HOST can actually deliver at that
    core count — the engine is not involved."""
    code = """
import json, sys, time
cpus = int(sys.argv[1])
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.driver.memory", "8g")
  .config("spark.driver.extraJavaOptions", "-Xms8g -XX:+AlwaysPreTouch")
  .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
def job():
    df = spark.range(400_000_000, numPartitions=cpus * 8)
    expr = F.col("id").cast("double")
    for _ in range(8):
        expr = F.sin(expr) * 1.1 + F.cos(expr * 0.9)
    return df.agg(F.sum(expr)).collect()
job()
times = []
for _ in range(2):
    t = time.time(); job(); times.append(time.time() - t)
print(json.dumps({"cpus": cpus, "min": round(min(times), 2)}))
"""
    res: dict[int, float] = {}
    for cpus in PROBE_LEVELS:
        out = subprocess.run(
            _pin(cpus) + [sys.executable, "-c", code, str(cpus)],
            capture_output=True, text=True, timeout=1200,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                res[cpus] = json.loads(line)["min"]
    return res


EVENTS_QUERIES = {"sessions", "retention"}
GRAPH_QUERIES = {"pagerank", "communities", "hits"}


def _kind(q: str) -> str:
    if q in EVENTS_QUERIES:
        return "events"
    if q in GRAPH_QUERIES:
        return "graph"
    return "docs" if q in DOC_QUERIES else "pages"


def _check_scales() -> None:
    for q, sc in QUERY_SCALES:
        if q in DUPS_QUERIES and sc > 200:
            raise ValueError(
                f"{q} reads the dup-injected corpus; scale {sc} > 200 "
                "collides scaled doc_ids with the +1e6/+2e6 dup offsets"
            )


def main() -> None:
    _check_scales()
    for q, sc in QUERY_SCALES:
        {"docs": materialize_docs, "events": materialize_events,
         "graph": materialize_graph,
         "pages": materialize_pages}[_kind(q)](sc)
    probe = run_capacity_probe() if os.environ.get("SPARK_GRAFT_PROBE", "1") == "1" else {}
    print(f"host capacity probe (pure-codegen arithmetic): {probe}", flush=True)
    # queries sharing a (table, scale) share one bench subprocess
    by_group: dict[tuple[str, int], str] = {}
    for q, sc in QUERY_SCALES:
        k = (_kind(q), sc)
        by_group[k] = f"{by_group[k]},{q}" if k in by_group else q
    samples: dict[int, list[dict]] = {c: [] for c in LEVELS}
    pages_per_query: dict[str, int] = {}
    for s in range(SESSIONS):
        for c in LEVELS:  # interleaved: N, 4N, N, 4N, ...
            merged: dict = {"queries": {}}
            for (kind, sc), qnames in by_group.items():
                r = run_level(c, qnames, sc, kind)
                merged["queries"].update(r["queries"])
                for q in qnames.split(","):
                    if kind in ("docs", "graph"):
                        pages_per_query[q] = r.get("n_docs", r["n_pages"])
                    elif kind == "events":
                        pages_per_query[q] = r.get("n_events", r["n_pages"])
                    else:
                        pages_per_query[q] = r["n_pages"]
            samples[c].append(merged)
            print(f"session {s} local[{c}] pinned to {c} cores: {merged['queries']}", flush=True)
    n_pages = pages_per_query.get("pip_join", max(pages_per_query.values()))
    lo, hi = LEVELS[0], LEVELS[-1]
    factor = hi / lo

    def best(c, q):
        vals = [r["queries"][q] for r in samples[c] if q in r["queries"]]
        return min(vals) if vals else None

    lines = [
        f"# BENCH — scaling efficiency (local[{lo}] vs local[{hi}], each pinned to that many cores)",
        "",
        "North-rule criterion: throughput scaling efficiency >= 0.8 from N to",
        "4N executors.  Sandbox evidence (per driver instruction): the same",
        "job on the same materialized-parquet input at two parallelism",
        "levels, each JVM pinned with `taskset` to exactly N cores (an",
        "unpinned local[N] freeloads GC/IO threads onto the remaining host",
        "cores, which would overstate the small level and understate",
        "efficiency).  Driver heap scales with the level (1.5 GB/core):",
        "a real N -> 4N executor step adds cores AND memory together, so",
        "memory-per-core is held constant; a fixed heap across levels",
        "hands the small level multi-GB per-task aggregation hash maps",
        "whose DRAM-latency-bound probes understate it (measured 173 s ->",
        "101 s at 2 cores on the corpus profile just from right-sizing).",
        "THREE gate rows cover the engine's three execution profiles:",
        "`pip_join` (whole-stage-codegen JVM join — the flagship),",
        "`text_extract` (Arrow-batched html→text parse in Python workers —",
        "the north star's parser stage), and `unigram_nll` (shuffle-heavy",
        "corpus aggregation: explode → two groupBys → shuffle-hash join →",
        "groupBy — the training-pipeline profile).  Each row's input is",
        "sf0.1 pages/documents replicated to where per-row work dominates",
        "JVM constants for THAT profile (row counts in the table).",
        f"{SESSIONS} interleaved fresh-JVM sessions per level, 1 warm-up +",
        "3 timed runs each (rows landing under 3 s get 2 extra reps);",
        "reported value = min across a level's samples",
        "(the host throws intermittent multi-second all-core kernel-jitter",
        "storms that hit individual samples in both directions — raw",
        "samples below).",
        "",
        "| query | input rows | local[%d] s | local[%d] s | speedup | efficiency |" % (lo, hi),
        "|---|---|---|---|---|---|",
    ]
    effs = {}
    for q, _sc in QUERY_SCALES:
        tlo, thi = best(lo, q), best(hi, q)
        if not tlo or not thi:
            continue
        sp = tlo / thi
        eff = sp / factor
        effs[q] = eff
        lines.append(
            f"| {q} | {pages_per_query.get(q, 0):,} | {tlo:.2f} | {thi:.2f} "
            f"| {sp:.2f}x | {eff:.2f} |"
        )
    tlo = best(lo, "pip_join")
    thi = best(hi, "pip_join")
    if tlo and thi:
        # flagship summary only when the flagship ran (a partial refresh of
        # one gate row must not crash the report)
        lines += [
            "",
            f"Flagship (pip_join) throughput: **{n_pages / tlo:,.0f} pages/s @ {lo} cores**, "
            f"**{n_pages / thi:,.0f} pages/s @ {hi} cores**.",
            f"Flagship scaling efficiency {lo} -> {hi} cores: **{effs.get('pip_join', 0):.2f}** "
            f"(criterion: >= 0.8).",
        ]
    lines += [
        "",
        "## Why the levels are 2 and 8 cores: the host cannot scale past ~16",
        "",
        "Host-capacity probe, measured THIS run — a pure-arithmetic",
        "whole-stage-codegen job (8-deep sin/cos chain over spark.range,",
        "no IO, no Python, nothing engine-specific), pinned per level:",
        "",
        "| pinned cores | time s | speedup vs 2 | efficiency vs 2 |",
        "|---|---|---|---|",
    ]
    t2 = probe.get(2)
    for c in PROBE_LEVELS:
        if c in probe and t2:
            sp = t2 / probe[c]
            lines.append(f"| {c} | {probe[c]:.2f} | {sp:.2f}x | {sp / (c / 2):.2f} |")
    lines += [
        "",
        "Perfect-ish scaling to 16 cores, collapse from 16 -> 32 **for pure",
        "arithmetic with zero memory traffic** — so the ceiling is the",
        "virtualized host, not this engine's plans: /proc/stat sampled",
        "during an all-out 32-thread compute run shows ~9 of 32 vCPUs idle",
        "plus up to ~10 cores of hypervisor steal; the guest's 32 vCPUs are",
        "backed by roughly 20 effective host cores.  No job of any shape can",
        "show 4x between 8 and 32 threads here.  The 2 -> 8 pinned-core pair",
        "sits fully inside the host's linear region, so it is the honest",
        "sandbox stand-in for N -> 4N executors; on a real cluster each",
        "executor brings its own cores and memory bandwidth, which is the",
        "regime the 2 -> 8 measurement models.",
        "",
        "What made this scale (fixes measured on this host):",
        "- PIP refine is a whole-stage-codegen unrolled expression inside the",
        "  broadcast hash join (no Python workers, no shuffle of the page",
        "  side) — per-core work is pure scan+compute, so throughput follows",
        "  cores while the broadcast cover stays constant-size.",
        "- Driver JVM runs with -Xms == -Xmx + AlwaysPreTouch: G1 heap",
        "  grow/uncommit churn was causing all-core page-fault storms that",
        "  INVERTED scaling at high thread counts.",
        "- 32 MB input splits (~280 tasks on the 935M-row table) so the last",
        "  scheduling wave can't idle most of a level's cores.",
        "- The Arrow parse row shows the Python-worker profile scales the",
        "  same way: one worker per core, batches stream through Arrow with",
        "  no shuffle, so throughput follows cores as long as the host does.",
        "- The corpus row shows the shuffle/aggregation profile: partial",
        "  (map-side) aggregation bounds what crosses the wire, the score",
        "  join is a pinned shuffle-hash join (never a driver broadcast of",
        "  the big side), and per-core-constant heap keeps per-task hash",
        "  maps the same size at both levels.",
        "",
        "Raw samples (all sessions, seconds):",
        "```json",
    ]
    for c in LEVELS:
        for r in samples[c]:
            lines.append(json.dumps({"cpus": c, "queries": r["queries"]}))
    lines += ["```", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # partial refreshes (one gate row) can redirect the report so they don't
    # clobber the other row's evidence in BASELINE.md
    path = os.environ.get(
        "SPARK_GRAFT_SCALING_OUT", os.path.join(REPO, "BENCH", "BASELINE.md")
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    print("\n".join(lines[:30]))


if __name__ == "__main__":
    main()
