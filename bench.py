"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <pages/sec of the flagship PIP join>,
   "unit": "pages/sec", "queries": {name: sec, ...}, "sf": ...}

The flagship metric follows BASELINE.json: spatial-join + tiling
throughput in pages/sec (join rows matching the sgis sjoin semantics).
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession

    # JVM sizing matters more than size: a heap with -Xmx only makes G1
    # grow/uncommit/regrow, and each region (un)commit is a page-fault +
    # TLB-shootdown burst across every core — measured as multi-second
    # all-core kernel-time storms on many-core hosts.  Pin -Xms to -Xmx
    # and pre-touch so the heap is faulted exactly once at startup.
    # 32 MB input splits keep ~4x tasks per core in flight so the last
    # scheduling wave cannot idle most of the machine (72x128MB splits ->
    # 3 ragged waves at 32 cores, measured 2x slower).  The heap stays
    # MODERATE: Python worker-pool spawn from a 12 GB-RSS JVM took ~25 s
    # on this host (fork page-table copy + storm amplification) vs ~6 s
    # at 6 GB, and 6 GB comfortably fits every bench query.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions",
                f"-Xms{mem} -XX:+AlwaysPreTouch")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        .appName("ssb-sgis-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        wanted = subset.split(",")
        qs = {k: v for k, v in qs.items() if k in wanted}
    # SPARK_GRAFT_SCALE=K replicates the page table K x (deterministic
    # coordinate jitter) for the scaling-efficiency benchmark — fixed
    # overheads amortize so local[8] vs local[32] measures the engine, not
    # JVM/py4j constants.
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "1"))
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once with a trivial action
    import ssb_sgis_spark.sources.pages as pages_mod
    from pyspark.sql import functions as F

    orig_pages_df = pages_mod.pages_df
    pages_parquet = os.environ.get("SPARK_GRAFT_PAGES_PARQUET")
    if pages_parquet:
        # benchmark against a MATERIALIZED page table (the lake-table
        # model: scan scales with cores instead of re-deriving the
        # synthetic source every run)
        def parquet_pages_df(spark_, sf_dir_, with_payload=False):
            df = spark_.read.parquet(pages_parquet)
            if with_payload:
                df = pages_mod.with_page_payload(df)
            return df

        pages_mod.pages_df = parquet_pages_df
        entrymod.pages_df = parquet_pages_df
    elif scale > 1:
        def scaled_pages_df(spark_, sf_dir_, with_payload=False):
            df = orig_pages_df(spark_, sf_dir_, with_payload)
            return (
                df.withColumn(
                    "_k", F.explode(F.sequence(F.lit(0), F.lit(scale - 1)))
                )
                .withColumn("uid", F.col("uid") * scale + F.col("_k"))
                .withColumn("x", F.col("x") + F.col("_k") * 0.001)
                .drop("_k")
                # a real lake table arrives in many files; the synthetic
                # crossJoin otherwise inherits ~3 post-AQE partitions and
                # caps every downstream stage at 3 tasks
                .repartition(128)
            )

        pages_mod.pages_df = scaled_pages_df
        # re-bind the symbol imported into the entry module
        entrymod.pages_df = scaled_pages_df

    docs_parquet = os.environ.get("SPARK_GRAFT_DOCS_PARQUET")
    if docs_parquet:
        # same lake-table model for the corpus profile: the scaled docs
        # table is materialized parquet, scan parallelism follows cores.
        # Patching the sources module also reroutes docs_with_dups_df
        # (it resolves docs_df at call time via its module globals).
        import ssb_sgis_spark.sources.documents as documents_mod

        def parquet_docs_df(spark_, sf_dir_):
            return spark_.read.parquet(docs_parquet)

        documents_mod.docs_df = parquet_docs_df
        entrymod.docs_df = parquet_docs_df

    events_parquet = os.environ.get("SPARK_GRAFT_EVENTS_PARQUET")
    if events_parquet:
        # lake-table model for the window-shuffle (sessionization)
        # profile
        import ssb_sgis_spark.sources.events as events_mod

        def parquet_events_df(spark_, sf_dir_):
            return spark_.read.parquet(events_parquet)

        events_mod.events_df = parquet_events_df
        entrymod.events_df = parquet_events_df

    n_pages = pages_mod.pages_df(spark, sf_dir).count()
    n_docs = None
    if docs_parquet:
        n_docs = spark.read.parquet(docs_parquet).count()
    n_events = None
    if events_parquet:
        n_events = spark.read.parquet(events_parquet).count()

    # spin up the Python worker pool once OUTSIDE the timed region — the
    # first Arrow stage of a fresh JVM pays worker spawn + numpy/pandas
    # imports (~6-25 s depending on heap size); that's harness setup, not
    # any operator's cost
    def _ident(it):
        for pdf in it:
            yield pdf

    spark.range(32 * 1000).repartition(32).mapInPandas(_ident, "id long").count()

    # SPARK_GRAFT_WARM=N: one discarded warm-up run, then N timed runs,
    # record the MINIMUM — steady-state capability without JVM/py-worker
    # cold starts.  The sandbox's single-box kernel occasionally throws
    # fork/CoW storms (system-time spikes) that distort single samples by
    # 5-10x; min-of-N is the standard answer for that class of noise.
    # DEFAULT is warm (1 discarded + min-of-2): recorded per-round numbers
    # must reproduce run-to-run — cold single samples varied 16.3-46.9 s
    # on the flagship query across identical binaries, manufacturing
    # phantom 3.5x regressions.  Set SPARK_GRAFT_WARM=0 for cold timing.
    warm = int(os.environ.get("SPARK_GRAFT_WARM", "2") or 0)
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        print(f"# bench start {name}", file=sys.stderr, flush=True)
        q_start = time.time()
        try:
            if warm:
                fn(spark, sf_dir).count()  # discarded warm-up
            best = None
            reps = max(warm, 1)
            done = 0
            while done < reps:
                t0 = time.time()
                # full execution: count() forces Python barriers, joins
                # whose keys decide the row count, aggs and windows-
                # under-filters; map-only / row-preserving queries guard
                # themselves with _force_full in __spark_entry__ so
                # Catalyst cannot column-prune their real work away
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                done += 1
                # sub-3s queries: scheduling jitter is a large FRACTION of
                # the sample even when it's small in seconds; two extra
                # reps cost almost nothing and make min-of-N reproduce
                # run-to-run within the ±20% gate
                if done == reps and warm and best < 3.0 and reps < warm + 2:
                    reps += 2
            timings[name] = round(best, 3)
        except Exception as exc:  # keep the bench alive; report the failure
            errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
        # release this query's localCheckpoint RDDs before the next one
        # runs: checkpoint blocks pile up at MEMORY_AND_DISK across a
        # 56-query session, squeeze execution memory, and degrade later
        # queries 3-5x (measured: component_size 2.8s fresh vs 13.8s late
        # in a full run).  Python gc drops the py4j refs, the JVM gc lets
        # ContextCleaner unpersist them; session-memoized frames stay
        # live through their module-level references.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        print(
            f"# bench done {name} {round(time.time() - q_start, 1)}s total",
            file=sys.stderr,
            flush=True,
        )

    flagship = timings.get("pip_join", 1.0)
    pages_per_sec = round(n_pages / flagship, 1) if flagship else None
    print(
        json.dumps(
            {
                "metric": "pip spatial-join throughput (pages/sec), cell-cover broadcast join + ray-casting refine",
                "value": pages_per_sec,
                "unit": "pages/sec",
                "queries": timings,
                "sf": sf,
                "n_pages": n_pages,
                **({"n_docs": n_docs} if n_docs is not None else {}),
                **({"n_events": n_events} if n_events is not None else {}),
                "cpus": int(cpus),
                **({"errors": errors} if errors else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
