"""spark-submit entry point — the multi-executor deployment surface.

North-rule requirement: the job runs via ``spark-submit --py-files`` on a
multi-executor cluster.  Packaging + launch:

    cd /root/repo
    zip -r /tmp/ssb_sgis_spark.zip ssb_sgis_spark
    spark-submit --master <cluster> \
        --py-files /tmp/ssb_sgis_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.1 --query pip_join \
        --out /tmp/pip_out

In this sandbox the same launch works with ``--master local[8|32]`` —
`scripts/run_spark_submit.sh` wraps it (and is exercised by
tests/test_submit.py).  The job writes its result parquet plus the
per-partition lineage rows (plans/manifest.partition_metrics) next to it.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--query", default="pip_join")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"ssb-sgis-spark:{args.query}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # the package arrives via --py-files; the entry module rides alongside
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    fn = entry.queries()[args.query]
    df = fn(spark, args.sf_dir)
    df.write.mode("overwrite").parquet(os.path.join(args.out, "result"))

    from ssb_sgis_spark.plans.manifest import partition_metrics

    partition_metrics(df).write.mode("overwrite").parquet(
        os.path.join(args.out, "lineage")
    )
    n = spark.read.parquet(os.path.join(args.out, "result")).count()
    print(f"WROTE {n} rows to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
