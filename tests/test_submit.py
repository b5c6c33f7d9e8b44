"""The spark-submit --py-files deployment surface (north rule: the job
runs via spark-submit on a multi-executor cluster).  Exercises the real
packaging path — zip the package, ship it with --py-files, run a query
in a FRESH JVM — not the in-process test session."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pip_join(tmp_path):
    out = str(tmp_path / "submit_out")
    env = dict(os.environ, PYSPARK_PYTHON=os.sys.executable)
    r = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "scripts", "run_spark_submit.sh"),
            "pip_join",
            "/root/testdata/sf0.001",
            out,
            "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "WROTE" in r.stdout

    # result parquet + per-partition lineage rows landed next to it
    import duckdb

    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/result/*.parquet')").fetchone()[0]
    assert n > 0
    lin = con.sql(
        f"SELECT sum(n_rows) FROM read_parquet('{out}/lineage/*.parquet')"
    ).fetchone()[0]
    assert lin == n
