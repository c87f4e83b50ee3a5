"""End-to-end monitoring job: spark-submit-shaped CLI run on the sf0.001
corpus; the four relations land, metrics summarize them consistently, and
the sketch relations agree with their library twins."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_monitor_job_end_to_end(tmp_path):
    out = str(tmp_path / "mon")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "monitor_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--part-buckets", "64",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))

    assert metrics["docs_in"] == 500
    assert metrics["partition_buckets"] <= 64
    assert metrics["partition_gini_milli"] >= 0
    assert metrics["drift_langs"] >= 1
    assert metrics["heavy_hitters"] >= 1

    con = duckdb.connect()
    n_hosts = con.sql(f"SELECT COUNT(*) FROM '{out}/hll/*.parquet'").fetchone()[0]
    assert n_hosts == metrics["hosts"]
    # HLL relation internally consistent: zeros + n_regs == 64
    bad = con.sql(
        f"SELECT COUNT(*) FROM '{out}/hll/*.parquet' WHERE zeros + n_regs <> 64"
    ).fetchone()[0]
    assert bad == 0
    # heavy hitters: exact counts all clear the relation's own threshold
    # implied by total tokens (cms_est >= n always)
    under = con.sql(
        f"SELECT COUNT(*) FROM '{out}/hitters/*.parquet' WHERE cms_est < n"
    ).fetchone()[0]
    assert under == 0
