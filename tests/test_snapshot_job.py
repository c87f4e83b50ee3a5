"""Incremental snapshot job: CLI run on the sf0.001 corpus — the reprocess
set is exactly added+changed, carried/retired cost nothing, spans land."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_snapshot_job_end_to_end(tmp_path):
    out = str(tmp_path / "incr")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "snapshot_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))

    d = metrics["diff"]
    assert set(d) == {"added", "removed", "changed", "unchanged"}
    assert metrics["docs_reprocessed"] == d["added"] + d["changed"]
    assert metrics["docs_carried"] == d["unchanged"]
    assert metrics["docs_in_b"] == d["added"] + d["changed"] + d["unchanged"]
    assert 0 < metrics["reprocess_pm"] < 1000
    assert metrics["spans_written"] > 0

    con = duckdb.connect()
    # spans cover exactly the reprocess set's docs
    n_docs_spanned = con.sql(
        f"SELECT COUNT(DISTINCT doc_id) FROM '{out}/spans/*.parquet'"
    ).fetchone()[0]
    assert n_docs_spanned == metrics["docs_reprocessed"]
    # the diff relation on disk agrees with the census
    per_status = dict(
        con.sql(
            f"SELECT status, COUNT(*) FROM '{out}/diff/*.parquet' GROUP BY status"
        ).fetchall()
    )
    assert per_status == d
