"""End-to-end hygiene job: spark-submit-shaped CLI run on the sf0.001
corpus, metrics/outputs cross-checked (the jobs/ analog of the reference's
CLI entry, TextExtractor.java:136-194)."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hygiene_job_end_to_end(tmp_path):
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--sample-pct", "80",
            "--pack-budget", "128",
            "--n-streams", "8",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))

    assert metrics["docs_in"] == 500
    assert 0 < metrics["docs_out"] < 500
    assert metrics["dropped_sample"] > 0  # 20% sampled away
    # the sandbox corpus plants NEAR-duplicates (dedup_job's territory) but
    # no byte-exact ones, so the exact-dedup keeper drops nothing here
    assert metrics["dropped_dups"] == 0
    assert metrics["boiler_set"]["n_overflow"] == 0

    con = duckdb.connect()
    n_clean = con.sql(f"SELECT COUNT(*) FROM '{out}/clean/*.parquet'").fetchone()[0]
    assert n_clean == metrics["docs_out"]
    # packing covers exactly the cleaned docs, sequences respect the budget
    n_packed = con.sql(f"SELECT COUNT(*) FROM '{out}/packed/*.parquet'").fetchone()[0]
    assert n_packed == metrics["docs_out"]
    seqs = con.sql(
        f"SELECT SUM(CASE WHEN tok > 128 AND d > 1 THEN 1 ELSE 0 END) FROM ("
        f"  SELECT stream, seq_id, SUM(n_tokens) AS tok, COUNT(*) AS d"
        f"  FROM '{out}/packed/*.parquet' GROUP BY stream, seq_id)"
    ).fetchone()[0]
    assert seqs == 0  # only single oversized docs may exceed the budget


def test_hygiene_job_drops_planted_duplicates_and_junk(tmp_path):
    src = str(tmp_path / "in.parquet")
    body = " ".join(f"the good w{i}" for i in range(10))
    con = duckdb.connect()
    con.sql(
        "COPY (SELECT * FROM (VALUES "
        f"(1, '{body} one'), (2, '{body} one'), (3, '{body} one'), "  # 2 dups
        f"(4, '{body} four'), "
        "(5, '111 222 333 444 555 666 777 888')"  # all-digit junk: quality gate
        f") t(doc_id, text)) TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out,
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["dropped_dups"] == 2
    assert metrics["dropped_quality"] == 1
    assert metrics["docs_out"] == 2  # doc 1 (keeper) + doc 4
    kept = {
        r[0]
        for r in con.sql(f"SELECT doc_id FROM '{out}/clean/*.parquet'").fetchall()
    }
    assert kept == {"1", "4"}


def test_hygiene_job_perplexity_gate_drops_gibberish(tmp_path):
    """A gibberish doc that PASSES every rule gate (word count, word length,
    digit ratio, stopword hit) but is all corpus-singleton tokens must be
    dropped by the LM gate, with the drop counted in metrics.json."""
    src = str(tmp_path / "in.parquet")
    con = duckdb.connect()
    # 200 normal docs sharing a small vocabulary (low surprisal) + 1 doc of
    # unique tokens (each a corpus singleton -> surprisal ~ log2(T)); the
    # per-doc suffix keeps every LINE unique so the boilerplate stage (which
    # runs before the LM census) strips nothing
    con.sql(
        "COPY (SELECT i AS doc_id, "
        "  'the quick brown fox jumps over the lazy dog again and v' || i AS text "
        "FROM range(200) t(i) "
        "UNION ALL SELECT 999, 'the ' || list_aggr(list_transform(range(30), "
        "  j -> 'zx' || j || 'qv'), 'string_agg', ' ')"
        f") TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out, "--ppx-gate", "160",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["dropped_perplexity"] == 1
    assert metrics["ppx_gate"] == 160
    kept = {
        r[0]
        for r in con.sql(f"SELECT doc_id FROM '{out}/clean/*.parquet'").fetchall()
    }
    assert "999" not in kept
    # the gibberish doc passed the RULE gates (it was the LM that caught it)
    assert metrics["dropped_quality"] == 0


def test_hygiene_job_encoding_and_badword_gates(tmp_path):
    """Stage 0: a dead-bytes doc (high U+FFFD density) and a badword doc are
    dropped with their drops counted; a mojibake doc is REPAIRED (kept, with
    the fixed text written out)."""
    src = str(tmp_path / "in.parquet")
    body = " ".join(f"the good w{i}" for i in range(10))
    con = duckdb.connect()
    con.sql(
        "COPY (SELECT * FROM (VALUES "
        f"(1, '{body} itâ€™s the cafÃ©'), "      # mojibake: repaired, kept
        f"(2, '{body} darnscale extra'), "        # badword: dropped
        "(3, 'a' || repeat(chr(65533), 40)), "    # dead bytes: dropped
        f"(4, '{body} four')"
        f") t(doc_id, text)) TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out,
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["dropped_badword"] == 1
    assert metrics["dropped_encoding"] == 1
    kept = dict(
        con.sql(f"SELECT doc_id, text FROM '{out}/clean/*.parquet'").fetchall()
    )
    assert "2" not in kept and "3" not in kept
    assert kept["1"].endswith("it’s the café")  # mojibake repaired in output


def test_hygiene_job_readability_floor(tmp_path):
    """With --read-floor set, a syllable-dense run-on doc (40 words of
    alternating vowel-consonant pairs, no sentence break: the words/sentence
    and syllables/word terms both explode, driving Flesch far below any
    real prose) is flagged and counted; the default floor of 0 keeps the
    stage off."""
    src = str(tmp_path / "in.parquet")
    con = duckdb.connect()
    # normal short-sentence docs score well above zero; the consonant wall
    # has ~1 syllable group per 40-char word -> huge words/sentence term
    con.sql(
        "COPY (SELECT i AS doc_id, "
        "  'the cat sat on the mat. a dog ran by. all is well v' || i AS text "
        "FROM range(50) t(i) "
        "UNION ALL SELECT 999, 'the ' || list_aggr(list_transform(range(40), "
        "  j -> repeat('ab', 10) || j), 'string_agg', ' ')"
        f") TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out,
            "--read-floor", "-100000", "--ppx-gate", "0",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["read_floor"] == -100000
    assert metrics["dropped_readability"] == 1
    kept = {
        r[0]
        for r in con.sql(f"SELECT doc_id FROM '{out}/clean/*.parquet'").fetchall()
    }
    assert "999" not in kept and "0" in kept


def test_hygiene_job_entropy_gate_two_tails(tmp_path):
    """Opt-in entropy gate: a repeated-char doc (low tail) and an
    alphabet-cycling doc (high tail) that each PASS the rule gates must be
    dropped only when --entropy-gate is on, both drops counted."""
    import itertools

    src = str(tmp_path / "in.parquet")
    con = duckdb.connect()
    # low tail: 'the' + 40x 'oo' -> n_words 41, mean_wlen ~2.02, stopword
    # hit, digit ratio 0 -> rules pass; char distribution ~all 'o' -> H~0
    low = "the " + " ".join(["oo"] * 40)
    # high tail: 'the' + 25 8-char words cycling the alphabet -> uniform
    # 26-symbol usage, ~4.7 bits/char, rules pass
    cyc = itertools.cycle("abcdefghijklmnopqrstuvwxyz")
    high = "the " + " ".join(
        "".join(next(cyc) for _ in range(8)) for _ in range(25)
    )
    # filler prose tuned INSIDE the (3.5, 4.3] bits/char band — ordinary
    # English sits ~3.9 bits; fragments like 'the good word w0 here' fall
    # below the low gate and would be (correctly) flagged too
    body = (
        "the committee reviewed the annual report and found the results "
        "were consistent with earlier estimates of growth"
    )
    rows = ", ".join(
        [f"(1, '{low}')", f"(2, '{high}')"]
        + [f"({i}, '{body} v{i}')" for i in range(3, 13)]
    )
    con.sql(
        f"COPY (SELECT * FROM (VALUES {rows}) t(doc_id, text)) "
        f"TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "hyg")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out, "--entropy-gate",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["entropy_gate"] is True
    assert metrics["dropped_entropy"] == 2
    assert metrics["dropped_quality"] == 0  # the rules did NOT catch them
    kept = {
        r[0]
        for r in con.sql(f"SELECT doc_id FROM '{out}/clean/*.parquet'").fetchall()
    }
    assert "1" not in kept and "2" not in kept and "3" in kept

    # default run (gate off): both planted docs survive, metric reads 0
    out2 = str(tmp_path / "hyg2")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "hygiene_job.py"),
            "--input", src, "--output", out2,
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m2 = json.load(open(os.path.join(out2, "metrics.json")))
    assert m2["dropped_entropy"] == 0 and m2["entropy_gate"] is False
    kept2 = {
        r[0]
        for r in con.sql(f"SELECT doc_id FROM '{out2}/clean/*.parquet'").fetchall()
    }
    assert {"1", "2"} <= kept2
