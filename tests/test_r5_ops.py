"""Round-5 operators: stupid-backoff bigram perplexity, script detection,
URL blocklist filtering. Property pins + DuckDB mirror equality (the
driver-gate contract) at sf0.001."""

import hashlib

import duckdb
import pandas as pd
import pytest

from pdfextract_spark.functions import textops, webclean

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con.sql(sql).df()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ------------------------------------------------------- bigram perplexity

@pytest.fixture(scope="module")
def bippl(docs):
    return textops.bigram_perplexity(docs).toPandas()


def test_bigram_ppl_matches_mirror(bippl):
    du = _duck(textops.sql_bigram_perplexity())
    assert len(bippl) == len(du)
    assert sorted(bippl.columns) == sorted(du.columns)
    assert _value_hash(bippl) == _value_hash(du)


def test_bigram_ppl_backoff_and_flags_live(bippl):
    # the capped LM (BIGRAM_CAP < fixture's 916 bigram types) makes the
    # backoff path real, and the gate splits the fixture
    assert 0 < bippl.n_backoff.sum() < bippl.n_bigrams.sum()
    assert bippl.ppx_flag.nunique() == 2


def test_bigram_ppl_backoff_costs_more(bippl):
    # backoff positions carry the unigram surprisal + penalty, so mean
    # surprisal must correlate with backoff density at the extremes
    dens = bippl.n_backoff / bippl.n_bigrams
    hi = bippl[dens >= dens.quantile(0.9)].mean_surprisal_q4.mean()
    lo = bippl[dens <= dens.quantile(0.1)].mean_surprisal_q4.mean()
    assert hi > lo


def test_bigram_ppl_in_lm_positions_bounded(bippl):
    # every doc's mean is >= 0 (q >= PRESCALE on both paths)
    assert (bippl.mean_surprisal_q4 >= 0).all()


# --------------------------------------------------------- script ratios

@pytest.fixture(scope="module")
def scripts(spark, docs):
    return textops.script_ratios(textops.synthesize_scripts(docs)).toPandas()


def test_script_ratios_matches_mirror(scripts):
    du = _duck(textops.sql_script_ratios())
    assert len(scripts) == len(du)
    assert sorted(scripts.columns) == sorted(du.columns)
    assert _value_hash(scripts) == _value_hash(du)


def test_script_ratios_variety_and_sum(scripts):
    assert {"latin", "cyrillic", "cjk"} <= set(scripts.script)
    # per-mille columns sum to <= 1000 (integer floor) and >= 996
    total = (
        scripts.latin_pm + scripts.digit_pm + scripts.cyrillic_pm
        + scripts.cjk_pm + scripts.other_pm
    )
    assert (total <= 1000).all() and (total >= 995).all()
    # the mixed bucket: latin-dominant docs with nonzero cyrillic share
    assert ((scripts.script == "latin") & (scripts.cyrillic_pm > 0)).any()


def test_script_dominant_is_argmax(scripts):
    cols = {
        "latin": "latin_pm", "digit": "digit_pm", "cyrillic": "cyrillic_pm",
        "cjk": "cjk_pm", "other": "other_pm",
    }
    for r in scripts.itertuples():
        best = max(cols.values(), key=lambda c: getattr(r, c))
        assert getattr(r, cols[r.script]) == getattr(r, best)


# --------------------------------------------------------- char entropy

@pytest.fixture(scope="module")
def entropy(spark, docs):
    return textops.char_entropy(textops.synthesize_entropy(docs)).toPandas()


def test_char_entropy_matches_mirror(entropy):
    du = _duck(textops.sql_char_entropy())
    assert len(entropy) == len(du)
    assert sorted(entropy.columns) == sorted(du.columns)
    assert _value_hash(entropy) == _value_hash(du)


def test_char_entropy_both_tails_fire(entropy):
    low = entropy[entropy.entropy_q4 < textops.ENTROPY_LOW_GATE_Q4]
    high = entropy[entropy.entropy_q4 > textops.ENTROPY_HIGH_GATE_Q4]
    mid = entropy[~entropy.entropy_flag]
    assert len(low) > 0 and len(high) > 0 and len(mid) > 0
    assert entropy.entropy_flag.equals(
        (entropy.entropy_q4 < textops.ENTROPY_LOW_GATE_Q4)
        | (entropy.entropy_q4 > textops.ENTROPY_HIGH_GATE_Q4)
    )


def test_char_entropy_planted_schedule(entropy):
    # bucket 0 (repeated 'aaaa ') has exactly one distinct non-space char
    # -> H = 0 exactly; bucket 1 (translated md5 streams, 32 case-folded
    # symbols ~4.6 bits) clears the high gate for EVERY planted doc
    assert (entropy.entropy_q4 >= 0).all()

    def bucket(d):
        return int(hashlib.md5(f"ent|{d}".encode()).hexdigest()[:4], 16) % 6

    b = entropy.doc_id.map(bucket)
    assert (entropy[b == 0].entropy_q4 == 0).all()
    assert (entropy[b == 1].entropy_q4 > textops.ENTROPY_HIGH_GATE_Q4).all()
    assert (~entropy[b >= 2].entropy_flag).all()  # natural text passes


def test_char_entropy_zero_shuffle(spark, docs):
    plan = (
        textops.char_entropy(textops.synthesize_entropy(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# --------------------------------------------------------- url blocklist

@pytest.fixture(scope="module")
def urlf(spark, docs):
    return webclean.url_blocklist_filter(
        webclean.synthesize_url_frontier(docs)
    ).toPandas()


def test_url_blocklist_matches_mirror(urlf):
    du = _duck(webclean.sql_url_blocklist())
    assert len(urlf) == len(du)
    assert sorted(urlf.columns) == sorted(du.columns)
    assert _value_hash(urlf) == _value_hash(du)


def test_url_blocklist_rules_all_fire(urlf):
    assert urlf.domain_blocked.any()
    soft = (~urlf.domain_blocked) & (urlf.url_score_milli >= webclean.URL_SCORE_GATE)
    assert soft.any()
    assert urlf.kept.any()
    # kept is exactly the complement of the two rules
    want = (~urlf.domain_blocked) & (urlf.url_score_milli < webclean.URL_SCORE_GATE)
    assert (urlf.kept == want).all()


def test_url_blocklist_suffix_match(urlf):
    # subdomains of a blocked domain are blocked (ads.tracker-farm.biz)
    sub = urlf[urlf.host == "ads.tracker-farm.biz"]
    assert len(sub) > 0 and sub.domain_blocked.all()


def test_url_blocklist_zero_shuffle(spark, docs):
    plan = (
        webclean.url_blocklist_filter(webclean.synthesize_url_frontier(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_script_ratios_zero_shuffle(spark, docs):
    plan = (
        textops.script_ratios(textops.synthesize_scripts(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
