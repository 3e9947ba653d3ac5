"""Corpus data card (operators/report.corpus_report): section semantics
on a constructed fixture, exact-quantile correctness, and the
sketch-vs-exact contract flags."""

import math

from pyspark.sql import functions as F

from cloudbrush_spark.operators.report import corpus_report

# words long enough to dodge the stopword list, with English markers so
# lang_pred lands on 'en' for half the docs
EN = "the and is of to in that it was for on are with as"


def _docs(spark):
    rows = []
    for i in range(40):
        body = " ".join(f"word{j}" for j in range(5 + i % 7))
        text = f"{EN} {body}" if i % 2 == 0 else body
        # docs 30..39 duplicate docs 0..9's text exactly
        if i >= 30:
            j = i - 30
            jbody = " ".join(f"word{k}" for k in range(5 + j % 7))
            text = f"{EN} {jbody}" if j % 2 == 0 else jbody
        rows.append((i, text, f"src{i % 4}"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_corpus_report_sections(spark):
    docs = _docs(spark)
    rows = corpus_report(docs).collect()
    by = {}
    for r in rows:
        by.setdefault(r.k1, {})[r.k2] = r

    # volumes: every source leg sums back to the corpus totals
    assert sum(r.v1 for r in by["source"].values()) == 40
    assert by["corpus"]["all"].v1 == 40
    ws = {r.doc_id: len(r.text.split()) for r in docs.collect()}
    assert by["corpus"]["all"].v2 == sum(ws.values())
    assert sum(r.v2 for r in by["source"].values()) == sum(ws.values())
    assert set(by["source"]) == {"src0", "src1", "src2", "src3"}

    # histograms partition the corpus
    assert sum(r.v1 for r in by["lang"].values()) == 40
    assert sum(r.v1 for r in by["quality_decile"].values()) == 40
    assert sum(r.v1 for r in by["len_bits"].values()) == 40
    # len_bits is the integer log2 bucket: doc i=1 (no EN prefix) has
    # 6 tokens -> bin(6)='110' -> bucket '3'
    assert by["len_bits"][str(len(bin(ws[1])) - 2)].v1 >= 1

    # exact-dup accounting (the fixture's bodies cycle mod 7 under two
    # prefix variants, so distinctness comes from the texts themselves)
    n_distinct = len({r.text for r in docs.collect()})
    assert 0 < n_distinct < 40
    assert by["dup"]["exact_fp"].v1 == n_distinct
    assert by["dup"]["exact_fp"].v2 == 40 - n_distinct

    # sketch contracts hold at this scale
    assert by["sketch"]["distinct_fp"].v1 == n_distinct
    assert by["sketch"]["distinct_fp"].v3 == 1
    assert all(r.v3 == 1 for r in by["tokens_q"].values())

    # exact discrete quantiles: smallest ws with cum >= ceil(p*n/100)
    svals = sorted(ws.values())
    for pct, name in ((25, "p25"), (50, "p50"), (75, "p75"), (90, "p90")):
        want = svals[math.ceil(pct * 40 / 100) - 1]
        assert by["tokens_q"][name].v1 == want, name


def test_corpus_report_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = corpus_report(docs)
    b = corpus_report(docs.repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --- heavy_tokens (late r8): frequent-items sketch contract ----------------

def test_heavy_tokens_threshold_is_strict_and_exact(spark):
    from cloudbrush_spark.operators.report import heavy_tokens
    # 100 tokens total: 'hot' 40, 'warm' 25, 'edge' 2 (exactly 2%,
    # strict > excludes it), 33 singletons
    texts = (["hot"] * 40 + ["warm"] * 25 + ["edge"] * 2
             + [f"rare{i}" for i in range(33)])
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.tok: (r.cnt, r.fi_ok) for r in heavy_tokens(docs).collect()}
    assert got == {"hot": (40, 1), "warm": (25, 1)}  # edge at exactly 2% is OUT


def test_heavy_tokens_rejects_support_at_or_above_threshold(spark):
    import pytest as _pytest
    from cloudbrush_spark.operators.report import heavy_tokens
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        heavy_tokens(docs, threshold_pct=2, fi_support=0.02)
    with _pytest.raises(ValueError):
        heavy_tokens(docs, threshold_pct=2, fi_support=0.05)
