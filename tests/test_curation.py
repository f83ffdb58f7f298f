"""Semantics tests for the corpus-curation operators (curation.py):
decontamination, deterministic mixing, repetition signals, IDF."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.curation import (
    BENCH_MOD,
    DECONTAM_N,
    MIX_RATES,
    word_ngrams,
)

from conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_word_ngrams_matches_python(spark):
    """Column-expression n-grams == the obvious Python sliding window."""
    rows = (
        _docs(spark)
        .limit(20)
        .select("doc_id", "text", word_ngrams(F.col("text"), 3).alias("grams"))
        .collect()
    )
    assert rows
    for r in rows:
        w = r.text.split(" ")
        expect = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
        assert r.grams == expect


def test_decontam_survivors_share_no_benchmark_gram(spark):
    """No surviving doc shares a 5-gram with any benchmark doc, and every
    non-benchmark doc that shares none survives (exact partition)."""
    docs = {r.doc_id: r.text for r in _docs(spark).collect()}

    def grams(text):
        w = text.split(" ")
        return {
            " ".join(w[i : i + DECONTAM_N]) for i in range(len(w) - DECONTAM_N + 1)
        }

    bench = set()
    for did, text in docs.items():
        if did % BENCH_MOD == 0:
            bench |= grams(text)
    expect = sorted(
        did
        for did, text in docs.items()
        if did % BENCH_MOD != 0 and not (grams(text) & bench)
    )
    got = [
        r.doc_id for r in REGISTRY["q_x8_decontam"].spark(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the benchmark subset must be non-empty or the test is vacuous
    assert any(did % BENCH_MOD == 0 for did in docs)


def test_mix_is_deterministic_md5_of_doc_id(spark):
    """Kept set == the Python md5 rule, and unlisted langs are dropped."""
    rows = _docs(spark).select("doc_id", "lang").collect()

    def kept(doc_id, lang):
        rate = MIX_RATES.get(lang, 0)
        if rate >= 256:
            return True
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)
        return bucket < rate

    expect = sorted(r.doc_id for r in rows if kept(r.doc_id, r.lang))
    got = [r.doc_id for r in REGISTRY["q_x9_mix"].spark(spark, SF_SMOKE).collect()]
    assert got == expect
    # full-rate language is kept in full
    en_total = sum(1 for r in rows if r.lang == "en")
    en_kept = sum(1 for r in rows if r.lang == "en" and r.doc_id in set(got))
    assert en_kept == en_total


def test_repetition_fractions_bounded_and_exact_for_known_doc(spark):
    out = {
        r.doc_id: r
        for r in REGISTRY["q_text_repetition"].spark(spark, SF_SMOKE).collect()
    }
    assert out
    for r in out.values():
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_word_frac <= 1.0
    # cross-check one doc against Python
    doc = _docs(spark).orderBy("doc_id").first()
    w = doc.text.split(" ")
    bigrams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
    dup = round(1.0 - len(set(bigrams)) / len(bigrams), 4)
    top = round(max(w.count(x) for x in set(w)) / len(w), 4)
    got = out[doc.doc_id]
    assert abs(got.dup_bigram_frac - dup) < 1e-9
    assert abs(got.top_word_frac - top) < 1e-9


def test_idf_matches_python_counts(spark):
    docs = [r.text for r in _docs(spark).collect()]
    df_counts: dict[str, int] = {}
    for text in docs:
        for w in set(text.split(" ")):
            df_counts[w] = df_counts.get(w, 0) + 1
    expect = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = REGISTRY["q_x10_idf"].spark(spark, SF_SMOKE).collect()
    assert [(r.w, r.df) for r in got] == expect
    n = len(docs)
    for r in got:
        assert abs(r.idf - round(math.log(n / r.df), 4)) < 1e-9
