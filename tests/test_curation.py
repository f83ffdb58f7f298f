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


def test_pack_bins_respect_capacity_and_order(spark):
    """Sequence packing invariants: (1) a document's bin is derived from
    the running token count of strictly-smaller doc_ids in its shard;
    (2) within a shard, bin ids are non-decreasing in doc_id order and
    every bin's preceding fill is under capacity when it opens."""
    from neo4j_blue_green_arrow_etl_spark.operators.pipeline import (
        PACK_CAPACITY,
        PACK_SHARDS,
        _PACK_BIN_STRIDE,
    )

    rows = REGISTRY["q_x11_pack"].spark(spark, SF_SMOKE).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        by_shard.setdefault(r.doc_id % PACK_SHARDS, []).append(r)
    for shard, docs in by_shard.items():
        cum = 0
        prev_bin = -1
        for r in docs:
            expect_bin = shard * _PACK_BIN_STRIDE + cum // PACK_CAPACITY
            assert r.bin_id == expect_bin
            assert r.bin_id >= prev_bin  # greedy fill never reopens a bin
            prev_bin = r.bin_id
            cum += r.n_tokens


def test_triangles_match_bruteforce(spark):
    """Per-node triangle counts == brute-force enumeration over the
    co-reference pair graph computed in Python."""
    from neo4j_blue_green_arrow_etl_spark.operators.graph import _coref_pairs

    pairs = {(r.src, r.peer) for r in _coref_pairs(spark, SF_SMOKE).collect()}
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    counts: dict[str, int] = {}
    for a, b in pairs:
        for c in adj.get(b, set()):
            if (a, c) in pairs:
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    got = {
        r.nodeId: r.n_triangles
        for r in REGISTRY["q_g4_triangles"].spark(spark, SF_SMOKE).collect()
    }
    assert got == counts


def test_pagerank_matches_pure_python(spark):
    """Distributed power iteration == the obvious Python implementation
    (same damping, iterations, dangling redistribution), and total rank
    mass stays 1."""
    from neo4j_blue_green_arrow_etl_spark import fixtures as FX
    from neo4j_blue_green_arrow_etl_spark.operators.graph import (
        PAGERANK_DAMPING,
        PAGERANK_ITERATIONS,
        pagerank,
    )

    e = [
        (r.sourceNodeId, r.targetNodeId)
        for r in FX.edges(spark, SF_SMOKE)
        .select("sourceNodeId", "targetNodeId")
        .collect()
    ]
    nodes = sorted({n for pair in e for n in pair})
    n = len(nodes)
    deg: dict[str, int] = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(PAGERANK_ITERATIONS):
        contrib = {v: 0.0 for v in nodes}
        for s, t in e:
            contrib[t] += rank[s] / deg[s]
        dang = sum(rank[v] for v in nodes if v not in deg)
        rank = {
            v: (1.0 - PAGERANK_DAMPING) / n
            + PAGERANK_DAMPING * (contrib[v] + dang / n)
            for v in nodes
        }
    got = {
        r.node: r.rank
        for r in pagerank(
            FX.edges(spark, SF_SMOKE).select("sourceNodeId", "targetNodeId")
        ).collect()
    }
    assert set(got) == set(rank)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_sample_exact_k_per_group_and_deterministic(spark):
    """q_x13_sample returns exactly min(k, group size) docs per language
    and the same set on every run."""
    from neo4j_blue_green_arrow_etl_spark.operators.curation import SAMPLE_K

    a = REGISTRY["q_x13_sample"].spark(spark, SF_SMOKE).collect()
    b = REGISTRY["q_x13_sample"].spark(spark, SF_SMOKE).collect()
    assert [(r.doc_id, r.lang) for r in a] == [(r.doc_id, r.lang) for r in b]
    sizes: dict[str, int] = {}
    for r in a:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    group_sizes = {
        r.lang: r.n
        for r in _docs(spark).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in group_sizes.items():
        assert sizes.get(lang, 0) == min(SAMPLE_K, n)


def test_spandedup_matches_bruteforce(spark):
    """Per-doc passage dup counts equal a local first-occurrence scan
    over the same non-overlapping word windows."""
    from collections import defaultdict

    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        SPAN_WORDS,
        q_x23_spandedup,
    )

    got = {
        r.doc_id: (r.n_passages, r.n_dup)
        for r in q_x23_spandedup(spark, SF_SMOKE).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .orderBy("doc_id")
        .collect()
    )
    seen = set()
    want = defaultdict(lambda: [0, 0])
    for d in docs:  # doc_id ascending == first-occurrence order
        toks = d.text.split(" ")
        for p in range(len(toks) // SPAN_WORDS):
            passage = " ".join(toks[p * SPAN_WORDS : (p + 1) * SPAN_WORDS])
            want[d.doc_id][0] += 1
            if passage in seen:
                want[d.doc_id][1] += 1
            seen.add(passage)
    assert got == {k: tuple(v) for k, v in want.items() if v[0] > 0}


def test_overlap_zero_iff_decontam_survivor(spark):
    """q_x26_overlap and q_x8_decontam must agree: a non-benchmark doc
    survives binary decontamination exactly when its graded overlap
    fraction is zero (docs too short to form any n-gram appear only in
    q_x8's survivor list)."""
    overlap = REGISTRY["q_x26_overlap"].spark(spark, SF_SMOKE)
    survivors = REGISTRY["q_x8_decontam"].spark(spark, SF_SMOKE)
    zero_docs = overlap.filter(F.col("n_matched") == 0).select("doc_id")
    contaminated = overlap.filter(F.col("n_matched") > 0).select("doc_id")
    # every zero-overlap doc survives; every contaminated doc is dropped
    assert zero_docs.join(survivors, "doc_id", "left_anti").isEmpty()
    assert contaminated.join(survivors, "doc_id", "left_semi").isEmpty()
    # fraction is consistent with its own numerator/denominator
    assert overlap.filter(
        F.abs(
            F.col("overlap_frac")
            - F.round(F.col("n_matched") / F.col("n_grams"), 4)
        )
        > 1e-9
    ).isEmpty()


def test_qbucket_tertiles_partition_each_language(spark):
    """q_x27_qbucket: per language the three buckets partition the doc
    count (sizes differ by at most one) and mean scores are ordered
    head >= middle >= tail."""
    res = REGISTRY["q_x27_qbucket"].spark(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per_lang = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang: dict[str, dict[str, tuple[int, float]]] = {}
    for r in res:
        by_lang.setdefault(r.lang, {})[r.bucket] = (r.n_docs, r.avg_score)
    for lang, buckets in by_lang.items():
        sizes = [buckets[b][0] for b in ("head", "middle", "tail") if b in buckets]
        assert sum(sizes) == per_lang[lang]
        assert max(sizes) - min(sizes) <= 1
        scores = [
            buckets[b][1] for b in ("head", "middle", "tail") if b in buckets
        ]
        assert scores == sorted(scores, reverse=True)


def test_pmi_threshold_and_identity(spark):
    """q_x28_pmi: every output bigram meets the relative-support
    threshold, and a recomputation of one pair's PMI from raw counts
    matches the reported value."""
    import math

    from neo4j_blue_green_arrow_etl_spark.operators.textops import (
        PMI_SUPPORT_DENOM,
    )

    rows = REGISTRY["q_x28_pmi"].spark(spark, SF_SMOKE).collect()
    assert rows, "threshold must keep the query non-trivial at sf0.001"
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    uni = {r.w: r.n for r in words.groupBy("w").agg(F.count("*").alias("n")).collect()}
    nu = sum(uni.values())
    nb = nu - docs.count()  # each doc contributes len-1 bigrams
    for r in rows:
        assert r.cxy * PMI_SUPPORT_DENOM >= nb
    r = max(rows, key=lambda r: (r.cxy, r.w1, r.w2))
    want = math.log2((r.cxy / nb) / ((uni[r.w1] / nu) * (uni[r.w2] / nu)))
    assert abs(r.pmi - round(want, 4)) < 1e-9


def test_word_ngrams_short_documents_yield_empty(spark):
    """Documents shorter than n words must produce an empty gram array,
    not a Spark slice() crash (sequence(1, 0) is DESCENDING [1, 0])."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        word_ngrams,
    )

    df = spark.createDataFrame(
        [("hello",), ("a b",), ("a b c d e f",), ("",)], "text string"
    )
    got = [r.g for r in df.select(word_ngrams(F.col("text"), 5).alias("g")).collect()]
    assert got == [[], [], ["a b c d e", "b c d e f"], []]


def test_tempmix_rates_and_invariants(spark):
    """q_x40_tempmix: the alpha=0.5 temperature rule. The smallest
    language keeps everything (rate 1); keep rates are antitone in
    corpus share; every reported rate equals sqrt(p_min/p_g) to the
    rounding the query promises; kept counts never exceed corpus size."""
    out = {r.lang: r for r in REGISTRY["q_x40_tempmix"].spark(spark, SF_SMOKE).collect()}
    assert out, "fixture must have at least one language"
    n = {s: r.n_docs for s, r in out.items()}
    nmin = min(n.values())
    smallest = [s for s in n if n[s] == nmin]
    for s in smallest:
        assert out[s].keep_rate == 1.0
        assert out[s].n_kept == out[s].n_docs
    for s, r in out.items():
        want = round(math.sqrt(nmin / n[s]), 6)
        assert abs(r.keep_rate - want) < 1e-9, (s, r.keep_rate, want)
        assert 0 <= r.n_kept <= r.n_docs
    # antitone: bigger language -> smaller-or-equal keep rate
    by_size = sorted(out.values(), key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        assert a.keep_rate >= b.keep_rate
    # the fixture's language mix is skewed, so the rule must actually
    # squash something — guards against a degenerate uniform grouping
    assert any(r.keep_rate < 1 for r in out.values())


def test_epochmix_factors_and_bounds(spark):
    """q_x41_epochmix: the largest language runs exactly one epoch and
    emits each doc exactly once; every language's emitted count lies in
    [floor(ep)*n, (floor(ep)+1)*n]; factors are antitone in size."""
    out = {r.lang: r for r in REGISTRY["q_x41_epochmix"].spark(spark, SF_SMOKE).collect()}
    assert out
    nmax = max(r.n_docs for r in out.values())
    for r in out.values():
        want = round(math.sqrt(nmax / r.n_docs), 6)
        assert abs(r.epochs - want) < 1e-9
        whole = math.floor(math.sqrt(nmax / r.n_docs))
        assert whole * r.n_docs <= r.n_emitted <= (whole + 1) * r.n_docs
        if r.n_docs == nmax:
            assert r.epochs == 1.0 and r.n_emitted == r.n_docs
    by_size = sorted(out.values(), key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        assert a.epochs >= b.epochs


def test_tokenbudget_single_bin_corpus_sharded_window(spark):
    """VERDICT r10 task 4: a quality-DEGENERATE corpus (every doc in
    ONE quality bin) used to push the entire corpus through the
    boundary bin's unpartitioned Window.orderBy(doc_id). The boundary
    running sum is now a sharded prefix sum: same greedy-by-id output,
    and the doc-row window is partitioned by the id-range shard — the
    only single-partition windows left are the bounded summaries
    (<= _BUDGET_BINS histogram rows, <= _BOUNDARY_SHARDS offset rows)."""
    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        token_budget_select,
    )

    n = 500
    chars = [10 + (i * 7) % 13 for i in range(n)]
    docs = spark.createDataFrame(
        [(i, c, 0) for i, c in enumerate(chars)],
        "doc_id long, n_chars long, qbin int",
    )
    out = token_budget_select(docs)
    # correctness: single bin -> greedy prefix in doc_id order
    budget = math.floor(sum(chars) * 0.6)
    want, rs = set(), 0
    for i, c in enumerate(chars):
        if rs + c > budget:
            break
        rs += c
        want.add(i)
    got = out.collect()
    assert {r.doc_id for r in got} == want
    # plan hygiene: no window ordered by doc_id without a partition
    # spec (the old single-reducer shape); the _local_rs window is
    # partitioned by _shard
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(doc_id" not in plan
    local_rs_lines = [
        ln for ln in plan.splitlines() if "AS _local_rs" in ln
    ]
    assert local_rs_lines and all(
        "windowspecdefinition(_shard" in ln for ln in local_rs_lines
    )


def test_tokenbudget_matches_python_reference(spark):
    """q_x42_tokenbudget: the two-phase histogram selection must equal
    the obvious sequential greedy — order all docs by (quality desc,
    doc_id), keep while the running char total fits the 60% budget."""
    rows = (
        _docs(spark)
        .select("doc_id", "n_chars", "text")
        .collect()
    )
    scored = []
    for r in rows:
        w = r.text.split(" ")
        scored.append((math.floor(len(set(w)) / len(w) * 1000), r.doc_id, r.n_chars))
    budget = math.floor(sum(c for _, _, c in scored) * 0.6)
    want, rs = set(), 0
    for qb, did, c in sorted(scored, key=lambda t: (-t[0], t[1])):
        if rs + c > budget:
            break
        rs += c
        want.add(did)
    got = REGISTRY["q_x42_tokenbudget"].spark(spark, SF_SMOKE).collect()
    assert {r.doc_id for r in got} == want
    assert sum(r.n_chars for r in got) <= budget
