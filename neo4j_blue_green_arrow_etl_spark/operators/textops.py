"""Text analysis operators over the documents table.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting. Everything is built from JVM-side column
expressions (split/filter/aggregate higher-order functions) — no Python
UDFs — so the operators stay inside whole-stage codegen and scale
linearly with one scan and zero shuffles (all are per-row maps followed
by optional aggregation).

The langid/quality/fingerprint oracles are GENERATED from the same
constants as the Spark side (stopword lists, score formula, hash
parameters) so the two implementations cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import barrier_sort, register, rescue_parallelism

# Ordered: earlier wins score ties (argmax tie-break is deterministic).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "los", "que", "y"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "les", "des", "et", "est", "une"),
    "zh": ("的", "是", "了", "在", "和"),
}
PUNCT_CLASS = "[^.,;:!?]"
FP_MOD = 1_000_000_007
FP_MUL = 31


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain read: most textops are light per-row maps where a rescue
    # repartition costs more than the single-core scan it parallelizes
    # (measured: +0.1-0.5s each across the family) — only the char-gram
    # explode (q_x37) repays it; that call site opts in explicitly
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register(
    "q_x3_lang",
    oracle=(
        "SELECT lang, COUNT(*) AS cnt, ROUND(AVG(n_chars), 2) AS avg_chars "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    doc="Corpus profile: doc count and mean length per language tag.",
)
def q_x3_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
        .orderBy("lang")
    )


@register(
    "q_x3_tokens",
    oracle=(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    doc="Whitespace token count per document (token-budget accounting).",
)
def q_x3_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ).orderBy("doc_id")


def _contains_any(words: tuple[str, ...]):
    """One-arg lambda factory for higher-order F.filter (a default-arg
    closure would change the lambda's arity and make PySpark pass the
    element index as the second argument)."""
    arr = [F.lit(w) for w in words]

    def pred(x):
        return F.array_contains(F.array(*arr), x)

    return pred


def _score_case_sql() -> str:
    """Shared CASE expression choosing the argmax language from score
    columns s_<lang> (ties -> earlier lang in STOPWORDS order; all-zero
    -> 'unknown'). Valid in both Spark SQL and DuckDB."""
    langs = list(STOPWORDS)
    zero = " AND ".join(f"s_{l} = 0" for l in langs)
    whens = []
    for i, l in enumerate(langs):
        conds = [f"s_{l} >= s_{o}" for o in langs if o != l]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{l}'")
    return f"CASE WHEN {zero} THEN 'unknown' {' '.join(whens)} ELSE 'unknown' END"


def _langid_oracle() -> str:
    score_cols = ", ".join(
        "len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{', '.join(repr(w) for w in ws)}], x))) AS s_{l}"
        for l, ws in STOPWORDS.items()
    )
    return (
        f"WITH scored AS (SELECT doc_id, lang, {score_cols} FROM documents) "
        f"SELECT doc_id, lang AS tagged_lang, {_score_case_sql()} AS predicted_lang "
        f"FROM scored ORDER BY doc_id"
    )


@register(
    "q_text_langid",
    oracle=_langid_oracle(),
    doc="Heuristic language ID: stopword-hit argmax over per-language "
    "lists; deterministic tie-break. Pure higher-order array expressions "
    "(filter + isin), one scan, no shuffle.",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(toks, _contains_any(ws))).alias(f"s_{l}")
            for l, ws in STOPWORDS.items()
        ],
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("tagged_lang"),
        F.expr(_score_case_sql()).alias("predicted_lang"),
    ).orderBy("doc_id")


def _quality_oracle() -> str:
    en = ", ".join(repr(w) for w in STOPWORDS["en"])
    return (
        "WITH m AS (SELECT doc_id, "
        "len(string_split(text, ' ')) AS n_tokens, "
        f"length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS n_punct, "
        "length(text) AS n_chars_m, "
        "len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{en}], x))) AS n_stop FROM documents) "
        "SELECT doc_id, n_tokens, "
        "n_punct * 1.0 / NULLIF(n_chars_m, 0) AS punct_ratio, "
        "n_stop * 1.0 / NULLIF(n_tokens, 0) AS stopword_ratio, "
        "(1.0 - n_punct * 1.0 / NULLIF(n_chars_m, 0)) * "
        "LEAST(1.0, n_tokens * 1.0 / 100.0) AS quality_score "
        "FROM m ORDER BY doc_id"
    )


@register(
    "q_text_quality",
    oracle=_quality_oracle(),
    doc="Quality scoring: token count, punctuation ratio, stopword ratio, "
    "and a composite score (reference-free heuristics typical of pretrain "
    "data filtering). Per-row map, no shuffle.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    n_chars_m = F.length("text")
    n_stop = F.size(
        F.filter(
            F.split(F.lower("text"), " "),
            lambda x: F.array_contains(F.array(*[F.lit(w) for w in STOPWORDS["en"]]), x),
        )
    )
    punct_ratio = n_punct / F.nullif(n_chars_m, F.lit(0))
    stop_ratio = n_stop / F.nullif(n_tokens, F.lit(0))
    # raw doubles: per-row division is bit-identical across engines;
    # ROUND() tie-breaking is not (see q_f3)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ((F.lit(1.0) - punct_ratio) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))).alias(
            "quality_score"
        ),
    ).orderBy("doc_id")


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over whitespace tokens:
    h = fold(h * 31 + (len(tok) * 131 + ascii(first) * 7 + ascii(last))) mod p.
    Integer math stays < 2^63 (ANSI-safe) and is engine-portable."""
    def step(acc: Column, t: Column) -> Column:
        tv = (
            F.length(t) * 131
            + F.ascii(F.substring(t, 1, 1)) * 7
            + F.ascii(F.substring(t, -1, 1))
        )
        return (acc * FP_MUL + tv) % FP_MOD

    return F.aggregate(F.split(text, " "), F.lit(0).cast("long"), step)


def _fingerprint_oracle() -> str:
    return (
        "SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(text, ' '), "
        "t -> CAST(length(t) * 131 + unicode(t[1]) * 7 + unicode(t[-1]) AS BIGINT))), "
        f"(acc, tv) -> (acc * {FP_MUL} + tv) % {FP_MOD}) AS fingerprint "
        "FROM documents ORDER BY doc_id"
    )


@register(
    "q_text_fingerprint",
    oracle=_fingerprint_oracle(),
    doc="Document fingerprint: polynomial rolling hash folded over tokens "
    "(mod 1e9+7, multiplier 31). Same fold, same parameters on both "
    "engines; per-row map, no shuffle.",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", fingerprint_col(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the split GPT-2-style byte-pair encoders apply before merges. Kept to
# ASCII classes so Java (Spark) and RE2 (DuckDB) agree exactly.
BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "q_text_tokens_bpe",
    oracle=(
        "SELECT doc_id, CAST(length(regexp_extract_all(text, "
        f"'{BPE_SPLIT}')) AS BIGINT) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    doc="BPE-ish token counting (north-star text analysis): "
    "regexp_extract_all with a GPT-2-style pre-tokenizer split, counted "
    "per document. Complements q_x3_tokens (whitespace count). Per-row "
    "map inside codegen, no shuffle, scan pruned to (doc_id, text).",
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
    ).orderBy("doc_id")


# PII redaction: email + NANP-ish phone patterns, ASCII classes only so
# Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"


@register(
    "q_text_redact",
    oracle=(
        "WITH aug AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) "
        "|| '@example.com or +1-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t "
        "FROM documents) "
        f"SELECT doc_id, "
        f"len(regexp_extract_all(t, '{EMAIL_RE}')) + len(regexp_extract_all(t, '{PHONE_RE}')) AS n_pii, "
        f"sha256(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PHONE_RE}', '<PHONE>', 'g')) AS redacted_sha "
        "FROM aug ORDER BY doc_id"
    ),
    doc="PII redaction (training-data pipeline staple): email and phone "
    "patterns counted then replaced with placeholder tokens. The PII is "
    "synthesized deterministically per doc (the corpus has none) so the "
    "redaction provably fires; the sha256 of the redacted text pins the "
    "full output byte-for-byte. Per-row regex map: no shuffle, codegen, "
    "scan pruned to (doc_id, text).",
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    n_pii = (
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
    ).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        n_pii.alias("n_pii"),
        F.sha2(redacted, 256).alias("redacted_sha"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Model inference as column math: linear quality classifier
# ---------------------------------------------------------------------------

# Fixed demo weights: (intercept, n_words, mean_word_len, stopword_ratio,
# upper_ratio). A trained model exports exactly this shape.
QC_W = (-1.2, 0.004, 0.35, 1.8, -2.5)
QC_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")


@register(
    "q_x17_score",
    oracle=(
        "WITH f AS (SELECT doc_id, "
        "  len(string_split(text, ' ')) AS n_words, "
        "  length(replace(text, ' ', '')) * 1.0 "
        "    / len(string_split(text, ' ')) AS mean_wlen, "
        "  len(list_filter(string_split(text, ' '), "
        f"    w -> list_contains({list(QC_STOPWORDS)!r}, w))) * 1.0 "
        "    / len(string_split(text, ' ')) AS stop_ratio, "
        "  len(list_filter(string_split(text, ''), "
        "    c -> c >= 'A' AND c <= 'Z')) * 1.0 / length(text) AS upper_ratio "
        "FROM documents) "
        "SELECT doc_id, ROUND(1.0 / (1.0 + exp(-("
        f"  {QC_W[0]} + {QC_W[1]} * n_words + {QC_W[2]} * mean_wlen "
        f"  + {QC_W[3]} * stop_ratio + {QC_W[4]} * upper_ratio))), 6) AS quality "
        "FROM f ORDER BY doc_id"
    ),
    doc="Model inference as column math: a linear quality classifier "
    "(fixed exported weights over length/word-shape/stopword/case "
    "features) evaluated as ONE codegen'd projection — sigmoid(w.x) "
    "with every feature derived in the same stage. Map-only: no "
    "shuffle, no Python, scales with scan bandwidth; at 100 TB this is "
    "how a distilled quality model scores a corpus (heavier models "
    "slot into the same position as an Arrow-batched mapInPandas, cf. "
    "q_mm_features). Weights are data, not code: swapping a retrained "
    "model changes only the literal vector.",
)
def q_x17_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words)
    no_space = F.replace(F.col("text"), F.lit(" "), F.lit(""))
    mean_wlen = F.length(no_space) / n_words
    stop_ratio = F.size(
        F.filter(words, lambda w: w.isin(*QC_STOPWORDS))
    ) / n_words
    upper_ratio = F.size(
        F.filter(F.split("text", ""), lambda c: (c >= "A") & (c <= "Z"))
    ) / F.length("text")
    z = (
        F.lit(QC_W[0])
        + F.lit(QC_W[1]) * n_words
        + F.lit(QC_W[2]) * mean_wlen
        + F.lit(QC_W[3]) * stop_ratio
        + F.lit(QC_W[4]) * upper_ratio
    )
    return d.select(
        "doc_id", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("quality")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Hashing-trick featurization (fixed-width sparse features from text)
# ---------------------------------------------------------------------------

FEAT_BUCKETS = 32  # feature-vector width


@register(
    "q_x19_feathash",
    oracle=(
        "SELECT doc_id, bucket, COUNT(*) AS cnt FROM ("
        "  SELECT doc_id, CAST("
        "    ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT "
        f"    % {FEAT_BUCKETS} AS INT) AS bucket "
        "  FROM documents) "
        "GROUP BY doc_id, bucket ORDER BY doc_id, bucket"
    ),
    doc=f"Hashing-trick featurizer: every word hashes into one of "
    f"{FEAT_BUCKETS} buckets and the per-(doc, bucket) count is the "
    "sparse feature value — fixed feature width with NO vocabulary "
    "build, the property that matters at 100 TB (a vocab dictionary is "
    "itself a giant shuffle + broadcast; the hash needs neither). "
    "Long-form output (doc_id, bucket, cnt); explode -> partial-agg "
    "keeps shuffle rows bounded by docs x distinct buckets <= docs x "
    f"{FEAT_BUCKETS}. NOTE the two engines hash differently, so the "
    "oracle pins STRUCTURE not hash identity: both sides bucket by "
    "their OWN 64-bit hash mod N... which would diverge. Instead both "
    "sides use the SAME portable hash: see the Spark body — xxhash64 "
    "is Spark-specific, so the portable form takes the first 8 hex "
    "chars (32 bits) of md5 over the UTF-8 bytes, available and "
    "bit-identical in both engines.",
)
def q_x19_feathash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.encode(F.col("w"), "UTF-8")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(FEAT_BUCKETS),
    )
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .select("doc_id", bucket.cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


# ---------------------------------------------------------------------------
# Bigram PMI (collocation / association mining)
# ---------------------------------------------------------------------------

PMI_SUPPORT_DENOM = 1000  # keep bigrams with count >= total/DENOM


@register(
    "q_x28_pmi",
    oracle=(
        "WITH words AS ("
        " SELECT doc_id, unnest(string_split(text, ' ')) AS w,"
        " unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos"
        " FROM documents"
        "), uni AS (SELECT w, COUNT(*) AS cw FROM words GROUP BY w"
        "), bi AS ("
        " SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cxy"
        " FROM words a JOIN words b"
        " ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
        " GROUP BY 1, 2"
        "), tot AS ("
        " SELECT (SELECT SUM(cw) FROM uni) AS nu,"
        " (SELECT SUM(cxy) FROM bi) AS nb"
        ") SELECT bi.w1, bi.w2, bi.cxy, "
        "ROUND(log2((bi.cxy / CAST(tot.nb AS DOUBLE)) / "
        "((u1.cw / CAST(tot.nu AS DOUBLE)) * (u2.cw / CAST(tot.nu AS DOUBLE))"
        ")), 4) + 0.0 AS pmi "  # +0.0 folds IEEE -0.0 to 0.0
        "FROM bi, tot "
        "JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w "
        f"WHERE bi.cxy * {PMI_SUPPORT_DENOM} >= tot.nb "
        "ORDER BY w1, w2"
    ),
    doc="Pointwise mutual information of adjacent word pairs — the "
    "classic collocation score (log2 of observed bigram probability "
    "over the independence expectation), the signal behind phrase "
    "mining and tokenizer-merge candidates. Relative support (count >= "
    f"total/{PMI_SUPPORT_DENOM}) bounds the output to real collocations "
    "and is scale-invariant — the same query is non-trivial at sf0.001 "
    "and at 100 TB. Plan: ONE scan explodes "
    "per-doc bigram arrays (map-side combine makes the shuffle carry "
    "(bigram, partial count), bounded by vocabulary^2 observed, not "
    "token count); unigram counts from a second explode of the same "
    "scan; the two corpus totals ride a one-row broadcast and the "
    "unigram table broadcasts onto the (far smaller) thresholded "
    "bigram table. Scale: vocabulary-sized shuffles, token-sized "
    "scans — the same partial-agg discipline as q_x20_tokfreq.",
)
def q_x28_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .curation import word_ngrams

    d = _docs(spark, sf_dir)
    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    uni = words.groupBy("w").agg(F.count("*").alias("cw"))
    bigrams = d.select(
        F.explode(word_ngrams(F.col("text"), 2)).alias("bg")
    ).filter(F.size(F.split(F.col("bg"), " ")) == 2)
    bi_all = bigrams.groupBy("bg").agg(F.count("*").alias("cxy"))
    # Totals WITHOUT re-aggregating the aggregates (each DataFrame
    # reference recompiles its scan subtree): nu = total token count in
    # one cheap pruned scan, and nb = nu - ndocs because a doc with w
    # words contributes exactly w-1 adjacent pairs.
    n_words = F.sum(F.size(F.split(F.col("text"), " ")))
    totals = d.agg(
        n_words.alias("nu"), (n_words - F.count("*")).alias("nb")
    )
    bi = bi_all.select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        "cxy",
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    return (
        bi.join(F.broadcast(totals))
        .filter(F.col("cxy") * PMI_SUPPORT_DENOM >= F.col("nb"))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            "cxy",
            (
                F.round(
                    F.log2(
                        (F.col("cxy") / F.col("nb").cast("double"))
                        / (
                            (F.col("cw1") / F.col("nu").cast("double"))
                            * (F.col("cw2") / F.col("nu").cast("double"))
                        )
                    ),
                    4,
                )
                + 0.0  # fold IEEE -0.0 to 0.0, matching the oracle
            ).alias("pmi"),
        )
        .transform(barrier_sort("w1", "w2"))
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (KenLM-style corpus perplexity signal)
# ---------------------------------------------------------------------------

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ts))) AS t(i)
), c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
), allw AS (
  SELECT unnest(ts) AS w FROM toks
), v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM allw
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 3) AS avg_logp
FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY bg.doc_id ORDER BY bg.doc_id
"""


@register(
    "q_x32_lmscore",
    oracle=_LM_ORACLE,
    doc="Bigram language-model scoring: train add-one-smoothed bigram "
    "probabilities ON the corpus itself, then score every document by "
    "its mean log P(w2|w1) — the KenLM-shaped quality filter (docs with "
    "very low LM score under an in-domain model are boilerplate/noise; "
    "CCNet/RefinedWeb use exactly this signal). Spark: bigrams come "
    "from arrays_zip(slice,slice) — map-only, no positional self-join; "
    "counts are two partial-aggregated shuffles (bigram, then first "
    "word); the vocab size is a one-row broadcast. Scoring joins the "
    "doc bigrams to the count tables on their natural keys — both "
    "shuffle-equi-joins on bounded-cardinality vocab keys, then one "
    "per-doc aggregation. Scale: state is O(vocab + bigram vocab), "
    "input passes are linear, and every join key is a token (Zipf-skew "
    "handled by AQE skew split on the hot stopword bigrams).",
)
def q_x32_lmscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    n = F.size("ts")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, n - 1).alias("w1"),
                F.slice("ts", 2, n - 1).alias("w2"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = toks.select(F.explode("ts").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))), 3
            ).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (round 4)
# ---------------------------------------------------------------------------

BM25_QUERY = ("fast", "hash", "join", "spark")  # the query term bag
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

_BM25_TERMS_SQL = ", ".join(f"('{t}')" for t in BM25_QUERY)

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), dl AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl
), q(term) AS (VALUES {_BM25_TERMS_SQL}),
tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ts) AS w FROM toks)
  WHERE w IN (SELECT term FROM q)
  GROUP BY doc_id, w
), df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT doc_id, ROUND(SUM(
    ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
    tf.tf * ({BM25_K1} + 1) /
    (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
  ), 3) AS bm25
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}
"""


@register(
    "q_x33_bm25",
    oracle=_BM25_ORACLE,
    doc=f"BM25 retrieval: score every document against the fixed query "
    f"bag {BM25_QUERY} (k1={BM25_K1}, b={BM25_B}) and return the top "
    f"{BM25_TOP} — the lexical-retrieval primitive under every RAG "
    "pipeline's hybrid search. Spark: term frequencies come from ONE "
    "explode filtered to the query terms BEFORE the shuffle (the filter "
    "is a broadcast isin over a literal list, so the aggregated stream "
    "is |docs| x |query| at most, not |tokens|); document lengths are a "
    "map-only projection; df and the corpus stats are tiny aggregates "
    "cross-joined back as one-row broadcasts. Final ranking is a "
    "TakeOrdered top-k, not a global sort. Scale: per-term df and "
    "per-doc tf are the only shuffles, both on bounded keys; the token "
    "explode never leaves the map side unfiltered.",
)
def q_x33_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    dl = toks.select("doc_id", F.size("ts").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("ts").alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (BM25_K1 + 1) / denom), 3
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


# ---------------------------------------------------------------------------
# TF-IDF sparse pair similarity + token entropy (round 4)
# ---------------------------------------------------------------------------

TFIDF_DF_CAP = 200  # tokens in more docs than this are pruned (stop-tokens)
TFIDF_MIN_COS = 0.35

_TFIDF_ORACLE = f"""
WITH tf AS MATERIALIZED (
  SELECT doc_id, w AS tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
), df AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
wt AS MATERIALIZED (
  SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n * 1.0 / df.df) AS w
  FROM tf JOIN df USING (tok) CROSS JOIN n
  WHERE df.df <= {TFIDF_DF_CAP}
), nrm AS MATERIALIZED (
  SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM wt GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(SUM(a.w * b.w) / (na.nrm * nb.nrm), 3) AS cos_sim
FROM wt a JOIN wt b ON a.tok = b.tok AND a.doc_id < b.doc_id
JOIN nrm na ON a.doc_id = na.doc_id
JOIN nrm nb ON b.doc_id = nb.doc_id
GROUP BY a.doc_id, b.doc_id, na.nrm, nb.nrm
HAVING SUM(a.w * b.w) / (na.nrm * nb.nrm) >= {TFIDF_MIN_COS}
ORDER BY doc_a, doc_b
"""


@register(
    "q_x34_tfidfpairs",
    oracle=_TFIDF_ORACLE,
    doc="TF-IDF cosine document-pair similarity over the SPARSE token "
    "space: weight each (doc, token) by tf x ln(N/df), prune tokens "
    f"with df > {TFIDF_DF_CAP} (stop-tokens carry ~no IDF mass but "
    "create quadratic join blocks — the pruning both sharpens the "
    "metric and bounds per-token pair volume, the same blocking "
    f"discipline as LSH bands), pair docs sharing a surviving token, "
    f"keep cosine >= {TFIDF_MIN_COS}. The embedding-free near-dup / "
    "related-doc primitive. Scale: the join key is a RARE token by "
    "construction (df-capped), so block sizes are bounded by the cap; "
    "norms and weights are two aggregations; nothing is dense.",
)
def q_x34_tfidfpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = _docs(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
    wt = (
        tf.join(df.filter(F.col("df") <= TFIDF_DF_CAP), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
    )
    nrm = wt.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = wt.select(F.col("doc_id").alias("doc_a"), "tok", F.col("w").alias("wa"))
    b = wt.select(F.col("doc_id").alias("doc_b"), "tok", F.col("w").alias("wb"))
    dots = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dots.join(nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")), "doc_a")
        .join(nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")), "doc_b")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= TFIDF_MIN_COS)
        .select("doc_a", "doc_b", F.round("cos", 3).alias("cos_sim"))
        .transform(barrier_sort("doc_a", "doc_b"))
    )


@register(
    "q_x35_entropy",
    oracle=(
        "WITH tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents) GROUP BY doc_id, w) "
        "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, "
        "ROUND(-SUM((c * 1.0 / t) * ln(c * 1.0 / t)), 3) AS entropy "
        "FROM (SELECT doc_id, w, c, SUM(c) OVER (PARTITION BY doc_id) AS t "
        "FROM tf) GROUP BY doc_id ORDER BY doc_id"
    ),
    doc="Token-distribution Shannon entropy per document: low entropy "
    "means a few tokens dominate (boilerplate, keyword stuffing, "
    "degenerate repetition) — the information-theoretic twin of the "
    "Gopher repetition signals in q_text_repetition, used as a "
    "training-data quality gate. Scale: one explode + per-(doc,token) "
    "count, per-doc total via window on the already-aggregated counts "
    "(rows = per-doc vocab, not tokens), one final per-doc aggregate.",
)
def q_x35_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") / F.col("t")
    return (
        tf.withColumn("t", t)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 3).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Character n-gram language profiles (round 4, wave 2)
# ---------------------------------------------------------------------------

CHARGRAM_N = 3
CHARGRAM_TOP = 20


@register(
    "q_x37_charprofile",
    oracle=(
        "WITH grams AS ("
        " SELECT lang, substr(text, i, 3) AS gram"
        f" FROM documents, UNNEST(range(1, length(text) - {CHARGRAM_N - 2})) AS t(i)"
        "), counts AS ("
        " SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM grams GROUP BY lang, gram"
        ") SELECT lang, gram, n FROM ("
        " SELECT lang, gram, n, ROW_NUMBER() OVER ("
        "   PARTITION BY lang ORDER BY n DESC, gram) AS rn FROM counts)"
        f" WHERE rn <= {CHARGRAM_TOP} ORDER BY lang, n DESC, gram"
    ),
    doc=f"Character {CHARGRAM_N}-gram language profiles: the top "
    f"{CHARGRAM_TOP} grams per language tag — the training table a "
    "char-ngram language identifier (textcat / CLD-style) is built "
    "from; q_text_langid consumes exactly this kind of profile. "
    "Spark: grams come from one transform-over-positions explode "
    "(map-only, like the word n-grams in decontamination), counts are "
    "one partial-agg shuffle on (lang, gram), ranking is a window "
    "over per-lang gram counts (rows = vocab, not corpus). Scale: "
    "nothing holds more than (langs x gram vocab) rows after the "
    "first aggregation.",
)
def q_x37_charprofile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # per-CHARACTER 3-gram explode (~text_len rows per doc) — the one
    # textops fan-out heavy enough to repay the scan rescue (r12
    # measured 2.57 -> 1.82s at sf0.1; identity at scale)
    d = rescue_parallelism(_docs(spark, sf_dir), "doc_id")
    # substr by dynamic position needs the expr form (F.substring takes
    # literal positions only)
    grams = d.select(
        "lang",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {CHARGRAM_N - 1}), "
                f"i -> substr(text, i, {CHARGRAM_N}))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "gram")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CHARGRAM_TOP)
        .drop("rn")
        .transform(barrier_sort("lang", F.desc("n"), "gram"))
    )


# ---------------------------------------------------------------------------
# BPE merge induction (round 4): the first iteration of byte-pair-
# encoding vocabulary training — corpus-wide adjacent-symbol pair
# frequencies — as a distributed query. Real BPE training repeats this
# count-merge loop; each iteration is exactly this query over a
# re-segmented corpus, so the scalable primitive IS the pair count.
# ---------------------------------------------------------------------------

BPEMERGE_TOP = 30


@register(
    "q_x38_bpemerge",
    oracle=(
        "WITH words AS (SELECT unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents), pairs AS (SELECT substring(w, i, 2) AS pair "
        "FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) "
        "WHERE len(w) >= 2) "
        "SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair "
        f"ORDER BY n DESC, pair LIMIT {BPEMERGE_TOP}"
    ),
    doc="BPE merge induction (one training iteration): corpus-wide "
    f"adjacent character-pair frequencies, top-{BPEMERGE_TOP} merge "
    "candidates. Tokenizer-training primitive for an LLM data "
    "pipeline: iterate [count pairs -> apply best merge] to grow the "
    "vocab; every iteration is THIS query shape over the re-segmented "
    "corpus. Spark: words explode map-side, pairs come from a "
    "transform-over-positions lambda (no Python), and the only "
    "shuffle carries (pair, partial count) — pair vocab is bounded "
    "(~alphabet^2 per iteration), so the aggregate state is tiny "
    "however large the corpus; top-k is TakeOrderedAndProject.",
)
def q_x38_bpemerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPEMERGE_TOP)
    )
