from __future__ import annotations

import pandas as pd
import pytest

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.multimodal import (
    decode_image_batch,
    extract_features,
    media_table,
)

from conftest import SF_SMOKE


def _rows(name):
    return None  # placeholder; real helper below


def test_minhash_recall_vs_exact_oracle(spark):
    """MinHash-LSH candidates verified at the same Jaccard threshold must
    recover a high fraction of the exact n-gram Jaccard pairs (and may
    not invent pairs: verification uses exact Jaccard)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_ngram"].spark(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_minhash"].spark(spark, SF_SMOKE).collect()
    }
    assert approx <= exact  # no false positives after verification
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_simhash_recall_floor_and_no_false_positives(spark):
    """VERDICT r4 task 1 + r6 task 4: simhash is a verified candidate
    tier over the SAME shingle space as the exact oracle — emitted
    pairs must be a strict subset of the exact-Jaccard truth (0 false
    positives) and the Hamming-radius capture rate must clear a pinned
    >=0.9 recall floor (radius 10: measured 0.964 at sf0.001, 0.984
    at sf0.1 — RECALL_r7)."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import SIMHASH_MAX_HAMMING

    df = REGISTRY["q_dedup_simhash"].spark(spark, SF_SMOKE)
    rows = df.collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(0 <= r.hamming <= SIMHASH_MAX_HAMMING for r in rows)
    approx = {(r.doc_a, r.doc_b) for r in rows}
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_ngram"].spark(spark, SF_SMOKE).collect()
    }
    assert approx <= exact  # no false positives after verification
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"simhash recall {recall:.2f} below floor"


def test_lsh_topk_recall_vs_brute_force(spark):
    """VERDICT r3 task 3: the multi-table LSH must hold the same >=0.8
    floor as IVF/PQ (measured 1.0 at sf0.001/sf0.1 and 0.8 at sf0.01
    with 4 tables x 8 planes, hamming<=2 multiprobe)."""
    brute = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    ann = [r.vec_id for r in REGISTRY["q_sim_lsh"].spark(spark, SF_SMOKE).collect()]
    overlap = len(set(brute) & set(ann)) / len(brute)
    assert overlap >= 0.8, f"ANN recall@5 {overlap:.2f} too low"


def test_decode_stub_raises_without_fake():
    from neo4j_blue_green_arrow_etl_spark.operators.multimodal import _pil_image_module

    if _pil_image_module() is not None:
        pytest.skip("pillow present: real decode path active (tested below)")
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"abc"]))


def _ppm(w, h, pixels):
    """Binary PPM (P6) with a header comment — exercises the tolerant
    header parse."""
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _bmp24(w, h, rows_top_down):
    """Uncompressed 24-bit BMP, positive height (bottom-up storage),
    rows padded to 4 bytes — the layout the bundled decoder owns."""
    import struct

    stride = (w * 3 + 3) & ~3
    data = b""
    for row in reversed(rows_top_down):  # bottom-up
        bgr = b"".join(bytes([px[2], px[1], px[0]]) for px in row)
        data += bgr + b"\x00" * (stride - w * 3)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + dib + data


def test_decode_builtin_fallback_without_any_codec(monkeypatch):
    """VERDICT r8 task 6: with codecs monkeypatched away, fake=False
    still decodes the bundled formats (PPM, PGM, BMP) — the oracle row
    can never silently depend on which container it runs in; only a
    genuinely codec-requiring payload raises."""
    import neo4j_blue_green_arrow_etl_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "_pil_image_module", lambda: None)
    ppm = _ppm(2, 1, [10, 20, 30, 40, 50, 60])
    pgm = b"P5\n2 2\n255\n" + bytes([0, 10, 20, 30])
    bmp = _bmp24(2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]])
    out = mm.decode_image_batch(pd.Series([ppm, pgm, bmp]))
    assert list(out["n_bytes"]) == [len(ppm), len(pgm), len(bmp)]
    assert out["byte_mean"][0] == pytest.approx((10 + 20 + 30 + 40 + 50 + 60) / 6)
    assert out["byte_mean"][1] == pytest.approx((0 + 10 + 20 + 30) / 4)
    assert out["byte_mean"][2] == pytest.approx(sum(range(1, 13)) / 12)
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_image_batch(pd.Series([b"\x89PNG not decodable here"]))


def test_decode_builtin_matches_pillow_when_available():
    """Guarded cross-check: where Pillow exists, the bundled decoder's
    pixel means agree with it on the bundled formats."""
    from neo4j_blue_green_arrow_etl_spark.operators.multimodal import (
        _decode_builtin,
        _pil_image_module,
    )

    Image = _pil_image_module()
    if Image is None:
        pytest.skip("pillow not installed in this container")
    import io

    import numpy as np

    payload = _ppm(3, 2, bytes(range(18)))
    with Image.open(io.BytesIO(payload)) as im:
        want = np.asarray(im, dtype=np.float64)
    got = _decode_builtin(payload).astype(np.float64)
    assert got.shape == want.shape and float(got.mean()) == float(want.mean())


def test_decode_real_path_with_pillow():
    """Guarded: where Pillow is importable, fake=False decodes real
    image bytes (pixel-mean feature). Skips in codec-less containers."""
    from neo4j_blue_green_arrow_etl_spark.operators.multimodal import _pil_image_module

    Image = _pil_image_module()
    if Image is None:
        pytest.skip("pillow not installed in this container")
    import io

    im = Image.new("L", (4, 2), color=7)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    payload = buf.getvalue()
    out = decode_image_batch(pd.Series([payload]))
    assert list(out["n_bytes"]) == [len(payload)]
    assert out["byte_mean"][0] == 7.0


def test_decode_fake_deterministic():
    out = decode_image_batch(pd.Series([b"abc", b""]), fake=True)
    assert list(out["n_bytes"]) == [3, 0]
    assert out["byte_mean"][0] == (97 + 98 + 99) / 3


def test_extract_features_schema_and_rows(spark):
    m = media_table(spark, SF_SMOKE)
    feats = extract_features(m)
    assert [f.name for f in feats.schema.fields] == [
        "media_id",
        "n_bytes",
        "byte_mean",
        "width",
        "height",
    ]
    assert feats.count() == m.count()


def test_fingerprint_stable_under_repartition(spark):
    """Fingerprints are per-row — identical regardless of partitioning."""
    a = {
        (r.doc_id, r.fingerprint)
        for r in REGISTRY["q_text_fingerprint"].spark(spark, SF_SMOKE).collect()
    }
    df2 = REGISTRY["q_text_fingerprint"].spark(spark, SF_SMOKE).repartition(7)
    b = {(r.doc_id, r.fingerprint) for r in df2.collect()}
    assert a == b


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF (probe 4/16 cells) must recover most of the exact top-5;
    on this near-random synthetic set expect high recall since the
    top neighbors concentrate in few cells."""
    brute = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    ivf = [r.vec_id for r in REGISTRY["q_sim_ivf"].spark(spark, SF_SMOKE).collect()]
    overlap = len(set(brute) & set(ivf)) / len(brute)
    assert overlap >= 0.6, f"IVF recall@5 {overlap:.2f} too low"


def test_sim_neardup_is_fully_distributed(spark, monkeypatch):
    """q_sim_neardup must never materialize the embeddings table on the
    driver (VERDICT r1: the old build collected the whole table via
    toPandas then broadcast it — a driver OOM at scale). Building the
    plan with toPandas/collect poisoned proves no driver-side
    materialization happens; the plan itself must be the grouped-map
    block-pair shape (one shuffle + FlatMapGroupsInPandas)."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("driver-side materialization in q_sim_neardup")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    df = REGISTRY["q_sim_neardup"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "Exchange" in plan


def test_sim_neardup_matches_bruteforce_pairs(spark):
    """Block-pair join must produce the exact same pair set (and sims)
    as a direct all-pairs computation at smoke scale."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import NEARDUP_COS

    rows = REGISTRY["q_sim_neardup"].spark(spark, SF_SMOKE).collect()
    got = {(r.vec_a, r.vec_b): r.cos_sim for r in rows}

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in e])
    mat = np.array([r.embedding for r in e], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ mat.T) / np.outer(norms, norms)
    want = {}
    li, ri = np.where(sims >= NEARDUP_COS)
    for i, j in zip(li, ri):
        if ids[i] < ids[j]:
            want[(int(ids[i]), int(ids[j]))] = round(float(sims[i, j]), 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_batchann_each_query_gets_exact_topk(spark):
    """Batched ANN must agree per-query with the single-query brute
    force (q_x2 logic) for the query it covers."""
    rows = REGISTRY["q_x6_batchann"].spark(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append((r.rank, r.vec_id, r.sim))
    assert 0 in by_q  # QUERY_VEC_ID = 0 is in the batch
    batch_top = [v for _, v, _ in sorted(by_q[0])]
    single_top = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    assert batch_top == single_top
    for qid, hits in by_q.items():
        ranks = sorted(r for r, _, _ in hits)
        assert ranks == list(range(1, len(hits) + 1))
        assert qid not in {v for _, v, _ in hits}  # never returns itself


def test_ivf_index_at_rest_prunes_partitions(spark, tmp_path):
    """build_ivf_index persists cell as a partition column; querying it
    must (a) skip assignment, (b) PRUNE unprobed cell partitions at the
    scan, (c) return exactly what the in-memory IVF path returns."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        QUERY_VEC_ID,
        build_ivf_index,
        query_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, SF_SMOKE, idx)

    qvec = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(f"vec_id = {QUERY_VEC_ID}")
        .first()
        .embedding
    )
    out = query_ivf_index(spark, idx, qvec, exclude_id=QUERY_VEC_ID)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    got = [(r.vec_id, r.sim) for r in out.collect()]
    want = [
        (r.vec_id, r.sim) for r in REGISTRY["q_sim_ivf"].spark(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_quantization_bounds(spark):
    """int8 codes stay in [-127, 127] and dequantization error is
    bounded by scale/2 per element (the floor(x+0.5) contract)."""
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    rows = REGISTRY["q_x12_quant"].spark(spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    assert rows and set(r.vec_id for r in rows) == set(emb)
    for r in rows:
        # qvec is the comma-joined flattening of the int8 code array
        # (driver-canonicalizable output contract)
        qvec = [int(q) for q in r.qvec.split(",")]
        assert all(-127 <= q <= 127 for q in qvec)
        for x, q in zip(emb[r.vec_id], qvec):
            assert abs(float(x) - q * r.scale) <= r.scale / 2 + 1e-9


def test_pq_topk_recall_vs_brute_force(spark):
    """PQ ADC + exact re-rank of the refined pool (TOP_K * PQ_REFINE
    candidates): the exact re-rank means any true neighbor in the pool
    ranks correctly. On these near-random synthetic vectors (PQ's
    worst case — no cluster structure for the codebooks to exploit)
    recall@5 is 1.0 at every test SF with the r6 parameters (32 codes
    per subvector, 96 x TOP_K re-rank pool); assert the 0.9 floor
    (VERDICT r5 task 3)."""
    brute = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    pq = [r.vec_id for r in REGISTRY["q_sim_pq"].spark(spark, SF_SMOKE).collect()]
    overlap = len(set(brute) & set(pq)) / len(brute)
    assert overlap >= 0.9, f"PQ recall@5 {overlap:.2f} too low"


def test_pq_codes_are_bounded_and_complete(spark):
    """Every vector gets exactly PQ_M codes, each in [0, PQ_K)."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codebooks,
        pq_encode,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    codes = pq_encode(spark, e, pq_codebooks(e))
    assert codes.count() == e.count()
    bad = codes.filter(
        (F.size("codes") != PQ_M)
        | (F.array_min("codes") < 0)
        | (F.array_max("codes") >= PQ_K)
    ).count()
    assert bad == 0


def test_neardup_block_count_derives_from_table_size(spark):
    """VERDICT r2 task 3: B must scale as ceil(n / NEARDUP_BLOCK_TARGET)
    rather than a hard-coded literal, and every block-pair group must
    stay bounded by ~2 blocks of NEARDUP_BLOCK_TARGET rows — the
    executor-sized-group invariant that makes the exact all-pairs scan
    survive a scale-up."""
    import pyspark.sql.functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        NEARDUP_BLOCK_TARGET,
        neardup_block_count,
    )

    # pure sizing function: different table sizes -> different B
    assert neardup_block_count(1) == 1
    assert neardup_block_count(NEARDUP_BLOCK_TARGET) == 1
    assert neardup_block_count(NEARDUP_BLOCK_TARGET + 1) == 2
    assert neardup_block_count(500) != neardup_block_count(2000)  # sf0.01 vs sf0.1

    # executed invariant: rebuild the replicated grouping exactly as the
    # operator does and assert no (pa, pb) group exceeds two blocks
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select("vec_id")
    n = e.count()
    B = neardup_block_count(n)
    block_cap = -(-n // B)  # ceil(n/B): max rows in one pmod block (dense ids)
    blocked = e.withColumn("blk", F.pmod("vec_id", F.lit(B)).cast("int"))
    replicated = (
        blocked.withColumn("other", F.explode(F.array(*[F.lit(j) for j in range(B)])))
        .withColumn("pa", F.least("blk", "other"))
        .withColumn("pb", F.greatest("blk", "other"))
    )
    sizes = replicated.groupBy("pa", "pb").count().collect()
    assert len(sizes) == B * (B + 1) // 2
    assert max(r["count"] for r in sizes) <= 2 * block_cap


def test_audio_rms_windows_edge_cases(spark):
    """Windowed RMS: ragged tail window keeps its true sample count;
    empty payloads emit no windows; values match a direct numpy
    computation."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.multimodal import AUDIO_WINDOW
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    rows = REGISTRY["q_mm_audio_rms"].spark(spark, SF_SMOKE).collect()
    assert rows, "no windows produced"
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    for mid, wins in list(by_doc.items())[:25]:
        data = np.frombuffer(docs[mid].encode(), dtype=np.uint8).astype(np.int64)
        n = len(data)
        assert len(wins) == -(-n // AUDIO_WINDOW)
        for r in sorted(wins, key=lambda x: x.win):
            seg = data[r.win * AUDIO_WINDOW : (r.win + 1) * AUDIO_WINDOW]
            assert r.n_samples == len(seg)
            want = (seg * seg).sum() / len(seg)
            assert r.energy == want
            assert r.rms == np.sqrt(want)
    # docs produce ceil(len/W) windows only — no empty-window rows
    assert all(r.n_samples >= 1 for r in rows)


def test_kmeans_partitions_all_vectors_into_k_clusters(spark):
    """Every vector gets exactly one cluster; cluster ids are dense in
    [0, K); no cluster is empty on the synthetic data (the oracle's
    drop-empty semantic is never exercised there, by construction)."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import KMEANS_K

    asg = REGISTRY["q_x21_kmeans"].spark(spark, SF_SMOKE).collect()
    e_rows = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(asg) == e_rows
    clusters = {r.cluster for r in asg}
    assert clusters == set(range(KMEANS_K))


def test_kmeans_update_moves_centroids_toward_members(spark):
    """After one Lloyd update the within-cluster sum of squared
    distances must not increase (the defining monotonicity of Lloyd's
    algorithm), and the centroid tensor keeps its (K, dim) shape."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        EMB_DIM,
        KMEANS_K,
        _emb,
        _kmeans_seeds,
        _kmeans_update,
        kmeans_assign,
    )

    e = _emb(spark, SF_SMOKE)
    mat = np.vstack(
        e.orderBy("vec_id").select("embedding").toPandas()["embedding"].map(np.asarray)
    ).astype(np.float64)

    def sse(cent):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    c0 = _kmeans_seeds(e)
    assert c0.shape == (KMEANS_K, EMB_DIM)
    c1, ids1 = _kmeans_update(e, c0)
    assert c1.shape == (KMEANS_K, EMB_DIM)
    assert ids1 == list(range(KMEANS_K))  # nothing emptied on this data
    assert sse(c1) <= sse(c0) + 1e-9
    # assignment against the updated tensor matches a local argmin
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(e, c1).collect()
    }
    d2 = ((mat[:, None, :] - c1[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    ids = sorted(got)
    assert [got[i] for i in ids] == list(want)


def test_semdedup_removes_only_within_cluster_neighbors(spark):
    """Every removed vector must have a kept-or-removed lower-id
    neighbor in the SAME cluster with cosine >= threshold, and every
    kept vector must have none (checked against a local brute force)."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import SEMDEDUP_COS

    out = REGISTRY["q_x22_semdedup"].spark(spark, SF_SMOKE).collect()
    e = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .toPandas()
    )
    mat = np.vstack(e["embedding"].map(np.asarray)).astype(np.float64)
    mat_n = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    cos = mat_n @ mat_n.T
    idx = {int(v): i for i, v in enumerate(e["vec_id"])}
    cluster = {r.vec_id: r.cluster for r in out}
    for r in out:
        i = idx[r.vec_id]
        has_lower_neighbor = any(
            cos[i, idx[o]] >= SEMDEDUP_COS
            for o in idx
            if o < r.vec_id and cluster[o] == r.cluster
        )
        assert r.is_kept == (not has_lower_neighbor), r


def test_kmeans_update_preserves_original_ids_when_clusters_empty():
    """If a Lloyd update drops an emptied cluster, surviving centroids
    must keep their ORIGINAL cluster ids (never renumber) — otherwise
    labels silently shift relative to the oracle's."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _kmeans_update,
        kmeans_assign,
    )
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("kmeans-empty")
    # 1-dim points all near 0 and 10; seed centroid 1 (at 5.2) loses
    # every point to 0 or 2 -> cluster 1 empties after one update
    pts = [(i, [float(v)]) for i, v in enumerate([0.0, 0.1, 0.2, 9.9, 10.0, 10.1])]
    e = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cent = np.array([[0.05], [5.2], [10.0]])
    new_cent, new_ids = _kmeans_update(e, cent)
    assert new_ids == [0, 2]  # cluster 1 dropped, ids NOT renumbered
    got = {r.vec_id: r.cluster for r in kmeans_assign(e, new_cent, new_ids).collect()}
    assert set(got.values()) == {0, 2}
    assert got[0] == 0 and got[5] == 2


def test_cms_overestimates_within_bound_and_merges(spark):
    """Count-min guarantees: (a) every point estimate >= the true
    count; (b) overestimates stay within the eps*N bound (eps = e/W)
    for at least 99% of keys (the depth-4 failure probability is
    e^-4 per key); (c) sketches built on disjoint halves merge by
    cell-wise addition into exactly the full sketch."""
    import math

    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.sketches import (
        CMS_WIDTH,
        cms_estimate,
    )

    cells = {
        (r.d, r.bucket): r.cnt
        for r in REGISTRY["q_a17_cms"].spark(spark, SF_SMOKE).collect()
    }
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    true = {
        str(r.user_id): r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true.values())
    eps = math.e / CMS_WIDTH
    over = []
    for key, t in true.items():
        est = cms_estimate(cells, key)
        assert est >= t, (key, est, t)
        over.append(est - t)
    within = sum(1 for o in over if o <= eps * n_total)
    assert within >= 0.99 * len(over), (within, len(over))
    # mergeability: disjoint halves sum cell-wise to the full sketch
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for name, pred in (
            ("lo", F.col("event_id") % 2 == 0),
            ("hi", F.col("event_id") % 2 == 1),
        ):
            events.filter(pred).write.mode("overwrite").parquet(
                f"{td}/{name}/events.parquet"
            )
        merged: dict[tuple[int, int], int] = {}
        for name in ("lo", "hi"):
            for r in REGISTRY["q_a17_cms"].spark(spark, f"{td}/{name}").collect():
                merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cnt
    assert merged == cells


def test_ivfpq_topk_recall_vs_brute_force(spark):
    """IVF-PQ composite (coarse cell pruning -> ADC ranking -> exact
    re-rank of TOP_K * IVFPQ_REFINE): recall@5 is 1.0 at every test SF
    with 4/16 probes and the 32x re-rank pool; assert the 0.9 floor."""
    brute = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    got = [
        r.vec_id for r in REGISTRY["q_sim_ivfpq"].spark(spark, SF_SMOKE).collect()
    ]
    overlap = len(set(brute) & set(got)) / len(brute)
    assert overlap >= 0.9, f"IVF-PQ recall@5 {overlap:.2f} too low"


def test_ivfpq_index_roundtrip(spark, tmp_path):
    """build_ivfpq_index writes a cell-partitioned table with a codes
    column plus centroid/codebook JSON; query_ivfpq_index answers from
    the index alone (partition-pruned ADC scan + exact re-rank) and
    matches the exact scan."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, SF_SMOKE, idx)
    # layout: cell partitions + sidecar metadata, codes column present
    from pathlib import Path

    assert (Path(idx) / "_ivf_centroids.json").exists()
    assert (Path(idx) / "_pq_codebooks.json").exists()
    assert list(Path(idx).glob("cell=*"))
    stored = spark.read.parquet(idx)
    assert "codes" in stored.columns and "embedding" in stored.columns
    qvec = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
        .embedding
    )
    brute = [r.vec_id for r in REGISTRY["q_x2"].spark(spark, SF_SMOKE).collect()]
    got = [r.vec_id for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()]
    overlap = len(set(brute) & set(got)) / len(brute)
    assert overlap >= 0.9, f"indexed IVF-PQ recall@5 {overlap:.2f} too low"


def test_ivfpq_append_ingests_new_vectors_exactly_once(spark, tmp_path):
    """append_ivfpq_batch adds vectors to an existing index without
    retraining: assigned to the EXISTING centroids, encoded with the
    EXISTING codebooks, written as (cell, batch_id) sub-partitions so
    a crash replay overwrites only its own files. Appended vectors
    must be findable by query_ivfpq_index."""
    from pathlib import Path

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        append_ivfpq_batch,
        build_ivfpq_index,
        query_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    half_dir = tmp_path / "half"
    e.filter("vec_id % 2 = 0").write.parquet(
        str(half_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "ivfpq_incr")
    build_ivfpq_index(spark, str(half_dir), idx)
    n_build = spark.read.parquet(idx).count()

    newv = e.filter("vec_id % 2 = 1").select("vec_id", "embedding")
    append_ivfpq_batch(spark, idx, newv, 1)
    total = spark.read.parquet(idx).count()
    assert total == e.count() and total > n_build
    assert list(Path(idx).glob("cell=*/batch_id=1"))

    # crash replay of the same batch: dynamic overwrite, no duplicates
    append_ivfpq_batch(spark, idx, newv, 1)
    assert spark.read.parquet(idx).count() == total

    # an appended vector is findable through the normal query path
    q = e.filter("vec_id = 1").first()
    ids = [r.vec_id for r in query_ivfpq_index(spark, idx, q.embedding).collect()]
    assert 1 in ids


def test_incrdedup_consistent_with_full_dedup(spark):
    """q_x44_incrdedup must agree with the full-corpus ngram truth:
    every emitted (new, match) pair appears (in some orientation) in
    q_dedup_ngram's pair set, and every ngram pair TOUCHING an incoming
    doc is recovered — incremental ingestion loses nothing vs the
    quadratic full re-run it replaces."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import INCR_MOD

    full = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_ngram"].spark(spark, SF_SMOKE).collect()
    }
    incr = {
        (r.doc_new, r.doc_match)
        for r in REGISTRY["q_x44_incrdedup"].spark(spark, SF_SMOKE).collect()
    }
    assert incr, "fixture has no incremental matches; weaken INCR_MOD"
    canon = {(min(a, b), max(a, b)) for a, b in incr}
    assert canon <= full  # no false pairs
    # completeness: every truth pair with an incoming side is found
    expected = set()
    for a, b in full:
        if b % INCR_MOD == 0:  # b incoming, a earlier-or-indexed
            expected.add((min(a, b), max(a, b)))
        elif a % INCR_MOD == 0:  # a incoming, b indexed (b > a, not new)
            expected.add((min(a, b), max(a, b)))
    assert canon == expected


def test_ivfpq_compaction_folds_preserving_results(spark, tmp_path):
    """compact_ivfpq_index must be invisible to queries: same rows,
    same ANN answers — but ONE fold generation with one file per cell
    where there was one file per (cell, batch)."""
    from pathlib import Path

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _IVFPQ_MANIFEST,
        append_ivfpq_batch,
        build_ivfpq_index,
        compact_ivfpq_index,
        query_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    half_dir = tmp_path / "half"
    e.filter("vec_id % 3 = 0").write.parquet(
        str(half_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "ivfpq_cmp")
    build_ivfpq_index(spark, str(half_dir), idx)
    append_ivfpq_batch(
        spark, idx, e.filter("vec_id % 3 = 1").select("vec_id", "embedding"), 1
    )
    q = e.filter("vec_id = 7").first()
    before = [r.vec_id for r in query_ivfpq_index(spark, idx, q.embedding).collect()]
    rows_before = spark.read.parquet(idx).count()
    files_before = len(list(Path(idx).glob("cell=*/batch_id=*/part-*")))

    compact_ivfpq_index(spark, idx, 1)

    t = spark.read.parquet(idx)
    assert t.count() == rows_before
    ids = {r[0] for r in t.select("batch_id").distinct().collect()}
    assert len(ids) == 1 and next(iter(ids)) < 0, ids  # fresh fold gen
    after = [r.vec_id for r in query_ivfpq_index(spark, idx, q.embedding).collect()]
    assert after == before
    files_after = len(list(Path(idx).glob("cell=*/batch_id=*/part-*")))
    assert files_after < files_before
    # one file per cell
    for cell in Path(idx).glob("cell=*"):
        assert len(list(cell.glob("batch_id=*/part-*"))) == 1, cell
    assert not Path(idx, _IVFPQ_MANIFEST).exists()
    # a later ingest of NEW vectors lands on top of the fold unharmed;
    # re-compaction folds fold+new into the NEXT generation
    append_ivfpq_batch(
        spark, idx, e.filter("vec_id % 3 = 2").select("vec_id", "embedding"), 3
    )
    assert spark.read.parquet(idx).count() == e.count()
    compact_ivfpq_index(spark, idx, 3)
    t2 = spark.read.parquet(idx)
    ids2 = {r[0] for r in t2.select("batch_id").distinct().collect()}
    assert ids2 == {next(iter(ids)) - 1}
    assert t2.count() == e.count()


def test_ivfpq_compaction_crash_recovery_both_branches(spark, tmp_path):
    """Manifest protocol on the path-partitioned ANN index: (a) fold
    not committed -> abort discards the partial fold, sources intact;
    (b) fold committed, deletes crashed -> recovery finishes the
    deletes. Both through the recovery hook every open runs."""
    import json
    from pathlib import Path

    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _IVFPQ_MANIFEST,
        _recover_ivfpq_compaction,
        append_ivfpq_batch,
        build_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    half_dir = tmp_path / "half"
    e.filter("vec_id % 2 = 0").write.parquet(
        str(half_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "ivfpq_crash")
    build_ivfpq_index(spark, str(half_dir), idx)
    append_ivfpq_batch(
        spark, idx, e.filter("vec_id % 2 = 1").select("vec_id", "embedding"), 1
    )
    total = spark.read.parquet(idx).count()

    # (a) manifest present, fold never committed: partial rows in -1
    partial = (
        spark.read.parquet(idx)
        .limit(5)
        .withColumn("batch_id", F.lit(-1))
        .localCheckpoint()
    )
    partial.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        "cell", "batch_id"
    ).mode("overwrite").parquet(idx)
    Path(idx, _IVFPQ_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total})
    )
    _recover_ivfpq_compaction(spark, idx)
    assert not Path(idx, _IVFPQ_MANIFEST).exists()
    t = spark.read.parquet(idx)
    assert t.count() == total  # sources intact, partial discarded
    assert t.filter("batch_id = -1").count() == 0
    assert t.filter("batch_id = 0").count() > 0
    assert t.filter("batch_id = 1").count() > 0

    # (b) fold committed (all rows relabeled -1), deletes crashed
    folded = (
        spark.read.parquet(idx)
        .withColumn("batch_id", F.lit(-1))
        .repartition("cell")
        .localCheckpoint()
    )
    folded.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        "cell", "batch_id"
    ).mode("overwrite").parquet(idx)
    Path(idx, _IVFPQ_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total})
    )
    assert spark.read.parquet(idx).count() == 2 * total  # dup window
    _recover_ivfpq_compaction(spark, idx)
    assert not Path(idx, _IVFPQ_MANIFEST).exists()
    t = spark.read.parquet(idx)
    assert t.count() == total
    assert t.filter("batch_id >= 0").count() == 0


def test_stream_embedding_ingest_exactly_once_with_compaction(spark, tmp_path):
    """The ANN twin of the near-dup stream: a checkpointed file stream
    appends embedding batches into a pre-trained IVF-PQ index with
    periodic folds. Re-draining with the same checkpoint must change
    nothing (exactly-once); queries must find appended vectors; the
    fold must shrink the file count without changing rows."""
    from pathlib import Path

    import pytest

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from neo4j_blue_green_arrow_etl_spark.streaming.ann_ingest import (
        stream_embedding_ingest,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    boot_dir = tmp_path / "boot"
    e.filter("vec_id % 4 = 0").write.parquet(
        str(boot_dir / "embeddings.parquet")
    )
    idx = str(tmp_path / "ann_stream_idx")

    # a stream must refuse to run against an untrained index
    with pytest.raises(ValueError, match="trained"):
        stream_embedding_ingest(
            spark, str(tmp_path / "in") + "/*", idx, str(tmp_path / "ck0")
        )

    build_ivfpq_index(spark, str(boot_dir), idx)
    src = tmp_path / "in"
    for i, b in enumerate((1, 2, 3)):
        e.filter(f"vec_id % 4 = {b}").select(
            "vec_id", "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"part{i}"))

    ckpt = str(tmp_path / "ckpt")
    stream_embedding_ingest(
        spark, f"{src}/*", idx, ckpt, compact_every=2
    )
    t = spark.read.parquet(idx)
    assert t.count() == e.count()
    ids = {r[0] for r in t.select("batch_id").distinct().collect()}
    assert min(ids) < 0  # a fold generation exists (compact_every hit)
    assert len(ids) < 4  # 1 build + 3 appends folded at least once

    # every appended vector is queryable through the normal path
    q = e.filter("vec_id = 5").first()  # vec 5 arrived via the stream
    got = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, q.embedding, exclude_id=5).collect()
    ]
    assert len(got) == 5

    # exactly-once: re-draining the same checkpoint replays nothing
    # (the checkpoint IS the exactly-once token — pointing a FRESH
    # checkpoint at an already-ingested index is a different stream
    # and would double-ingest by design, exactly like the dedup state)
    rows_before = sorted(
        map(tuple, t.select("vec_id", "batch_id").collect())
    )
    stream_embedding_ingest(spark, f"{src}/*", idx, ckpt, compact_every=2)
    rows_after = sorted(
        map(
            tuple,
            spark.read.parquet(idx).select("vec_id", "batch_id").collect(),
        )
    )
    assert rows_after == rows_before

    # single-batch crash replay: re-run the LAST batch's foreachBatch
    # body with its committed batch_id — dynamic overwrite replaces
    # only its own (cell, batch_id) files, the row set is unchanged
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        append_ivfpq_batch,
    )

    last = e.filter("vec_id % 4 = 3").select("vec_id", "embedding")
    append_ivfpq_batch(spark, idx, last, 3)  # stream batch 2 -> index 3
    replay_rows = sorted(
        map(
            tuple,
            spark.read.parquet(idx).select("vec_id", "batch_id").collect(),
        )
    )
    assert replay_rows == rows_before


def test_calibrate_nprobe_meets_target_on_fixture(spark, tmp_path):
    """The recall->nprobe policy knob (r10): the calibrator's chosen
    nprobe must actually deliver the target recall on its own
    measurement, and the measured map must be monotone-capped at the
    cell count."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        IVF_CELLS,
        build_ivfpq_index,
        calibrate_nprobe,
    )

    idx = str(tmp_path / "ivfpq_cal")
    build_ivfpq_index(spark, SF_SMOKE, idx)
    pol = calibrate_nprobe(spark, idx, target_recall=0.9, n_queries=6)
    assert pol["target"] == 0.9
    assert 1 <= pol["nprobe"] <= IVF_CELLS
    # chosen nprobe's own measured recall meets the target (or it is
    # the max candidate — the documented "raise IVF_CELLS" signal)
    measured = pol["measured"]
    assert measured[pol["nprobe"]] >= 0.9 or pol["nprobe"] == max(measured)


# ---------------------------------------------------------------------------
# at-rest trained-artifact store (r11: VERDICT r10 tasks 1-2, ADVICE r10)
# ---------------------------------------------------------------------------


def test_trained_artifact_store_keying_and_recovery(tmp_path, monkeypatch):
    """The artifact store must (a) train exactly once per (corpus
    content, hyperparameters) key, (b) key on CONTENT — not mtimes, so
    regenerated-byte-identical data stays warm, (c) key on every
    hyperparameter — a changed param trains a NEW artifact instead of
    returning stale wrong-shape tensors (ADVICE r10), and (d) retrain
    over a corrupt/foreign file instead of crashing."""
    import os

    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _artifact_root,
        _trained_artifact,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "store"))
    assert _artifact_root() == tmp_path / "store"
    sf = tmp_path / "corpus"
    (sf / "embeddings.parquet").mkdir(parents=True)
    data = sf / "embeddings.parquet" / "part-0.parquet"
    data.write_bytes(b"fake-parquet-bytes-v1")

    calls = {"n": 0}

    def train():
        calls["n"] += 1
        return np.arange(6, dtype=np.float64).reshape(2, 3)

    p1 = {"cells": 2, "v": "t1"}
    a = _trained_artifact("t", str(sf), p1, train)
    b = _trained_artifact("t", str(sf), p1, train)
    assert calls["n"] == 1 and np.array_equal(a, b)  # (a) load, not retrain
    # (b) content keying: fresh mtime, same bytes -> still warm
    os.utime(data, (1, 1))
    _trained_artifact("t", str(sf), p1, train)
    assert calls["n"] == 1
    # changed bytes -> retrain
    data.write_bytes(b"fake-parquet-bytes-v2")
    _trained_artifact("t", str(sf), p1, train)
    assert calls["n"] == 2
    # (c) hyperparameter keying: new params -> new artifact file
    _trained_artifact("t", str(sf), {"cells": 4, "v": "t1"}, train)
    assert calls["n"] == 3
    assert len(list((tmp_path / "store").glob("t-*.json"))) == 3
    # (d) corrupt file -> retrain and atomically replace
    victim = max(
        (tmp_path / "store").glob("t-*.json"), key=lambda p: p.stat().st_mtime
    )
    victim.write_text("{not json")
    _trained_artifact("t", str(sf), {"cells": 4, "v": "t1"}, train)
    assert calls["n"] == 4


def test_streamed_index_path_is_content_keyed(tmp_path, monkeypatch):
    """q_st7/q_st9 index paths key on embeddings CONTENT + kind: mtime
    churn keeps the path (warm across testdata regeneration); a byte
    change or a different kind moves it."""
    import os

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _streamed_index_path,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "store"))
    sf = tmp_path / "corpus"
    (sf / "embeddings.parquet").mkdir(parents=True)
    data = sf / "embeddings.parquet" / "part-0.parquet"
    data.write_bytes(b"vec-bytes-1")
    p1, s1 = _streamed_index_path(str(sf), "annstream")
    os.utime(data, (1, 1))
    p2, s2 = _streamed_index_path(str(sf), "annstream")
    assert (p1, s1) == (p2, s2)
    assert _streamed_index_path(str(sf), "annretract")[0] != p1
    data.write_bytes(b"vec-bytes-2")
    assert _streamed_index_path(str(sf), "annstream")[0] != p1
