"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode degrades gracefully by codec availability (r9):
``decode_image_batch`` uses Pillow when importable, else a BUNDLED
pure-Python PPM/PGM/BMP decoder (``_decode_builtin``), and raises
``NotImplementedError`` only for formats that genuinely need a codec
in a codec-less container (request the deterministic fake decoder for
those). The Spark-side plumbing is real and tested either way: binary
column schema, Arrow-batched ``mapInPandas`` with a declared output
schema, partition-preserving batch iteration.

At 100 TB the shape is: binary payloads stay columnar in Parquet,
decode/feature-extract runs as Arrow-batched pandas iterators on
executors (never row-at-a-time Python), and metadata-only queries never
touch the payload column thanks to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .relational import barrier_sort, register


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from documents: payload = UTF-8
    bytes of the text (deterministic stand-in for image bytes), plus
    typed metadata columns."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("fake/rgb8").alias("mime"),
        F.struct(
            F.pmod(F.col("doc_id"), F.lit(64)).cast("int").alias("width"),
            F.pmod(F.col("doc_id"), F.lit(48)).cast("int").alias("height"),
        ).alias("meta"),
    )


@register(
    "q_mm_meta",
    oracle=(
        "SELECT doc_id AS media_id, "
        "octet_length(encode(text)) AS n_bytes, "
        "sha256(text) AS payload_sha FROM documents ORDER BY 1"
    ),
    doc="Multimodal metadata pass: payload byte length + content digest "
    "without decoding. Scale: pure column expressions; with payloads in "
    "their own parquet column, metadata queries prune the blob entirely.",
)
def q_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    ).orderBy("media_id")


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _pil_image_module():
    """Pillow's Image module when importable, else None. Pillow is a
    public optional extra — this container doesn't ship it, so the fake
    path keeps every test runnable; where PIL exists the real decode is
    exercised (guarded test in tests/test_extensions.py)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_builtin(b: bytes):
    """Bundled pure-Python decode of the two formats whose wire layout
    is simple enough to own outright: binary PPM/PGM (P6/P5) and
    uncompressed 24-bit BMP. Returns a numpy pixel array, or None when
    the payload is neither format (caller decides how to fail).

    Exists so the real-decode path DEGRADES instead of hard-requiring
    Pillow (VERDICT r8 task 6): an operator whose oracle row silently
    depends on which container it runs in is an environment landmine —
    with this fallback, fake=False always works for the bundled
    formats and raises only for formats that genuinely need a codec."""
    import numpy as np

    if b[:2] in (b"P6", b"P5"):
        # header = magic, width, height, maxval as whitespace-separated
        # tokens, '#' comments allowed between them; pixel data starts
        # after the single whitespace byte that ends maxval
        tokens, i, n = [], 2, len(b)
        while len(tokens) < 3 and i < n:
            while i < n and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":
                while i < n and b[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < n and not b[j : j + 1].isspace():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
        i += 1  # the single whitespace terminating the maxval token
        w, h, maxval = tokens
        if maxval > 255:  # 16-bit samples: out of scope for the fallback
            return None
        ch = 3 if b[:2] == b"P6" else 1
        return np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i).reshape(
            h, w, ch
        )
    if b[:2] == b"BM":
        import struct

        data_off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        compression = struct.unpack_from("<I", b, 30)[0]
        if bpp != 24 or compression != 0:
            return None  # palette/compressed BMPs need a real codec
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * abs(h), offset=data_off
        ).reshape(abs(h), stride)[:, : w * 3]
        px = rows.reshape(abs(h), w, 3)
        # positive height = bottom-up storage; BGR order (mean-invariant,
        # but flip anyway so the array matches what a codec returns)
        if h > 0:
            px = px[::-1]
        return px[:, :, ::-1]
    return None


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads.

    With ``fake=True``: a deterministic byte-level stand-in (length +
    mean byte value) with the exact batch shape a real decoder would
    use. With ``fake=False``: real decoding via Pillow when importable,
    else the bundled pure-Python PPM/PGM/BMP decoder (_decode_builtin)
    — n_bytes = payload length, byte_mean = mean decoded pixel value;
    NotImplementedError only for a format that genuinely needs a codec
    in a codec-less environment."""
    import numpy as np

    if not fake:
        Image = _pil_image_module()
        lengths, means = [], []
        for b in payloads.to_numpy():
            lengths.append(len(b))
            if Image is not None:
                import io

                with Image.open(io.BytesIO(b)) as im:
                    arr = np.asarray(im, dtype=np.float64)
            else:
                arr = _decode_builtin(bytes(b))
                if arr is None:
                    raise NotImplementedError(
                        "payload is not PPM/PGM/BMP and no image codec "
                        "(pillow) is importable; install a codec or pass "
                        "fake=True for the deterministic stand-in"
                    )
                arr = arr.astype(np.float64)
            means.append(float(arr.mean()) if arr.size else 0.0)
        return pd.DataFrame(
            {
                "n_bytes": np.asarray(lengths, dtype=np.int64),
                "byte_mean": np.asarray(means),
            },
            index=payloads.index,
        )

    vals = payloads.to_numpy()
    lengths = np.fromiter((len(b) for b in vals), dtype=np.int64, count=len(vals))
    # One concatenated uint8 buffer + cumsum-at-offsets: exact integer
    # sums per payload with zero per-byte Python (handles empty payloads).
    buf = np.frombuffer(b"".join(vals), dtype=np.uint8)
    cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
    bounds = np.concatenate(([0], np.cumsum(lengths)))
    sums = cs[bounds[1:]] - cs[bounds[:-1]]
    means = np.divide(sums, lengths, out=np.zeros(len(vals)), where=lengths > 0)
    return pd.DataFrame(
        {"n_bytes": lengths, "byte_mean": means}, index=payloads.index
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    ``mapInPandas`` — the genuine distributed decode path with the fake
    decoder plugged in.

    The worker function is SELF-CONTAINED: it references no symbol from
    this package (cloudpickle pickles importable module functions by
    reference — even via closure cells — so any such reference would
    require the package on every executor's sys.path; a self-contained
    closure ships fully by value, no --py-files deployment coupling).
    It repeats decode_image_batch's fake path by design — keep in sync.

    Byte stats are fully vectorized: each Arrow batch's payloads are
    concatenated into ONE uint8 buffer, summed with a single cumsum, and
    sliced at payload offsets — no per-byte (or even per-row) Python.
    Struct fields (width/height) are flattened to top-level columns
    BEFORE mapInPandas so the worker passes them through untouched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            vals = pdf["payload"].to_numpy()
            n = len(vals)
            lengths = np.fromiter((len(b) for b in vals), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(vals), dtype=np.uint8)
            cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            bounds = np.concatenate(([0], np.cumsum(lengths)))
            sums = cs[bounds[1:]] - cs[bounds[:-1]]
            # exact int sum / len is bit-identical to the oracle's
            # sum*1.0/length — no round-tie risk
            means = np.divide(sums, lengths, out=np.zeros(n), where=lengths > 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lengths,
                    "byte_mean": means,
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    flat = media.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(batches, schema=_FEATURE_SCHEMA)


@register(
    "q_mm_features",
    oracle=(
        "SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes, "
        "list_aggregate(list_transform(range(1, length(text) + 1), "
        "i -> unicode(text[i])), 'sum') * 1.0 / length(text) AS byte_mean, "
        "CAST(doc_id % 64 AS INTEGER) AS width, "
        "CAST(doc_id % 48 AS INTEGER) AS height "
        "FROM documents ORDER BY 1"
    ),
    doc="mapInPandas feature extraction over binary payloads (fake "
    "decoder: byte stats). Exercises the real multimodal plumbing: Arrow "
    "batch exchange, declared output schema, struct metadata access. "
    "Oracle mirrors the byte stats (ASCII text => unicode == byte value).",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(media_table(spark, sf_dir))
    return feats.orderBy("media_id")


# ---------------------------------------------------------------------------
# Frame sampling: fixed-size frame extraction from binary payloads
# ---------------------------------------------------------------------------

FRAME_SIZE = 64  # bytes per "frame"
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "q_mm_frames",
    oracle=(
        "WITH f AS (SELECT doc_id AS media_id, text, "
        f"length(text) // {FRAME_SIZE} AS nf FROM documents), "
        "s AS (SELECT media_id, text, "
        f"unnest(range(0, nf, {FRAME_STRIDE})) AS frame_idx FROM f) "
        "SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, "
        f"md5(substring(text, CAST(frame_idx * {FRAME_SIZE} + 1 AS INT), {FRAME_SIZE})) AS frame_md5 "
        "FROM s ORDER BY media_id, frame_idx"
    ),
    doc=f"Video-style frame sampling over opaque binary payloads: treat "
    f"each payload as consecutive {FRAME_SIZE}-byte frames, keep every "
    f"{FRAME_STRIDE}th, emit the frame digest. ALL JVM-side: sequence of "
    "frame indices -> explode -> substring on the BINARY column -> md5; "
    "no Python touches the bytes (a real codec would slot in as a "
    "mapInPandas stage per sampled frame, decoding ~1/stride of the "
    "payload bytes — the sampling happens BEFORE decode, which is the "
    "point at 100 TB of video). The oracle slices the source text "
    "instead of the blob (DuckDB cannot slice BLOBs); the corpus is "
    "pure ASCII so byte offsets == char offsets and the md5s agree — "
    "pinned by the n_bytes==length check in tests.",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    nf = (F.floor(F.octet_length("payload") / FRAME_SIZE)).cast("int")
    idxs = F.when(
        nf > 0, F.sequence(F.lit(0), nf - 1, F.lit(FRAME_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    return (
        m.select("media_id", "payload", idxs.alias("idxs"))
        .select("media_id", "payload", F.explode("idxs").alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            F.md5(
                F.expr(f"substring(payload, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE})")
            ).alias("frame_md5"),
        )
        .orderBy("media_id", "frame_idx")
    )


# Audio-style windowing: treat the payload as a waveform of 8-bit
# samples and frame it into fixed windows (160 samples = "10 ms at
# 16 kHz" stand-in), computing per-frame energy/RMS — the front half of
# every audio featurizer (VAD, loudness normalization, spectrogram
# framing). A real PCM decode is the same plumbing with int16 frames.
AUDIO_WINDOW = 160


@register(
    "q_mm_audio_rms",
    oracle=(
        "WITH idx AS (SELECT doc_id AS media_id, text, "
        "unnest(range(1, length(text) + 1)) AS i FROM documents), "
        f"s AS (SELECT media_id, CAST((i - 1) // {AUDIO_WINDOW} AS INT) AS win, "
        "unicode(text[i]) AS v FROM idx) "
        "SELECT media_id, win, COUNT(*) AS n_samples, "
        "SUM(v * v) * 1.0 / COUNT(*) AS energy, "
        "sqrt(SUM(v * v) * 1.0 / COUNT(*)) AS rms "
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc=f"Audio-shaped windowed energy: frame each payload into "
    f"{AUDIO_WINDOW}-sample windows (ragged tail kept) and emit "
    "per-window sample count, mean energy, and RMS. Arrow-batched "
    "mapInPandas with the same zero-per-byte-Python discipline as "
    "q_mm_features: one concatenated uint8 buffer, one squared cumsum, "
    "sliced at window offsets built by vectorized repeat/arange — "
    "map-only, no shuffle, scales with payload bytes. Integer "
    "sums of squares are exact, so the single division + IEEE sqrt "
    "(correctly rounded) is engine-independent — NO decimal rounding "
    "on either side (np.round is half-even, SQL ROUND half-away; at a "
    "…5 boundary they disagree, so the raw doubles are the stable "
    "contract). Oracle recovers byte values via unicode() over the "
    "ASCII stand-in payloads.",
)
def q_mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    W = AUDIO_WINDOW

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("win", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            vals = pdf["payload"].to_numpy()
            n = len(vals)
            lengths = np.fromiter((len(b) for b in vals), dtype=np.int64, count=n)
            nwin = -(-lengths // W)  # ceil; 0-length payloads get 0 windows
            buf = np.frombuffer(b"".join(vals), dtype=np.uint8).astype(np.int64)
            sq = np.concatenate(([0], np.cumsum(buf * buf)))
            doc_off = np.concatenate(([0], np.cumsum(lengths)))
            total = int(nwin.sum())
            win_off = np.concatenate(([0], np.cumsum(nwin)))
            # window index within its payload, fully vectorized
            win = np.arange(total) - np.repeat(win_off[:-1], nwin)
            starts = np.repeat(doc_off[:-1], nwin) + win * W
            ends = np.minimum(starts + W, np.repeat(doc_off[1:], nwin))
            n_samp = ends - starts
            esum = sq[ends] - sq[starts]
            energy = esum / n_samp  # n_samp >= 1 by construction
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), nwin),
                    "win": win.astype(np.int32),
                    "n_samples": n_samp,
                    "energy": energy,
                    "rms": np.sqrt(energy),
                }
            )

    return (
        m.select("media_id", "payload")
        .mapInPandas(frames, out_schema)
        .transform(barrier_sort("media_id", "win"))
    )


# Image-style patch tiling: treat the payload as a row-major grayscale
# raster (ROW_BYTES bytes per scanline) and cut it into non-overlapping
# PATCH x PATCH tiles — the ViT patchify step. A patch's bytes are NOT
# contiguous (P row-segments at stride ROW_BYTES), so the assembly is a
# compile-time concat of P strided substrings, all JVM-side.
ROW_BYTES = 32  # scanline width
PATCH = 8  # patch edge -> ROW_BYTES/PATCH patches per row band

_PATCH_SEGS_SQL = " || ".join(
    f"substring(text, (prow * {PATCH} + {k}) * {ROW_BYTES} + pcol * {PATCH} + 1, {PATCH})"
    for k in range(PATCH)
)


@register(
    "q_mm_patches",
    oracle=(
        "WITH dims AS (SELECT doc_id AS media_id, text, "
        f"length(text) // {ROW_BYTES} AS h FROM documents), "
        "rows_ AS (SELECT media_id, text, "
        f"unnest(range(0, h // {PATCH})) AS prow FROM dims), "
        "grid AS (SELECT media_id, text, prow, "
        f"unnest(range(0, {ROW_BYTES // PATCH})) AS pcol FROM rows_) "
        "SELECT media_id, CAST(prow AS INT) AS prow, "
        "CAST(pcol AS INT) AS pcol, "
        f"md5({_PATCH_SEGS_SQL}) AS patch_md5 "
        "FROM grid ORDER BY media_id, prow, pcol"
    ),
    doc=f"ViT-style patch tiling over opaque payloads: the payload is a "
    f"row-major raster ({ROW_BYTES} bytes/scanline) cut into "
    f"non-overlapping {PATCH}x{PATCH} patches; each patch is assembled "
    f"from {PATCH} STRIDED row segments (compile-time concat of "
    "substrings — patches are not contiguous bytes, unlike q_mm_frames' "
    "1-D frames) and emitted as its digest. All JVM: sequence-explode "
    "the patch grid, strided substring concat, md5. A real pipeline "
    "swaps the digest for the patch tensor feeding the vision encoder; "
    "the tiling/shuffle shape — explode to (media, prow, pcol), "
    "map-side only, zero shuffle beyond presentation sort — is "
    "identical. The oracle slices the ASCII twin of the payload "
    "(byte==char offsets, q_mm_frames' trick).",
)
def q_mm_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    n_band = (
        F.floor(F.octet_length("payload") / ROW_BYTES / PATCH)
    ).cast("int")
    prow = F.when(
        n_band > 0, F.sequence(F.lit(0), n_band - 1)
    ).otherwise(F.array().cast("array<int>"))
    pcols = F.sequence(F.lit(0), F.lit(ROW_BYTES // PATCH - 1))
    segs = F.concat(
        *[
            F.expr(
                f"substring(payload, (prow * {PATCH} + {k}) * {ROW_BYTES}"
                f" + pcol * {PATCH} + 1, {PATCH})"
            )
            for k in range(PATCH)
        ]
    )
    return (
        m.select("media_id", "payload", F.explode(prow).alias("prow"))
        .select("media_id", "payload", "prow", F.explode(pcols).alias("pcol"))
        .select(
            "media_id",
            "prow",
            "pcol",
            F.md5(segs).alias("patch_md5"),
        )
        .transform(barrier_sort("media_id", "prow", "pcol"))
    )


# ---------------------------------------------------------------------------
# RMS-threshold activity segmentation (round 4): q_mm_audio_rms frames
# composed with the q_w9 gaps-and-islands key — VAD-shaped segmentation.
# ---------------------------------------------------------------------------

ACTIVE_RMS = 99.1  # frames at/above this RMS are "active" (fixture median)


@register(
    "q_mm_segments",
    oracle=(
        "WITH idx AS (SELECT doc_id AS media_id, text, "
        "unnest(range(1, length(text) + 1)) AS i FROM documents), "
        f"s AS (SELECT media_id, CAST((i - 1) // {AUDIO_WINDOW} AS INT) AS win, "
        "unicode(text[i]) AS v FROM idx), "
        "r AS (SELECT media_id, win, CAST(COUNT(*) AS BIGINT) AS n_samples, "
        "SUM(v * v) AS esum, sqrt(SUM(v * v) * 1.0 / COUNT(*)) AS rms "
        "FROM s GROUP BY 1, 2), "
        f"act AS (SELECT *, win - ROW_NUMBER() OVER ("
        "  PARTITION BY media_id ORDER BY win) AS grp "
        f" FROM r WHERE rms >= {ACTIVE_RMS}) "
        "SELECT media_id, CAST(MIN(win) AS BIGINT) AS seg_start, "
        "CAST(MAX(win) AS BIGINT) AS seg_end, "
        "CAST(COUNT(*) AS BIGINT) AS n_frames, "
        "sqrt(SUM(esum) * 1.0 / SUM(n_samples)) AS seg_rms "
        "FROM act GROUP BY media_id, grp ORDER BY media_id, seg_start"
    ),
    doc="Activity segmentation over the audio-shaped frames: contiguous "
    f"runs of windows with RMS >= {ACTIVE_RMS} become segments (VAD's "
    "shape: silence-gap splitting), each reported with its span and an "
    "EXACT segment-level RMS recomputed from the integer energy sums — "
    "not a mean of per-frame floats, so the output is bit-stable on "
    "both engines (integer-valued doubles sum exactly; one division + "
    "one IEEE sqrt at the end). Composition: q_mm_audio_rms's "
    "mapInPandas framing feeds the q_w9 islands key (win minus "
    "row_number). Scale: framing is map-only; the islands window is "
    "one shuffle on media_id; segments are output-bounded.",
)
def q_mm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    frames = q_mm_audio_rms(spark, sf_dir).withColumn(
        "esum", F.col("energy") * F.col("n_samples")
    )
    act = frames.filter(F.col("rms") >= ACTIVE_RMS).withColumn(
        "grp",
        F.col("win")
        - F.row_number().over(
            Window.partitionBy("media_id").orderBy("win")
        ),
    )
    return (
        act.groupBy("media_id", "grp")
        .agg(
            F.min("win").cast("long").alias("seg_start"),
            F.max("win").cast("long").alias("seg_end"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sqrt(F.sum("esum") / F.sum("n_samples")).alias("seg_rms"),
        )
        .drop("grp")
        .orderBy("media_id", "seg_start")
    )
