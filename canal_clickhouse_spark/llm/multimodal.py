"""Multimodal columns: opaque binary payloads + typed metadata structs.

The engine's contract for image/audio/video at 100 TB: the payload is a
`binary` column that is NEVER parsed JVM-side — only sliced, hashed,
length-checked, filtered, and routed; decode/feature-extraction happens in
Arrow-batched Python (`mapInPandas`), one batch at a time, so a 1000-executor
cluster decodes in parallel with zero driver involvement and the JVM plan
(filter → project → repartition) still prunes and pushes down around the
opaque column.

The decode step itself is a STUB (no image/audio libs in this container —
SURVEY.md §2K): `decode_payload` raises NotImplementedError unless the
deterministic fake decoder is requested; the Spark-side plumbing — schema,
batch iteration, partition mapping — is real and oracle/unit-tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "multimodal_struct",
    oracle="""
    SELECT doc_id,
           md5(text) AS payload_md5,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           lang,
           n_chars
    FROM documents
    WHERE octet_length(encode(text)) >= 200 AND lang <> 'zh'
    -- md5(text) == md5 of the utf-8 payload: texts are pure ASCII
    """,
)
def multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct, filtered/projected without decoding.

    Text bytes stand in for media payloads (same BinaryType column shape).
    Every operation — length, digest, predicate — runs on the opaque bytes
    JVM-side; the oracle checks the digest so the byte path is hash-verified
    end-to-end.
    """
    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.struct(
            F.encode("text", "utf-8").alias("bytes"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("n_chars"),
        ).alias("media"),
    )
    return media.filter(
        (F.length("media.bytes") >= 200) & (F.col("media.lang") != "zh")
    ).select(
        "doc_id",
        F.md5("media.bytes").alias("payload_md5"),
        F.length("media.bytes").alias("n_bytes"),
        F.col("media.lang").alias("lang"),
        F.col("media.n_chars").alias("n_chars"),
    )


def decode_payload(payload: bytes, *, fake: bool = False) -> dict[str, Any]:
    """Decode one media payload into features.

    Real decoders (PIL/ffmpeg/torchaudio) are not available in this
    container; ``fake=True`` selects the deterministic stand-in used by
    tests: features derived purely from the byte content, so the pipeline
    shape (schema, batching, parallelism) is exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 1 + payload[0] % 64 if n else 0,
        "height": 1 + payload[-1] % 64 if n else 0,
        "checksum": sum(payload) % 65536,
    }


DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, checksum int"
)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, bytes) → feature rows.

    This is the real plumbing a production decoder drops into — swap the
    fake decoder for the library call and nothing else changes.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [decode_payload(b, fake=True) for b in pdf["bytes"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, DECODED_SCHEMA)


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(1 + ascii(text[1]) % 64 AS INT) AS width,
           CAST(1 + ascii(text[-1]) % 64 AS INT) AS height,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                         i -> ascii(text[i]))) % 65536 AS INT) AS checksum
    FROM documents
    -- texts are pure ASCII (verified per scale factor), so char codes ==
    -- utf-8 byte values and length == octet_length
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline end-to-end with the deterministic fake decoder.

    Because the fake features are pure functions of the bytes, the Python
    decode path is hash-checkable against a SQL recomputation — proving the
    Arrow round-trip preserves the payload bit-for-bit.
    """
    docs = table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("bytes"))
    return decode_features(media)


FRAME = 64  # bytes per sampled frame
FSTRIDE = 128  # byte stride between frame starts (sample every other frame)

FRAMES_SCHEMA = (
    "doc_id long, frame_idx long, frame_md5 string, frame_bytes int"
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling over opaque binary payloads: every FSTRIDE bytes,
    take a FRAME-byte window — the video-keyframe / audio-clip sampling
    shape. Arrow-batched `mapInPandas`; the JVM plan never parses the
    payload, Python sees one batch of (doc_id, bytes) at a time."""
    import hashlib

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bytes"]):
                n = len(payload)
                for i in range((n + FSTRIDE - 1) // FSTRIDE):
                    frame = payload[i * FSTRIDE : i * FSTRIDE + FRAME]
                    rows.append(
                        (doc_id, i, hashlib.md5(frame).hexdigest(), len(frame))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "frame_bytes"]
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


@query(
    "multimodal_framesample",
    oracle=f"""
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           md5(substr(text, i * {FSTRIDE} + 1, {FRAME})) AS frame_md5,
           CAST(least({FRAME}, length(text) - i * {FSTRIDE}) AS INT)
             AS frame_bytes
    FROM documents,
         UNNEST(range(0, (length(text) + {FSTRIDE} - 1) // {FSTRIDE}))
           AS r(i)
    ORDER BY doc_id, frame_idx
    -- texts are pure ASCII, so char windows == byte windows and md5 of the
    -- substring equals md5 of the sliced payload
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample key: 64-byte frames every 128 payload bytes, one md5 +
    length per frame. The Python fan-out is hash-checked against a SQL
    recomputation (ASCII ⇒ byte slices == char slices), pinning both the
    Arrow byte round-trip and the sampling geometry. At 100 TB the same
    mapInPandas samples real video keyframes — the plumbing (schema, batch
    iteration, per-row fan-out) is what this key proves.
    """
    docs = table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("bytes"))
    return sample_frames(media).orderBy("doc_id", "frame_idx")


RESIZE_TARGET = 256  # stand-in "resize": downsample payload to ≤256 samples

RESIZED_SCHEMA = "doc_id long, out_n int, stride int, resized_md5 string"


def resize_payloads(media: DataFrame) -> DataFrame:
    """Stand-in resize over opaque payloads: stride-sample the bytes down to
    ≤ RESIZE_TARGET evenly-spaced samples (stride = ⌈n/256⌉) and digest the
    result — the geometry/plumbing of an image resize (decode → interpolate
    → re-encode) with the interpolation replaced by a deterministic
    byte-space downsample. A real implementation swaps the sampling loop
    for PIL's `Image.resize` and nothing else changes (same Arrow batches,
    same schema discipline).
    """
    import hashlib

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bytes"]):
                n = len(payload)
                stride = max(1, (n + RESIZE_TARGET - 1) // RESIZE_TARGET)
                sampled = payload[::stride]
                rows.append(
                    (doc_id, len(sampled), stride,
                     hashlib.md5(sampled).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_n", "stride", "resized_md5"]
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


@query(
    "multimodal_resize",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, length(text) AS n,
               GREATEST(1, (length(text) + {RESIZE_TARGET - 1})
                           // {RESIZE_TARGET}) AS stride
        FROM documents
    )
    SELECT d.doc_id,
           CAST((g.n + g.stride - 1) // g.stride AS INT) AS out_n,
           CAST(g.stride AS INT) AS stride,
           md5(array_to_string(list_transform(
               range(0, (g.n + g.stride - 1) // g.stride),
               i -> d.text[i * g.stride + 1]), '')) AS resized_md5
    FROM documents d JOIN g USING (doc_id)
    ORDER BY d.doc_id
    -- ASCII texts: char stride-sampling == byte stride-sampling
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step of the media pipeline, hash-checked: Python's strided
    byte downsample must equal the SQL recomputation exactly (md5 of the
    sampled bytes) — pinning the Arrow round-trip and the sampling
    geometry the way `multimodal_framesample` pins frame windows.
    """
    docs = table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("bytes"))
    return resize_payloads(media).orderBy("doc_id")


FEATURES_SCHEMA = (
    "doc_id long, mean_sc long, n_distinct int, top_byte int"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Stand-in feature extraction: byte-distribution statistics (scaled
    mean, distinct byte count, modal byte with min tie-break) — the
    embed/classify step's plumbing with the neural net replaced by exact
    integer features both engines can recompute.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bytes"]):
                n = len(payload)
                counts: dict[int, int] = {}
                for b in payload:
                    counts[b] = counts.get(b, 0) + 1
                top = min(
                    (b for b in counts), key=lambda b: (-counts[b], b)
                ) if counts else 0
                rows.append(
                    (doc_id, (sum(payload) * 10000) // n if n else 0,
                     len(counts), top)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "mean_sc", "n_distinct", "top_byte"]
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    WITH ex AS (
        SELECT doc_id, ascii(text[i]) AS b
        FROM documents, UNNEST(range(1, length(text) + 1)) AS r(i)
    ),
    cnt AS (
        SELECT doc_id, b, COUNT(*) AS c FROM ex GROUP BY doc_id, b
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, b) AS rk
        FROM cnt
    )
    SELECT doc_id,
           CAST((SUM(b * c) * 10000) // SUM(c) AS BIGINT) AS mean_sc,
           CAST(COUNT(*) AS INT) AS n_distinct,
           CAST(MIN(CASE WHEN rk = 1 THEN b END) AS INT) AS top_byte
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction step, hash-checked: byte-distribution features
    (floor-scaled mean, distinct count, modal byte) computed in Arrow
    Python must match the SQL recomputation — integer arithmetic
    throughout, so the check is exact.
    """
    docs = table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("bytes"))
    return extract_features(media).orderBy("doc_id")


@query(
    "multimodal_dedup",
    oracle="""
    WITH media AS (
        SELECT doc_id, md5(text) AS payload_md5,
               octet_length(encode(text)) AS n_bytes
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, md5(text), octet_length(encode(text))
        FROM documents WHERE doc_id % 4 = 0
    ),
    grouped AS (
        SELECT payload_md5,
               MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        FROM media GROUP BY payload_md5
    )
    SELECT canonical_id, n_copies, total_bytes,
           CAST(total_bytes - total_bytes / n_copies AS BIGINT)
               AS reclaimable_bytes
    FROM grouped ORDER BY canonical_id
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed media dedup: group binary payloads by md5 digest,
    keep the smallest doc_id as canonical, report copy counts and the
    bytes a dedup'd store reclaims — the image/audio twin of `dedup_exact`
    (a re-crawled image dedups by content hash regardless of filename or
    metadata). A quarter of the corpus is re-ingested under new ids to
    give the key real duplicates.

    Only (digest, id, n_bytes) ever shuffles — ~40 bytes/payload whether
    the payload is 1 KB of text or 40 MB of video, which is what makes
    content-addressed dedup the FIRST pass of a multimodal pipeline at
    100 TB (it runs at metadata cost before any decode).
    """
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.encode("text", "utf-8").alias("bytes"))
    redup = base.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    media = base.unionByName(redup).select(
        "doc_id",
        F.md5("bytes").alias("payload_md5"),
        F.length("bytes").cast("bigint").alias("n_bytes"),
    )
    grouped = media.groupBy("payload_md5").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.sum("n_bytes").alias("total_bytes"),
    )
    return grouped.select(
        "canonical_id",
        "n_copies",
        "total_bytes",
        (F.col("total_bytes") - F.col("total_bytes") / F.col("n_copies"))
        .cast("bigint")
        .alias("reclaimable_bytes"),
    ).orderBy("canonical_id")
