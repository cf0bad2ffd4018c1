"""Multimodal columns for LLM training-data pipelines (SURVEY §2.12 L5).

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata (a struct of kind/mime/size), exactly how Parquet-backed
multimodal datasets store image/audio/video at scale — the engine never
interprets bytes except inside explicitly vectorized decode stages.

Decode/feature-extraction runs through ``mapInPandas``: Arrow batches
in, Arrow batches out, one Python worker per input partition, constant
memory (iterator of batches — never a whole partition materialized).
The actual codec calls (Pillow/torchaudio/ffmpeg) are NOT available in
this container, so the codec boundary is a stub:
``decode_image_real`` raises ``NotImplementedError`` and tests/queries
inject ``fake_decode_meta`` — a deterministic stand-in that derives
"decoded" properties from the payload bytes. The Spark-side plumbing
(schemas, batch iteration, partitioning, UDF signatures) is real and
exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.shipping import ensure_shipped
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode (Pillow). STUB: the codec libraries are not in
    this container; swap this in on a cluster image that ships them."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "use fake_decode_meta for plumbing tests"
    )


def _meta_from_digest(h: bytes, kind: str) -> tuple[int, int, int]:
    width = 64 + h[0] % 192  # 64..255
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 30
    return width, height, n_frames


def fake_decode_meta(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for codec output: (width, height, n_frames)
    derived from the payload bytes. Same bytes → same answer on every
    worker, so tests are stable."""
    import hashlib

    return _meta_from_digest(hashlib.sha256(payload).digest(), kind)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal layout from the text corpus: payload =
    utf-8 bytes of the text (an honest opaque binary), typed metadata
    struct, kind assigned round-robin."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


def decode_media(media_df: DataFrame) -> DataFrame:
    """``mapInPandas`` decode/feature-extract stage.

    Iterator-of-batches signature: each Arrow batch is decoded and
    yielded immediately — executor memory stays bounded by the Arrow
    batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
    the partition size, which is what makes a 100 TB media scan safe.
    """
    ensure_shipped(media_df.sparkSession)

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["kind"] = pdf["media"].map(lambda m: m["kind"])
            out["n_bytes"] = pdf["media"].map(lambda m: m["n_bytes"])
            # one sha256 per payload: the digest feeds BOTH the fake
            # codec metadata and the checksum column (hashing is the
            # dominant per-row cost of this stage; don't pay it twice)
            digests = [hashlib.sha256(bytes(p)).digest() for p in pdf["payload"]]
            decoded = [
                _meta_from_digest(h, k) for h, k in zip(digests, out["kind"])
            ]
            out["width"] = pd.Series(
                [d[0] for d in decoded], dtype="int32"
            )
            out["height"] = pd.Series(
                [d[1] for d in decoded], dtype="int32"
            )
            out["n_frames"] = pd.Series(
                [d[2] for d in decoded], dtype="int32"
            )
            out["checksum"] = [h.hex() for h in digests]
            yield out

    return media_df.mapInPandas(decode_batches, DECODED_SCHEMA)


@query("l5_multimodal")  # rows-only: fake-codec output is not SQL
def l5_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: full multimodal pass — attach binary payload + typed metadata,
    decode via ``mapInPandas``, aggregate per media kind. The aggregate
    (count, total bytes, mean dims) is the sanity surface a real
    image/audio pipeline reports after a decode sweep."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(docs))
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        (F.floor(1e2 * F.avg("width")) / 1e2).alias("avg_width"),
        (F.floor(1e2 * F.avg("height")) / 1e2).alias("avg_height"),
        F.max("n_frames").alias("max_frames"),
    )
