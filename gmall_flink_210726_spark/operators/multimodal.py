"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). The container has
no image/audio codecs, so the decode kernels are STUBS behind
``try-import`` (decode_image/decode_audio raise NotImplementedError
without the libs, exactly as documented); what IS real and tested:

- the column contract: ``content binary`` + ``meta struct<format,
  width, height, sample_rate>``;
- the Spark-side plumbing: ``mapInPandas`` over Arrow batches with a
  bounded batch size, schema declared up front, partition-preserving;
- a deterministic fake decoder (header peek + byte stats) exercising
  the identical UDF signature and batch shape the real codecs drop
  into.

Scale design (100 TB of media): blobs never pass through Python row-
by-row — Arrow moves each batch once; per-batch work is vectorized;
decode parallelism is partition parallelism (``repartition(n)`` before
the map when blob sizes skew).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("sample_rate", LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("header", LongType()),
        StructField("checksum", LongType()),
    ]
)

try:  # pragma: no cover — not in this container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAVE_PIL = False


def decode_image(content: bytes):  # pragma: no cover — real-codec path
    """Real image decode — requires PIL; stubbed in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError("image codec not available in this environment")
    import io

    return Image.open(io.BytesIO(content))


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in with the same shape a real decoder has:
    reads each blob once, emits fixed-schema features."""
    out = {
        "media_id": pdf["media_id"],
        "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
        "header": pdf["content"].map(
            lambda b: int.from_bytes(b[:4], "big") if b and len(b) >= 4 else 0
        ),
        "checksum": pdf["content"].map(
            lambda b: sum(b[:64]) if b is not None else 0
        ),
    }
    return pd.DataFrame(out)


def decode_media(df: DataFrame, batch_size: int | None = None) -> DataFrame:
    """mapInPandas decode pipeline over MEDIA_SCHEMA-shaped input.

    Pass ``batch_size`` to bound Arrow batch memory for large blobs
    (sets the session's ``arrow.maxRecordsPerBatch`` — a session-wide
    knob, so only set it when you mean it; the default leaves the
    session untouched). The iterator shape lets a real decoder stream
    batch-by-batch without materializing a partition."""
    spark = df.sparkSession
    if batch_size is not None:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )
    from gmall_flink_210726_spark.session import ship_package

    ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return df.select("media_id", "content").mapInPandas(gen, DECODED_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents fixture: utf-8
    bytes as the opaque payload (the container has no real media), with
    plausible metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("txt").alias("format"),
            F.lit(0).cast("long").alias("width"),
            F.lit(0).cast("long").alias("height"),
            F.lit(0).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )
