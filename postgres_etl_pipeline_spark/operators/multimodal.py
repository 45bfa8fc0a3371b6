"""Multimodal column plumbing (SURVEY §7 Phase 5).

Pattern for image/audio/video at 100 TB: the payload is an opaque ``binary``
column travelling WITH typed metadata (a struct), decoded lazily by
Arrow-batched Python only where built-ins can't express the op.

The container has no image/audio libs, so the actual decode is STUBBED
(``decode_payload`` raises NotImplementedError); everything around it — the
schema, the mapInPandas batch shape, partition sizing — is real and tested.
A deterministic fake feature extractor stands in for decode in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata struct.

    (Stand-in for reading real media blobs; at 100 TB the payload column
    would come straight from parquet/ORC binary pages and metadata from
    sidecar columns — same schema either way.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, kind: str):
    """Real media decode — NOT IMPLEMENTED in this container (no PIL/ffmpeg).

    At deploy time this dispatches on ``kind`` to the codec; tests exercise
    the surrounding Spark plumbing via the deterministic fake below.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libs not present here"
    )


def _fake_feature(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: little-endian
    uint32 windows of the first 4*dim payload bytes, scaled to [0, 1)."""
    out = []
    for i in range(dim):
        chunk = payload[4 * i : 4 * i + 4].ljust(4, b"\0")
        out.append(int.from_bytes(chunk, "little") / 2**32)
    return out


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each Python worker sees a pandas DataFrame of payload
    bytes, returns feature vectors — the 10-100× faster path vs row-at-a-time
    UDFs. Scale: pure map (no shuffle); size input partitions so a batch of
    payloads fits worker memory (spark.sql.files.maxPartitionBytes for media
    blobs is usually lowered, not raised).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
