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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("orig_n_bytes", T.LongType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_n_bytes", T.LongType(), False),
        T.StructField("n_frames_total", T.LongType(), False),
    ]
)


def _fake_resize(payload: bytes, target_len: int) -> bytes:
    """Deterministic stand-in for an image resize: stride-resample the
    payload bytes to exactly ``target_len`` (nearest-neighbor over the byte
    stream). Real deploy swaps this for PIL/libvips inside the same batch
    loop — the Spark-side contract (binary in, fixed-size binary out,
    metadata updated) is what's under test."""
    if not payload:
        return bytes(target_len)
    n = len(payload)
    return bytes(payload[(i * n) // target_len] for i in range(target_len))


def resize_payloads(df: DataFrame, target_len: int = 64) -> DataFrame:
    """'Resize' every payload to a fixed byte budget via mapInPandas.

    Pure map — no shuffle; output rows are uniformly ``target_len`` bytes,
    which is the property downstream training shards rely on (fixed-size
    records pack without per-row length bookkeeping). Input partition
    sizing note as in extract_features.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [_fake_resize(p, target_len) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                    "orig_n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, every_k: int = 2
) -> DataFrame:
    """Frame sampling: ONE payload row → MANY frame rows via mapInPandas.

    The video pattern at 100 TB: the expansion happens executor-side inside
    the Arrow batch loop (never collect-and-loop on the driver), and the
    output is re-partitionable by (doc_id, frame_idx) for downstream
    per-frame work. The fake 'codec' treats the payload as fixed-size
    ``frame_bytes`` chunks and keeps every ``every_k``-th, mirroring
    keyframe/stride sampling; a real build decodes with ffmpeg in the same
    loop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame": [],
                "frame_n_bytes": [],
                "n_frames_total": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = payload or b""
                n_total = (len(p) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_total, every_k):
                    frame = p[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame)
                    out["frame_n_bytes"].append(len(frame))
                    out["n_frames_total"].append(n_total)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)
