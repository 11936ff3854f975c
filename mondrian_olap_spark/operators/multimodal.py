"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDF stages.

The Spark-side architecture is real and tested — schema, partitioning,
``mapInPandas`` batch shape, feature-column contract; only the *codec* layer
is stubbed: this container has no image/audio libraries, so ``decode_media``
uses a deterministic fake decoder unless a real one is injected
(``NotImplementedError`` from :func:`real_decoder` marks the seam).

At scale: media payloads dominate partition size, so ``repartition_for_media``
targets a row-count per partition from the expected payload size instead of
relying on input file splits; decode stages are ``mapInPandas`` (one Arrow
batch in flight per core, no full-partition materialisation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

#: decode output: fixed-size feature vector + decoded dimensions
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8


def real_decoder(kind: str, payload: bytes) -> tuple[int, int, list[float]]:
    """Seam for a real codec (PIL / torchaudio / ffmpeg).  Not available in
    this environment."""
    raise NotImplementedError(
        "media codecs are not installed in this container; inject a decoder "
        "or use fake_decoder for plumbing tests"
    )


def fake_decoder(kind: str, payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: dimensions and features derived from
    the payload digest — stable across runs/partitions, so the distributed
    plumbing is fully testable without codecs."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    feats = [((b / 255.0) * 2.0 - 1.0) for b in digest[:FEATURE_DIM]]
    return width, height, [float(f) for f in feats]


def decode_media(
    df: DataFrame,
    decoder: Callable[[str, bytes], tuple[int, int, list[float]]] = fake_decoder,
) -> DataFrame:
    """Decode/feature-extract stage as ``mapInPandas`` — Arrow batches in,
    Arrow batches out; payload bytes never transit the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, feats = decoder(kind, bytes(payload) if payload is not None else b"")
                rows.append((mid, kind, w, h, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "features"]
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(
    df: DataFrame, every_n: int = 10, frame_count_key: str = "frames"
) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame index,
    from the ``meta['frames']`` count — pure expression (the actual frame
    decode would chain :func:`decode_media` on the sampled indices)."""
    n = F.coalesce(F.element_at(F.col("meta"), frame_count_key).cast("int"), F.lit(0))
    idx = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    return df.select("media_id", "kind", F.explode(idx).alias("frame_index"))


#: resize output: payload replaced by the (re-encoded) resized bytes
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def fake_resizer(kind: str, payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Deterministic stand-in resizer: dimensions from the payload digest
    scaled into the bound, payload replaced by a digest-derived stub of
    proportional length — stable plumbing without codecs."""
    digest = hashlib.md5(payload or b"").digest()
    w, h = 16 + digest[0], 16 + digest[1]
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    out = (digest * (1 + (nw * nh) // len(digest)))[: max(1, (nw * nh) // 4)]
    return out, nw, nh


def resize_media(
    df: DataFrame,
    max_side: int = 256,
    resizer: Callable[[str, bytes, int], tuple[bytes, int, int]] = fake_resizer,
) -> DataFrame:
    """Resize stage as ``mapInPandas``: payload-in/payload-out per Arrow
    batch (the shape a PIL/ffmpeg resizer drops into via ``resizer=``);
    bytes never transit the driver, one batch in flight per core."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                out, w, h = resizer(
                    kind, bytes(payload) if payload is not None else b"", max_side
                )
                rows.append((mid, kind, out, w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height"]
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def repartition_for_media(
    df: DataFrame,
    target_partition_bytes: int = 128 << 20,
    avg_payload_bytes: int = 1 << 20,
    total_rows: int | None = None,
) -> DataFrame:
    """Partition by expected payload volume, not row count: media rows are
    orders of magnitude wider than their file-split row estimate assumes.

    Sizing never triggers a blocking scan: pass ``total_rows`` when known;
    otherwise the partition count derives from Catalyst's plan statistics
    (row count when available, else the scan's size estimate) — an extra
    full pass over a media table just to count it would read the payloads
    twice."""
    rows_per_partition = max(1, target_partition_bytes // avg_payload_bytes)
    if total_rows is not None:
        parts = max(1, total_rows // rows_per_partition)
    else:
        try:
            stats = df._jdf.queryExecution().optimizedPlan().stats()
        except AttributeError:  # Spark Connect: no _jdf — stats unavailable
            raise ValueError(
                "repartition_for_media needs total_rows= when plan "
                "statistics are unavailable (Spark Connect session)"
            ) from None
        rc = stats.rowCount()
        if rc.isDefined():
            parts = max(1, int(str(rc.get())) // rows_per_partition)
        else:
            # parquet scans report total file bytes; payload dominates, so
            # bytes/target is the partition count directly.  Statless
            # sources report spark.sql.defaultSizeInBytes (Long.MaxValue) —
            # deriving a partition count from that would request millions
            # of partitions, so demand an explicit row count instead.
            size = int(str(stats.sizeInBytes()))
            if size >= (1 << 60):
                raise ValueError(
                    "source reports no size statistics — pass total_rows= "
                    "(deriving partitions from defaultSizeInBytes would "
                    "produce a pathological repartition)"
                )
            parts = max(1, size // target_partition_bytes)
    return df.repartition(int(min(parts, 1 << 16)))
