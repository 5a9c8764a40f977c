"""Multimodal (binary) column plumbing for training-data pipelines.

Images / audio / video ride through Spark as opaque ``binary`` columns with a
typed metadata struct; the decode step is library-dependent and NOT available
in this container, so it is stubbed behind ``decode_media`` — but everything
Spark-side (schema, Arrow batch shape, ``mapInPandas`` signature,
partition-preserving flow) is real and tested.

- ``with_payload``     attach (payload: binary, media: struct) derived
                       deterministically from the text column — the stand-in
                       for a real WARC body / image blob.
- ``byte_features``    REAL feature extraction over the binary payload via
                       ``mapInPandas`` + numpy: byte count, mean byte, Shannon
                       entropy of the byte histogram.  Deterministic; this is
                       the exact execution shape a JPEG-decode UDF would use.
- ``decode_media``     the gated decode stub (raises NotImplementedError) —
                       swap in Pillow/librosa/ffmpeg bindings on a real
                       cluster without touching the plan.

Scale notes: ``mapInPandas`` streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob sizes;
no shuffle is introduced (narrow transform), so the feature stage pipelines
with the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

BYTE_FEATURES_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("first_byte", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("entropy", DoubleType()),
])


def with_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach a deterministic binary payload + metadata struct.

    payload = UTF-8 bytes of the text (the stand-in for a WARC body); a real
    ingest would read the blob column straight off Iceberg/parquet — the
    downstream plumbing is identical.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


def byte_features(df: DataFrame) -> DataFrame:
    """numpy feature extraction over binary payloads (Arrow-batched).

    Input: (id, payload: binary[, ...]); output per BYTE_FEATURES_SCHEMA.
    Entropy is Shannon entropy (bits) of the byte-value histogram — the
    deterministic stand-in for a real decoder's feature vector, with the
    same mapInPandas batch shape a JPEG/Wav decode would have.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, fb, mb, ent = [], [], [], [], []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                ids.append(i)
                nb.append(int(arr.size))
                fb.append(int(arr[0]) if arr.size else -1)
                mb.append(float(arr.mean()) if arr.size else 0.0)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    ent.append(float(-(p * np.log2(p)).sum()))
                else:
                    ent.append(0.0)
            yield pd.DataFrame({
                "id": ids, "n_bytes": nb, "first_byte": fb,
                "mean_byte": mb, "entropy": ent,
            })

    return df.select("id", "payload").mapInPandas(extract, BYTE_FEATURES_SCHEMA)


def decode_media(df: DataFrame, mime: str) -> DataFrame:
    """Decode stub: image/audio/video codecs are not in this container.

    On a real cluster, replace the body with a mapInPandas over the same
    (id, payload) projection calling Pillow / soundfile / pyav; the plan
    shape (narrow Arrow-batched transform after an Iceberg scan) is already
    exercised by ``byte_features``.
    """
    raise NotImplementedError(
        f"decode for {mime!r} requires media libraries not present in this "
        "environment; use byte_features for the deterministic fake path"
    )
