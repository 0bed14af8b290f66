"""Multimodal (binary) column plumbing.

Images / audio / video are carried as opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side machinery — schema,
partition-preserving Arrow-batched processing via ``mapInPandas``, batch
shapes — is real and tested; the actual media *decode* step is stubbed
(``NotImplementedError`` behind ``decoder="real"``) because no
image/audio libraries ship in this container, with a deterministic fake
decoder used for tests and queries.

At 100 TB: blobs stay columnar in parquet; ``mapInPandas`` streams Arrow
record batches through Python with zero row-at-a-time overhead, and the
feature extraction is per-partition embarrassingly parallel (no shuffle).
Metadata-only plans (byte sizes, content hashes) never deserialize the
blob into Python at all — they stay JVM-side.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_blob(text_column: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Materialize an opaque binary payload + metadata struct from a text
    column (stand-in for real media bytes; deterministic).

    Adds: ``blob`` (binary), ``blob_meta`` (struct<format,n_bytes>).
    """

    def _transform(df: DataFrame) -> DataFrame:
        blob = F.encode(F.col(text_column), "utf-8")
        return df.withColumn("blob", blob).withColumn(
            "blob_meta",
            F.struct(
                F.lit("raw/utf-8").alias("format"),
                F.length(blob).cast("long").alias("n_bytes"),
            ),
        )

    return _transform


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("head_checksum", T.LongType()),
    ]
)


def extract_blob_features(
    id_column: str = "doc_id",
    blob_column: str = "blob",
    decoder: str = "fake",
    batch_hint: int = 1024,
) -> Callable[[DataFrame], DataFrame]:
    """Arrow-batched feature extraction over a binary column.

    ``decoder="fake"``: deterministic byte statistics (mean/min/max,
    64-byte-head checksum) standing in for a real decode→feature pipeline.
    ``decoder="real"``: raises NotImplementedError — the media libraries
    (PIL/ffmpeg/etc.) are not available in this environment; plug the real
    decode into ``_decode_batch`` when they are.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        if decoder == "real":
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg, not present in "
                "this container; use decoder='fake'"
            )
        import numpy as np

        blobs = pdf[blob_column]
        n_bytes, mean, bmin, bmax, checksum = [], [], [], [], []
        for raw in blobs:
            arr = np.frombuffer(raw or b"", dtype=np.uint8)
            n_bytes.append(int(arr.size))
            mean.append(float(arr.mean()) if arr.size else 0.0)
            bmin.append(int(arr.min()) if arr.size else 0)
            bmax.append(int(arr.max()) if arr.size else 0)
            checksum.append(int(arr[:64].astype(np.int64).sum()))
        return pd.DataFrame(
            {
                "doc_id": pdf[id_column].astype("int64"),
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "byte_mean": pd.Series(mean, dtype="float64"),
                "byte_min": pd.Series(bmin, dtype="int32"),
                "byte_max": pd.Series(bmax, dtype="int32"),
                "head_checksum": pd.Series(checksum, dtype="int64"),
            }
        )

    def _transform(df: DataFrame) -> DataFrame:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    yield _decode_batch(pdf)

        return df.select(id_column, blob_column).mapInPandas(
            gen, schema=_FEATURE_SCHEMA
        )

    return _transform
