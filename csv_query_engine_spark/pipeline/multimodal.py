"""Multimodal column plumbing (SURVEY.md §7 phase 6).

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-friendly
layout, Arrow-batched UDF signatures, batch shapes — is real and tested;
the actual codec work is STUBBED (this environment ships no media
libraries): ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested, which produces reproducible
pseudo-features from the bytes so downstream plumbing can be exercised
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary 'media' column + metadata struct from
    the text column — stands in for real image bytes so the binary-column
    pipeline is testable in this environment."""
    media = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
            F.length(media).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, id_col: str = "doc_id", fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary media via
    mapInPandas.

    ``fake=False`` is the real-codec path and raises NotImplementedError
    (no PIL/ffmpeg here); ``fake=True`` computes deterministic
    pseudo-features (byte statistics + a folded byte histogram) with the
    same schema, batch shape, and partitioning the real path would use.
    """
    if not fake:
        raise NotImplementedError(
            "Real media decoding requires image/audio libraries not present "
            "in this environment; use fake=True for the deterministic stub."
        )

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats, means, sizes = [], [], []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8) if blob is not None else np.array([], np.uint8)
                sizes.append(int(arr.size))
                means.append(float(arr.mean()) if arr.size else 0.0)
                hist = np.zeros(feature_dim, dtype=np.float32)
                if arr.size:
                    np.add.at(hist, arr % feature_dim, 1.0)
                    hist /= arr.size
                feats.append(hist.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "byte_mean": pd.Series(means, dtype="float64"),
                    "feature": feats,
                }
            )

    # spread: decode parallelism must not inherit a single-file scan layout
    spread = df.select(id_col, "media").repartition(df.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(_decode, schema=FEATURE_SCHEMA)
