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


from csv_query_engine_spark.pipeline.common import spread as _spread

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
        # double, not float: the fake features are exact integer ratios
        # (residue-class counts / n_bytes) and the oracle twin computes
        # them in SQL doubles — float32 would drift the 6th decimal.
        T.StructField("feature", T.ArrayType(T.DoubleType())),
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
                hist = np.zeros(feature_dim, dtype=np.float64)
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
    spread = _spread(df.select(id_col, "media"))
    return spread.mapInPandas(_decode, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Resize pass over binary media (mapInPandas, same shape as a real
    PIL/libvips stage). ``fake=True`` deterministically re-samples the
    byte stream to width×height bytes (stride sampling — the plumbing
    twin of pixel resampling) and rewrites the metadata struct;
    ``fake=False`` is the real-codec path, stubbed in this environment.
    """
    if not fake:
        raise NotImplementedError(
            "Real resizing requires image libraries not present in this "
            "environment; use fake=True for the deterministic stub."
        )
    target = int(width) * int(height)

    def _resize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_media, metas = [], []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8) if blob is not None else np.array([], np.uint8)
                if arr.size == 0:
                    res = np.zeros(target, dtype=np.uint8)
                else:
                    idx = (np.arange(target, dtype=np.float64) * arr.size / target).astype(np.int64)
                    res = arr[np.minimum(idx, arr.size - 1)]
                out_media.append(res.tobytes())
                metas.append(
                    {"format": "fake/resized", "width": width, "height": height, "n_bytes": target}
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "media": out_media, "meta": metas}
            )

    spread = _spread(df.select(id_col, "media"))
    return spread.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 4,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Frame sampling over binary video (1 row -> N frame rows via
    mapInPandas — the expansion shape an ffmpeg keyframe extractor
    produces). ``fake=True`` treats the blob as consecutive
    ``frame_bytes``-sized frames and keeps every ``every_n``-th.

    Scale: expansion is map-side; downstream per-frame work inherits
    the spread partitioning, and frame rows carry (doc_id, frame_idx)
    so a later groupBy(doc_id) re-collects without data loss.
    """
    if not fake:
        raise NotImplementedError(
            "Real frame extraction requires video libraries not present in "
            "this environment; use fake=True for the deterministic stub."
        )

    def _frames(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                n_frames = max(len(data) // frame_bytes, 0)
                for fi in range(0, n_frames, every_n):
                    chunk = data[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    spread = _spread(df.select(id_col, "media"))
    return spread.mapInPandas(_frames, schema=FRAME_SCHEMA)
