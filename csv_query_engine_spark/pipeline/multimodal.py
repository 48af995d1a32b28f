"""Multimodal column plumbing (SURVEY.md §7 phase 6).

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-friendly
layout, Arrow-batched UDF signatures, batch shapes — is real and tested.
Two codec tiers:

* ``fake=True`` — deterministic pseudo-features straight from the blob
  bytes (reproducible, oracle-checked; stands in for codecs that need
  external libraries: JPEG/PNG/ffmpeg are NOT in this environment).
* ``fake=False`` — a REAL stdlib+numpy decoder for uncompressed
  formats: binary PPM (P6) and 24-bit uncompressed BMP. The header is
  genuinely parsed (comments, padding, bottom-up BMP row order), the
  pixel array genuinely decoded, and features computed over DECODED
  PIXELS — :func:`ppm_encode` emits valid P6 blobs so the whole
  encode→decode→feature path is oracle-checkable end-to-end
  (``media_ppm_decode_stats`` in queries/pipeline_q.py). Compressed
  formats still require external libs and raise ``ValueError`` from
  the parser.
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
        # real-codec path only (parsed from the image header); -1 in
        # fake mode where no pixel geometry exists
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _make_image_parser():
    """Build the real uncompressed-image parser as a NESTED function so
    cloudpickle serializes it by value into each UDF closure (executors
    cannot import this package — CLAUDE.md invariant).

    Returns ``parse(data, np) -> (format, width, height, flat_rgb_u8,
    consumed_bytes)`` for binary PPM (P6, comments allowed, maxval <=
    255), 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up or
    top-down, 4-byte row padding, BGR->RGB), and — a REAL compressed
    format, stdlib-only — PNG (8-bit RGB color type 2, non-interlaced:
    zlib-DEFLATE IDAT + full scanline unfiltering, all five filter
    types None/Sub/Up/Average/Paeth per the PNG spec §9);
    ``consumed_bytes`` is the length of this image within the buffer,
    which lets a concatenated stream (image2pipe-style PPM video) be
    walked frame by frame.  Raises ValueError on anything else
    (JPEG/WebP/video genuinely need external codec libraries).
    """

    def parse(data, np):
        if len(data) >= 8 and data[:8] == b"\x89PNG\r\n\x1a\n":
            import zlib

            i, w, h, idat, end = 8, None, None, [], None
            while i + 12 <= len(data):
                ln = int.from_bytes(data[i : i + 4], "big")
                typ = data[i + 4 : i + 8]
                chunk = data[i + 8 : i + 8 + ln]
                i += 12 + ln  # len + type + payload + crc
                if typ == b"IHDR":
                    w = int.from_bytes(chunk[0:4], "big")
                    h = int.from_bytes(chunk[4:8], "big")
                    depth, color, comp, filt, inter = chunk[8:13]
                    if (depth, color, comp, filt, inter) != (8, 2, 0, 0, 0):
                        raise ValueError(
                            "only 8-bit RGB non-interlaced PNG supported "
                            f"(depth={depth}, color={color}, interlace={inter})"
                        )
                elif typ == b"IDAT":
                    idat.append(chunk)
                elif typ == b"IEND":
                    end = i
                    break
            if w is None or end is None:
                raise ValueError("truncated PNG (missing IHDR/IEND)")
            raw = zlib.decompress(b"".join(idat))
            stride = w * 3
            if len(raw) != h * (1 + stride):
                raise ValueError("PNG pixel payload size mismatch")
            raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
            ftypes, lines = raw[:, 0], raw[:, 1:].astype(np.int64)
            out = np.zeros((h, stride), dtype=np.int64)
            for y in range(h):
                f, line = int(ftypes[y]), lines[y]
                up = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
                if f == 0:  # None
                    out[y] = line
                elif f == 1:  # Sub: cumulative per channel
                    px = line.reshape(w, 3)
                    out[y] = np.cumsum(px, axis=0).reshape(-1) % 256
                elif f == 2:  # Up
                    out[y] = (line + up) % 256
                elif f in (3, 4):  # Average / Paeth: sequential left-dep
                    row = out[y]
                    for x in range(stride):
                        a = row[x - 3] if x >= 3 else 0
                        b = up[x]
                        if f == 3:
                            row[x] = (line[x] + (a + b) // 2) % 256
                        else:
                            c = up[x - 3] if x >= 3 else 0
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                            row[x] = (line[x] + pred) % 256
                else:
                    raise ValueError(f"bad PNG filter type {f}")
            return "image/png", w, h, out.astype(np.uint8).reshape(-1), end
        if len(data) >= 2 and data[:2] == b"P6":
            # header: 'P6' <ws> width <ws> height <ws> maxval <single ws>
            # with '#' comments allowed between tokens
            i, vals = 2, []
            while len(vals) < 3:
                while i < len(data) and data[i : i + 1].isspace():
                    i += 1
                if i < len(data) and data[i : i + 1] == b"#":
                    while i < len(data) and data[i] != 0x0A:
                        i += 1
                    continue
                j = i
                while j < len(data) and not data[j : j + 1].isspace():
                    j += 1
                if j == i:
                    raise ValueError("truncated PPM header")
                vals.append(int(data[i:j]))
                i = j
            i += 1  # exactly one whitespace byte after maxval
            w, h, maxval = vals
            if maxval > 255:
                raise ValueError("16-bit PPM not supported")
            n = w * h * 3
            if len(data) < i + n:
                raise ValueError("truncated PPM pixel data")
            px = np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
            return "image/x-portable-pixmap", w, h, px, i + n
        if len(data) >= 54 and data[:2] == b"BM":
            off = int.from_bytes(data[10:14], "little")
            w = int.from_bytes(data[18:22], "little", signed=True)
            h = int.from_bytes(data[22:26], "little", signed=True)
            bpp = int.from_bytes(data[28:30], "little")
            comp = int.from_bytes(data[30:34], "little")
            if bpp != 24 or comp != 0:
                raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
            top_down = h < 0
            h = abs(h)
            stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
            rows = rows[:, : w * 3].reshape(h, w, 3)
            if not top_down:
                rows = rows[::-1]  # BMP stores bottom-up
            # BGR->RGB; consumed = declared file size when sane, else
            # the pixel-array end
            declared = int.from_bytes(data[2:6], "little")
            consumed = declared if off < declared <= len(data) else off + stride * h
            return "image/bmp", w, h, np.ascontiguousarray(rows[..., ::-1]).reshape(-1), consumed
        raise ValueError("unsupported media format (expect PPM P6 or 24-bit BMP)")

    return parse


def ppm_encode(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Emit a REAL binary PPM (P6) image per row with deterministic
    pixels — ``pixel[p] = (doc_id*31 + 7*p) mod 256`` over a
    ``(16 + id%16) × (8 + id%8)`` RGB raster. Any PPM reader decodes
    these; the closed-form pixel rule lets the DuckDB oracle recompute
    the decoded-pixel statistics without a PPM parser, so the
    encode→decode round-trip is verified end-to-end on real bytes."""

    def _enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            blobs, metas = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 16 + i % 16, 8 + i % 8
                n = w * h * 3
                px = ((i * 31 + 7 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
                header = f"P6\n{w} {h}\n255\n".encode("ascii")
                blobs.append(header + px.tobytes())
                metas.append(
                    {
                        "format": "image/x-portable-pixmap",
                        "width": w,
                        "height": h,
                        "n_bytes": len(header) + n,
                    }
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": blobs, "meta": metas})

    spread = _spread(df.select(id_col))
    return spread.mapInPandas(_enc, schema=RESIZED_SCHEMA)


def png_encode(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Emit a REAL PNG (8-bit RGB, zlib-DEFLATE IDAT, CRC'd chunks,
    filter-0 scanlines) per row with the same closed-form pixels as
    :func:`ppm_encode` (``pixel[p] = (doc_id*31 + 7*p) mod 256``) —
    the COMPRESSED-format end of the real-codec path: any PNG reader
    decodes these, and the closed form lets the DuckDB oracle verify
    the decoded-pixel statistics without a PNG parser, so the
    DEFLATE round-trip is checked end-to-end on real bytes."""

    def _enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def chunk(typ: bytes, payload: bytes) -> bytes:
            return (
                struct.pack(">I", len(payload))
                + typ
                + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
            )

        for pdf in batches:
            blobs, metas = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 16 + i % 16, 8 + i % 8
                n = w * h * 3
                px = ((i * 31 + 7 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
                rows = px.reshape(h, w * 3)
                raw = b"".join(b"\x00" + r.tobytes() for r in rows)
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                blob = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw, 6))
                    + chunk(b"IEND", b"")
                )
                blobs.append(blob)
                metas.append(
                    {"format": "image/png", "width": w, "height": h, "n_bytes": len(blob)}
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": blobs, "meta": metas})

    spread = _spread(df.select(id_col))
    return spread.mapInPandas(_enc, schema=RESIZED_SCHEMA)


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

    ``fake=True`` computes deterministic pseudo-features (byte
    statistics + a folded byte histogram over the RAW blob) with the
    same schema, batch shape, and partitioning the real path uses.
    ``fake=False`` REALLY decodes uncompressed images (PPM P6 /
    24-bit BMP — see :func:`_make_image_parser`) and computes the same
    statistics over the DECODED PIXEL array: ``n_bytes`` is then the
    pixel-byte count (w×h×3), ``width``/``height`` the parsed geometry.
    """
    parse = _make_image_parser() if not fake else None

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats, means, sizes, widths, heights = [], [], [], [], []
            for blob in pdf["media"]:
                data = bytes(blob) if blob is not None else b""
                if parse is not None:
                    _fmt, w, h, arr, _used = parse(data, np)
                else:
                    w = h = -1
                    arr = np.frombuffer(data, dtype=np.uint8)
                widths.append(w)
                heights.append(h)
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
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
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
    ``fake=False`` REALLY decodes (PPM P6 / 24-bit BMP), resamples the
    2-D pixel grid nearest-neighbor, and re-encodes as PPM P6.
    """
    target = int(width) * int(height)
    parse = _make_image_parser() if not fake else None

    def _resize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_media, metas = [], []
            for blob in pdf["media"]:
                data = bytes(blob) if blob is not None else b""
                if parse is not None:
                    _fmt, sw, sh, flat, _used = parse(data, np)
                    img = flat.reshape(sh, sw, 3)
                    # nearest-neighbor index grids (floor sampling — the
                    # standard NN convention: src = floor(dst * s/d))
                    yi = np.minimum((np.arange(height) * sh) // height, sh - 1)
                    xi = np.minimum((np.arange(width) * sw) // width, sw - 1)
                    res = img[yi][:, xi].reshape(-1)
                    header = f"P6\n{width} {height}\n255\n".encode("ascii")
                    out_media.append(header + res.tobytes())
                    metas.append(
                        {
                            "format": "image/x-portable-pixmap",
                            "width": width,
                            "height": height,
                            "n_bytes": len(header) + res.size,
                        }
                    )
                    continue
                arr = np.frombuffer(data, dtype=np.uint8)
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
    ``fake=False`` REALLY parses the blob as a concatenated-PPM stream
    (the container ``ffmpeg -f image2pipe -vcodec ppm`` emits): each
    frame is a standalone P6 image, frame boundaries come from the
    parsed headers (``frame_bytes`` is ignored), and every
    ``every_n``-th frame is re-emitted as its own valid PPM blob.

    Scale: expansion is map-side; downstream per-frame work inherits
    the spread partitioning, and frame rows carry (doc_id, frame_idx)
    so a later groupBy(doc_id) re-collects without data loss.
    """
    parse = _make_image_parser() if not fake else None

    def _frames(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                if parse is not None:
                    import numpy as np

                    pos, fi = 0, 0
                    while pos < len(data):
                        _fmt, w, h, px, used = parse(data[pos:], np)
                        header = f"P6\n{w} {h}\n255\n".encode("ascii")
                        end = pos + used
                        if fi % every_n == 0:
                            chunk = header + px.tobytes()
                            ids.append(int(doc_id))
                            idxs.append(fi)
                            frames.append(chunk)
                            sizes.append(len(chunk))
                        pos = end
                        fi += 1
                    continue
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


# ------------------------------------------------------------------ audio

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("amp_mean", T.DoubleType()),
        T.StructField("amp_rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def wav_encode(df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000) -> DataFrame:
    """Emit a REAL RIFF/WAVE file (PCM 16-bit mono) per row with
    closed-form samples ``s[k] = ((doc_id*37 + 11*k) mod 4096) − 2048``
    over ``256 + doc_id%256`` samples — the audio member of the real-
    codec family (PPM/BMP/PNG images, concatenated-PPM video): any WAV
    reader plays these, and the closed form lets the DuckDB oracle
    recompute the decoded-sample statistics without a RIFF parser."""

    def _enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            blobs, metas = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n = 256 + i % 256
                s = (((i * 37 + 11 * np.arange(n, dtype=np.int64)) % 4096) - 2048).astype(
                    "<i2"
                )
                data = s.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt))
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                blobs.append(blob)
                metas.append(
                    {"format": "audio/wav", "width": n, "height": 1, "n_bytes": len(blob)}
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": blobs, "meta": metas})

    spread = _spread(df.select(id_col))
    return spread.mapInPandas(_enc, schema=RESIZED_SCHEMA)


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL RIFF/WAVE decode (PCM 16-bit mono, stdlib-only chunk walk)
    + per-clip features: sample count, rate, mean amplitude, RMS, and
    zero-crossing rate — computed over the DECODED samples with exact
    integer sums so the closed-form oracle hash-matches.

    Scale: Arrow-batched mapInPandas like the image path; features are
    O(samples) numpy; no shuffle."""

    parse_wav = _make_wav_parser()

    def _dec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ns, rates, means, rmss, zcrs = [], [], [], [], []
            for blob in pdf["media"]:
                rate, s = parse_wav(bytes(blob), np)
                v = s.astype(np.int64)
                n = int(v.size)
                ns.append(n)
                rates.append(rate)
                means.append(float(int(v.sum())) / n if n else 0.0)
                rmss.append(math.sqrt(float(int((v * v).sum())) / n) if n else 0.0)
                zc = int(((v[:-1] * v[1:]) < 0).sum()) if n > 1 else 0
                zcrs.append(float(zc) / (n - 1) if n > 1 else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "amp_mean": pd.Series(means, dtype="float64"),
                    "amp_rms": pd.Series(rmss, dtype="float64"),
                    "zero_cross_rate": pd.Series(zcrs, dtype="float64"),
                }
            )

    spread = _spread(df.select(id_col, "media"))
    return spread.mapInPandas(_dec, schema=AUDIO_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _make_ahash():
    """Self-contained aHash factory (the parser-factory shipping
    pattern): ahash(px, w, h, np) -> two's-complement 64-bit int.
    Shared by the image hash and the per-frame video hash — identical
    integer pooling by construction."""

    def ahash(px, w, h, np):
        gray = px.reshape(h, w, 3).astype(np.int64).sum(axis=2) // 3
        yi = (np.arange(h) * 8) // h
        xi = (np.arange(w) * 8) // w
        cell = (yi[:, None] * 8 + xi[None, :]).reshape(-1)
        sums = np.bincount(cell, weights=gray.reshape(-1), minlength=64)
        cnts = np.bincount(cell, minlength=64)
        means = (sums.astype(np.int64)) // np.maximum(cnts, 1)
        m = int(means.sum()) // 64
        bits = (means > m).astype(np.uint64)
        hv = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        return hv - (1 << 64) if hv >= (1 << 63) else hv

    return ahash


def perceptual_hashes(
    media_df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """64-bit average-hash (aHash) per image — the classic perceptual
    fingerprint behind image near-dup detection: decode (the real
    stdlib PNG/PPM/BMP parser), integer grayscale (r+g+b)//3, 8×8
    integer average pooling, threshold each cell at the global cell
    mean, pack the 64 bits. ALL-INTEGER arithmetic (floor divisions,
    exact float64 bincount sums < 2⁵³), so the hash is bit-deterministic
    across partitionings and resolutions of the same content scale.

    Scale: one Arrow-batched mapInPandas over the binary column —
    embarrassingly parallel, O(pixels) per image, 8-byte output per
    image regardless of image size."""
    parse = _make_image_parser()
    ahash = _make_ahash()

    def _ph(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hashes, ws, hs = [], [], [], []
            for doc_id, data in zip(pdf[id_col], pdf[media_col]):
                fmt, w, h, px, _ = parse(bytes(data), np)
                ids.append(int(doc_id))
                # two's-complement view keeps the top bit in a LongType
                hashes.append(ahash(px, w, h, np))
                ws.append(int(w))
                hs.append(int(h))
            yield pd.DataFrame(
                {"doc_id": ids, "phash": hashes, "width": ws, "height": hs}
            )

    return _spread(media_df.select(F.col(id_col).alias("doc_id"), media_col)).mapInPandas(
        _ph, schema=PHASH_SCHEMA
    )


def phash_dup_pairs(
    media_df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_bucket: int = 10000,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming): image near-duplicate pairs whose
    aHashes differ in ≤ ``max_hamming`` bits — the multimodal member of
    the dedup family (MinHash/SimHash/AllPairs see token shingles,
    SemDeDup sees embeddings; this sees PIXELS through the real codecs).

    Banded blocking, never all-pairs (the SimHash pigeonhole): the
    64-bit hash splits into 4 disjoint 16-bit bands, so two hashes
    within Hamming ≤ 3 agree EXACTLY on at least one band; candidates
    come from a self-join per (band index, band value) bucket, then the
    exact popcount of the XOR verifies. ``max_bucket`` guards the
    degenerate flat-image bucket (the minhash guard precedent).

    Scale: 8-byte hashes shuffle (never pixels); bucket join volume is
    Σ bucket² per band, bounded by the guard; popcount is codegen'd.
    Cache lifetime is CALLER-OWNED — wrap the call in
    ``pipeline.cache_scope(spark)`` to release the persisted
    intermediates on exit (the one library-wide convention)."""
    from pyspark.storagelevel import StorageLevel

    ph = perceptual_hashes(media_df, id_col, media_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Materialize the cache BEFORE wiring the dependent plan: AQE
    # launches the bucket-size broadcast build and the two join-leg
    # exchanges as CONCURRENT jobs, and a cold cache is raced — every
    # job re-ran the encode+hash Python chain (3× the mapInPandas work,
    # ~96 concurrent Python workers, measured 3-22 s swings on a ~2 s
    # query). One count() pins the single Python pass.
    ph.count()
    return _banded_hamming_pairs(ph, "phash", max_hamming, max_bucket)


def _banded_hamming_pairs(
    hashes: DataFrame, hash_col: str, max_hamming: int, max_bucket: int
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming ≤ max_hamming) from a (doc_id,
    64-bit hash) table via the 4×16-bit pigeonhole band join shared by
    the image (aHash) and audio (energy-envelope) near-dup paths: two
    hashes within Hamming ≤ 3 agree exactly on ≥1 of 4 disjoint bands,
    so candidates come from per-(band, value) bucket self-joins and the
    codegen'd XOR popcount verifies. ``max_bucket`` drops degenerate
    buckets (flat content) — the minhash guard precedent. Only 8-byte
    hashes shuffle, never media bytes."""
    bands = hashes.select(
        "doc_id",
        hash_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.shiftrightunsigned(F.col(hash_col), 16 * k)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("val"),
                )
                for k in range(4)
            ])
        ).alias("_b"),
    ).select("doc_id", hash_col, F.col("_b.band").alias("band"), F.col("_b.val").alias("val"))
    sizes = bands.groupBy("band", "val").agg(F.count(F.lit(1)).alias("_n"))
    bands = bands.join(
        F.broadcast(sizes.filter(F.col("_n") <= max_bucket).select("band", "val")),
        ["band", "val"],
    )
    left = bands.select("band", "val", F.col("doc_id").alias("doc_id_a"), F.col(hash_col).alias("pa"))
    right = bands.select("band", "val", F.col("doc_id").alias("doc_id_b"), F.col(hash_col).alias("pb"))
    # popcount-verify BEFORE the dedup shuffle: hamming is a pure
    # function of (doc_id_a, doc_id_b), so filtering first is
    # equivalent and the distinct shuffles only verified pairs
    # (≤ output size) instead of every in-bucket candidate row.
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.expr("bit_count(pa ^ pb)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_id_a", "doc_id_b")
    )


def _make_wav_parser():
    """Self-contained RIFF/WAVE (PCM16 mono) parser factory — the audio
    twin of :func:`_make_image_parser`. The returned closure ships to
    executors, so it must not reference this package (CLAUDE.md
    worker-shipped-Python rule); numpy is passed in by the caller."""

    def parse(data, np):
        import struct

        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        i, rate, samples = 12, None, None
        while i + 8 <= len(data):
            typ = data[i : i + 4]
            ln = int.from_bytes(data[i + 4 : i + 8], "little")
            body = data[i + 8 : i + 8 + ln]
            if typ == b"fmt ":
                fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if fmt_code != 1 or channels != 1 or bits != 16:
                    raise ValueError(
                        f"only PCM16 mono supported (fmt={fmt_code}, ch={channels}, bits={bits})"
                    )
            elif typ == b"data":
                samples = np.frombuffer(body, dtype="<i2")
            i += 8 + ln + (ln & 1)  # RIFF chunks pad to even
        if rate is None or samples is None:
            raise ValueError("truncated WAV (missing fmt/data chunk)")
        return rate, samples

    return parse


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


def audio_fingerprints(
    media_df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """64-bit energy-envelope fingerprint per audio clip — the audio
    member of the perceptual-hash family (Haitsma & Kalker 2002's
    robust-hash idea reduced to its time-domain core): decode the real
    RIFF/WAVE bytes, split the clip into 65 equal time segments,
    compute each segment's EXACT integer energy Σs² (|s| ≤ 2¹⁵ over
    ≤ 2²² samples stays < 2⁵³ — the aHash exactness argument), and take
    bit k = (E_k > E_{k+1}) — the sign of the energy derivative, which
    is invariant to any uniform gain change and bit-deterministic
    across partitionings.

    Scale: one Arrow-batched mapInPandas over the binary column,
    O(samples) numpy per clip, 8 bytes out per clip."""
    parse = _make_wav_parser()

    def _fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fps, ns = [], [], []
            for doc_id, data in zip(pdf[id_col], pdf[media_col]):
                _rate, s = parse(bytes(data), np)
                v = s.astype(np.int64)
                n = int(v.size)
                seg = (np.arange(n, dtype=np.int64) * 65) // max(n, 1)
                e = np.bincount(seg, weights=(v * v).astype(np.float64), minlength=65)
                E = e.astype(np.int64)
                bits = (E[:64] > E[1:65]).astype(np.uint64)
                hv = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
                ids.append(int(doc_id))
                fps.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
                ns.append(n)
            yield pd.DataFrame({"doc_id": ids, "afp": fps, "n_samples": ns})

    return _spread(media_df.select(F.col(id_col).alias("doc_id"), media_col)).mapInPandas(
        _fp, schema=AUDIO_FP_SCHEMA
    )


def audio_dup_pairs(
    media_df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_bucket: int = 10000,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming): audio near-duplicate pairs whose
    energy-envelope fingerprints differ in ≤ ``max_hamming`` bits —
    completing the dedup family across modalities (MinHash/SimHash/
    AllPairs: token shingles; SemDeDup: embeddings; aHash: pixels;
    this: DECODED AUDIO SAMPLES). Same 4×16-bit pigeonhole band join
    as the image path (:func:`_banded_hamming_pairs`); audio bytes
    never shuffle.
    Cache lifetime is CALLER-OWNED — wrap the call in
    ``pipeline.cache_scope(spark)`` to release the persisted
    intermediates on exit (the one library-wide convention)."""
    from pyspark.storagelevel import StorageLevel

    fp = audio_fingerprints(media_df, id_col, media_col).select("doc_id", "afp").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Eager materialization — see phash_dup_pairs: AQE's concurrent
    # leaf-exchange jobs race a cold cache and re-run the Python chain.
    fp.count()
    return _banded_hamming_pairs(fp, "afp", max_hamming, max_bucket)


def ppm_video_encode(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Emit a REAL concatenated-PPM video per row (the container
    ``ffmpeg -f image2pipe -vcodec ppm`` emits; sample_frames
    ``fake=False`` walks it frame by frame): ``4 + id%4`` frames on the
    image family's ``(16 + id%16) × (8 + id%8)`` raster with
    closed-form pixels ``(id*31 + 13*frame + 7*p) mod 256`` — the 13·f
    term makes each frame distinct while keeping the whole pipeline
    DuckDB-recomputable. Ids congruent mod 256 encode IDENTICAL videos
    (256 is a multiple of 16, 8, and 4 — same raster, same frame count,
    same pixels): the planted dups the frame-hash join must recover."""

    def _enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            blobs, metas = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 16 + i % 16, 8 + i % 8
                n = w * h * 3
                header = f"P6\n{w} {h}\n255\n".encode("ascii")
                parts = []
                for f in range(4 + i % 4):
                    px = ((i * 31 + 13 * f + 7 * np.arange(n, dtype=np.int64)) % 256).astype(
                        np.uint8
                    )
                    parts.append(header + px.tobytes())
                blob = b"".join(parts)
                blobs.append(blob)
                metas.append(
                    {
                        "format": "video/x-ppm-stream",
                        "width": w,
                        "height": h,
                        "n_bytes": len(blob),
                    }
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": blobs, "meta": metas})

    spread = _spread(df.select(id_col))
    return spread.mapInPandas(_enc, schema=RESIZED_SCHEMA)


VIDEO_FH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fhash", T.LongType()),
    ]
)


def video_frame_hashes(
    media_df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(doc_id, frame_idx, fhash): per-frame aHash over a REAL
    concatenated-PPM video walk — the identical integer pooling as the
    image path (:func:`_make_ahash`), one Arrow batch pass, 8 bytes out
    per frame regardless of frame size."""
    parse = _make_image_parser()
    ahash = _make_ahash()

    def _fh(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                data = bytes(blob) if blob is not None else b""
                pos, fi = 0, 0
                while pos < len(data):
                    _fmt, w, h, px, used = parse(data[pos:], np)
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    hashes.append(ahash(px, w, h, np))
                    pos += used
                    fi += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "fhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return _spread(media_df.select(F.col(id_col).alias("doc_id"), media_col)).mapInPandas(
        _fh, schema=VIDEO_FH_SCHEMA
    )


def video_dup_pairs(
    media_df: DataFrame,
    min_shared: int = 2,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_bucket: int = 10000,
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_shared): video near-duplicate pairs
    sharing ≥ ``min_shared`` DISTINCT frame fingerprints — the standard
    frame-fingerprint-overlap video dedup (near-dup videos share most
    keyframes even when trimmed or re-cut, which a whole-file hash
    misses entirely). Completes the modality set: shingles (text),
    embeddings (semantic), aHash (image), energy envelope (audio),
    frame-hash overlap (VIDEO).

    Exact-hash frame equality IS the blocking (no bands needed: a
    shared frame is an exact 64-bit match), with the ``max_bucket``
    guard dropping degenerate flat-frame buckets. Video bytes never
    shuffle — only (doc_id, 8-byte hash) rows.
    Cache lifetime is CALLER-OWNED — wrap the call in
    ``pipeline.cache_scope(spark)`` to release the persisted
    intermediates on exit (the one library-wide convention)."""
    from pyspark.storagelevel import StorageLevel

    fh = (
        video_frame_hashes(media_df, id_col, media_col)
        .select("doc_id", "fhash")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager materialization — see phash_dup_pairs: AQE's concurrent
    # leaf-exchange jobs race a cold cache and re-run the Python chain.
    fh.count()
    sizes = fh.groupBy("fhash").agg(F.count(F.lit(1)).alias("_n"))
    fh_b = fh.join(
        F.broadcast(sizes.filter(F.col("_n") <= max_bucket).select("fhash")), "fhash"
    )
    return (
        fh_b.select(F.col("doc_id").alias("doc_id_a"), "fhash")
        .join(fh_b.select(F.col("doc_id").alias("doc_id_b"), "fhash"), "fhash")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_id_a", "doc_id_b")
    )
