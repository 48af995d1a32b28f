"""Video frame-fingerprint dedup (pipeline/multimodal.py::
ppm_video_encode / video_frame_hashes / video_dup_pairs): planted
identical videos recovered, trimmed/re-cut videos detected by frame
overlap, per-frame hashes identical to the image path's aHash."""

from __future__ import annotations

from csv_query_engine_spark.pipeline import multimodal as mm


def _ids_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_planted_identical_videos_pair_on_all_frames(spark):
    # 5 and 261 are congruent mod 256: same raster, same frame count,
    # same pixels -> identical videos; 6 differs.
    media = mm.ppm_video_encode(_ids_df(spark, [5, 261, 6]))
    pairs = mm.video_dup_pairs(media).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (5, 261)
    n_frames = 4 + 5 % 4
    n_distinct = (
        mm.video_frame_hashes(media)
        .filter("doc_id = 5")
        .select("fhash")
        .distinct()
        .count()
    )
    assert r["n_shared"] == n_distinct and n_distinct <= n_frames


def test_trimmed_video_detected_by_frame_overlap(spark):
    """A re-cut that keeps some original frames must pair — the case a
    whole-file hash can never catch. Build the trim by slicing the real
    concatenated-PPM stream on parsed frame boundaries."""
    import pandas as pd

    media = mm.ppm_video_encode(_ids_df(spark, [7]))
    blob = bytes(media.collect()[0]["media"])
    # frame boundaries via the real parser
    parse = mm._make_image_parser()
    import numpy as np

    bounds, pos = [], 0
    while pos < len(blob):
        _f, _w, _h, _px, used = parse(blob[pos:], np)
        bounds.append((pos, pos + used))
        pos += used
    assert len(bounds) == 4 + 7 % 4
    trimmed = b"".join(blob[s:e] for s, e in bounds[1:])  # drop frame 0
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7, 99], "media": [blob, trimmed]})
    )
    pairs = mm.video_dup_pairs(df).collect()
    # n_shared counts DISTINCT shared hashes (nearby sawtooth frames can
    # legitimately pool to the same aHash), i.e. every distinct hash of
    # the trimmed cut — all of which the full video contains
    n_trim_distinct = (
        mm.video_frame_hashes(df).filter("doc_id = 99").select("fhash").distinct().count()
    )
    assert [(r["doc_id_a"], r["doc_id_b"], r["n_shared"]) for r in pairs] == [
        (7, 99, n_trim_distinct)
    ]
    assert n_trim_distinct >= 2


def test_frame_hash_equals_image_ahash(spark):
    """Frame 0 of id k's video has pixels (k*31 + 7p) % 256 — exactly
    ppm_encode's image — so its frame hash must equal the image
    perceptual hash bit for bit (shared _make_ahash)."""
    ids = [3, 10, 17]
    img_hashes = {
        r["doc_id"]: r["phash"]
        for r in mm.perceptual_hashes(mm.ppm_encode(_ids_df(spark, ids))).collect()
    }
    frame0 = {
        r["doc_id"]: r["fhash"]
        for r in mm.video_frame_hashes(mm.ppm_video_encode(_ids_df(spark, ids)))
        .filter("frame_idx = 0")
        .collect()
    }
    assert frame0 == img_hashes


def test_sample_frames_walks_the_video(spark):
    media = mm.ppm_video_encode(_ids_df(spark, [9]))
    frames = mm.sample_frames(media, every_n=1, fake=False).collect()
    assert len(frames) == 4 + 9 % 4
    assert [r["frame_idx"] for r in frames] == list(range(4 + 9 % 4))
