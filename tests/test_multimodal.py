"""Multimodal plumbing tests: schemas, Arrow batch shapes, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "x")],
        "doc_id long, text string",
    )
    return multimodal.attach_media(docs)


def test_media_schema(media):
    assert media.columns == ["id", "content", "media_type", "meta"]
    assert dict(media.dtypes)["content"] == "binary"
    r = media.filter(F.col("id") == 1).head()
    assert r.meta.n_bytes == len("hello world")
    assert bytes(r.content) == b"hello world"


def test_decode_image_real_path_is_honestly_stubbed(media):
    """fake=False must ALWAYS raise — this build ships no validated
    real decoder, and the old import-probe gate silently ran the FAKE
    decoder whenever PIL happened to be installed (round-4 review)."""
    with pytest.raises(NotImplementedError, match="not implemented"):
        multimodal.decode_image(media, fake=False)
    with pytest.raises(NotImplementedError, match="not implemented"):
        multimodal.resize_image(media, fake=False)


def test_decode_image_fake_deterministic(media):
    a = {r.id: (r.width, r.height, r.channels) for r in multimodal.decode_image(media, fake=True).collect()}
    b = {r.id: (r.width, r.height, r.channels) for r in multimodal.decode_image(media, fake=True).collect()}
    assert a == b
    assert all(32 <= w < 256 and 32 <= h < 256 and 1 <= c <= 3 for w, h, c in a.values())


def test_extract_features_shape(media):
    rows = multimodal.extract_features(media, dim=16).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.dim == 16
        assert len(r.feature) == 16
        assert all(0.0 <= x < 1.0 for x in r.feature)


def test_extract_features_content_addressed(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], "doc_id long, text string"
    )
    rows = multimodal.extract_features(multimodal.attach_media(docs)).collect()
    feats = {r.id: list(r.feature) for r in rows}
    assert feats[1] == feats[2]


def test_sample_frames_partition_of_bytes(media):
    frames = multimodal.sample_frames(media, n_frames=4)
    out = frames.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("frame_n_bytes").alias("tot")
    ).collect()
    assert all(r.n == 4 for r in out)
    # ceil-step coverage: the frames together account for EVERY byte
    # of the blob (the old floor step dropped the tail remainder).
    totals = {r.id: r.tot for r in out}
    blob_sizes = {
        r.id: r.n_bytes
        for r in media.selectExpr("id", "octet_length(content) n_bytes").collect()
    }
    assert totals == blob_sizes


def test_resize_deterministic_and_sized(media):
    out1 = multimodal.resize_image(media, width=8, height=8, fake=True).collect()
    out2 = multimodal.resize_image(media, width=8, height=8, fake=True).collect()
    assert sorted((r.id, r.resized_md5) for r in out1) == sorted(
        (r.id, r.resized_md5) for r in out2
    )
    for r in out1:
        assert (r.width, r.height) == (8, 8)
        assert 0 < r.resized_bytes <= 64


def test_resize_real_path_stubbed(media):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.resize_image(media, fake=False)
