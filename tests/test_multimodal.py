"""Multimodal plumbing: binary payload columns through the stubbed
mapInPandas decode (schema/batch-shape contract is real; the codec is a
deterministic stub — see operators/multimodal.py)."""

from pyspark.sql import functions as F

from datalake_scripts_spark.operators.multimodal import (
    decode_metadata,
    frame_sample_plan,
)


def _payloads(spark, sf_dir):
    from datalake_scripts_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(20)
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def test_decode_metadata_schema_and_determinism(spark, sf_dir):
    out = decode_metadata(_payloads(spark, sf_dir))
    assert out.columns == [
        "doc_id",
        "n_bytes",
        "content_md5",
        "fake_width",
        "fake_height",
        "fake_n_frames",
    ]
    a = sorted(out.collect())
    b = sorted(decode_metadata(_payloads(spark, sf_dir)).collect())
    assert a == b  # deterministic stub
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in a)


def test_decode_md5_matches_native(spark, sf_dir):
    stub = decode_metadata(_payloads(spark, sf_dir)).select("doc_id", "content_md5")
    native = _payloads(spark, sf_dir).select(
        "doc_id", F.md5("payload").alias("content_md5")
    )
    assert stub.exceptAll(native).count() == 0


def test_frame_sampling(spark, sf_dir):
    meta = decode_metadata(_payloads(spark, sf_dir))
    frames = frame_sample_plan(meta, every_n=2)
    r = frames.groupBy("doc_id").count().first()
    assert r["count"] >= 1
