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


def test_resize_stub_contract(spark, sf_dir):
    from datalake_scripts_spark.operators.multimodal import resize_stub

    out = resize_stub(_payloads(spark, sf_dir), target_width=8, target_height=4)
    rows = out.collect()
    assert out.columns == [
        "doc_id", "payload", "width", "height", "orig_width", "orig_height",
    ]
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4 for r in rows)
    assert all(16 <= r.orig_width < 80 for r in rows)


def test_feature_extract_feeds_similarity(spark, sf_dir):
    from datalake_scripts_spark.operators import similarity as S
    from datalake_scripts_spark.operators.multimodal import feature_extract_stub

    emb = feature_extract_stub(_payloads(spark, sf_dir), dim=8)
    rows = emb.collect()
    assert all(len(r.embedding) == 8 for r in rows)
    # unit-norm embeddings
    assert all(abs(sum(x * x for x in r.embedding) - 1.0) < 1e-5 for r in rows)
    # the extracted column plugs straight into the ANN operator
    q = emb.filter("doc_id < 3").withColumnRenamed("doc_id", "vec_id")
    c = emb.withColumnRenamed("doc_id", "vec_id")
    topk = S.brute_force_topk(q, c, k=2)
    assert topk.count() == 3 * 2


def test_frame_feature_pipeline_end_to_end(spark):
    """binary payloads -> decode -> frame sample -> per-frame features:
    row count = sum of sampled frames; embeddings unit-norm and
    deterministic per (payload, frame)."""
    from pyspark.sql import Row

    from datalake_scripts_spark.operators.multimodal import (
        decode_metadata,
        extract_frame_features_stub,
        frame_sample_plan,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(b"VIDEO-A")),
         Row(doc_id=2, payload=bytearray(b"VIDEO-B"))]
    )
    meta = decode_metadata(df, id_col="doc_id").join(df, "doc_id")
    sampled = frame_sample_plan(meta, every_n=2)
    expected_rows = sampled.count()
    feats = extract_frame_features_stub(sampled).collect()
    assert len(feats) == expected_rows > 0
    for r in feats:
        norm = sum(x * x for x in r.frame_embedding) ** 0.5
        assert abs(norm - 1.0) < 1e-5
    # determinism: same (payload, frame) -> same embedding
    again = extract_frame_features_stub(sampled).collect()
    key = lambda r: (r.doc_id, r.frame_idx)
    assert {key(r): tuple(r.frame_embedding) for r in feats} == {
        key(r): tuple(r.frame_embedding) for r in again
    }


def test_audio_chunk_stub_fanout(spark, sf_dir):
    """Audio chunking: fan-out row count = ceil(samples/chunk), chunk
    boundaries tile the duration, features deterministic across runs."""
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.multimodal import audio_chunk_stub
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").limit(50).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    chunks = audio_chunk_stub(docs, sample_rate=100, chunk_ms=1000)
    pdf = chunks.toPandas().sort_values(["doc_id", "chunk_idx"])
    src = {r.doc_id: len(bytearray(r.payload)) for r in docs.collect()}
    for did, n_bytes in src.items():
        n_samples = n_bytes // 2
        expect_chunks = max(1, -(-n_samples // 100))  # 100 samples/chunk
        got = pdf[pdf.doc_id == did]
        assert len(got) == expect_chunks, did
        assert list(got.chunk_idx) == list(range(expect_chunks))
        assert int(got.n_samples.sum()) == n_samples
        assert (got.start_ms == got.chunk_idx * 1000).all()
    assert ((pdf.fake_rms >= 0) & (pdf.fake_rms < 1)).all()
    # deterministic across runs
    pdf2 = audio_chunk_stub(docs, sample_rate=100, chunk_ms=1000).toPandas().sort_values(
        ["doc_id", "chunk_idx"]
    )
    assert (pdf.fake_rms.values == pdf2.fake_rms.values).all()


def test_decode_metadata_arrow_equals_pandas_path(spark, sf_dir):
    """The mapInArrow decode stage is value-identical to the
    mapInPandas one — same stub, different (zero-conversion) batch
    transport."""
    from datalake_scripts_spark.operators.multimodal import (
        decode_metadata_arrow,
    )

    a = sorted(decode_metadata(_payloads(spark, sf_dir)).collect())
    b = sorted(decode_metadata_arrow(_payloads(spark, sf_dir)).collect())
    assert a == b


def test_png_roundtrip_check_real_codec(spark, sf_dir):
    """png_roundtrip_check: every doc's synthesized PNG survives the
    real encode->decode path with exact pixels and md5-derived dims."""
    import hashlib

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.multimodal import png_roundtrip_check
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").limit(50)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rows = png_roundtrip_check(payloads).collect()
    assert len(rows) == 50
    assert all(r.pixels_ok for r in rows)
    assert all(r.channels == 3 for r in rows)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in rows[:10]:
        d = hashlib.md5(texts[r.doc_id].encode()).digest()
        assert (r.width, r.height) == (8 + d[0] % 24, 8 + d[1] % 24)


def test_codec_registry_swap_in(spark):
    """VERDICT r5 ask #7 (the deployment seam): injecting a 'fast
    codec' under an existing name reroutes the Arrow decode stage
    through it — schemas, quarantine lane, and batch shape untouched —
    and restoring the previous entry reverts cleanly."""
    from datalake_scripts_spark.operators.multimodal import (
        Codec,
        decode_metadata,
        register_codec,
    )
    from datalake_scripts_spark.functions.png import encode_png, is_png

    import numpy as np

    png = encode_png(np.zeros((5, 3, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(0, bytearray(png))], "doc_id bigint, payload binary"
    )

    def fake_probe(payload):
        return 777, 888, 9, "png_native"

    prev = register_codec(Codec("png", is_png, fake_probe))
    try:
        row = decode_metadata(df, with_status=True).collect()[0]
        assert (row.fake_width, row.fake_height, row.fake_n_frames) == (
            777, 888, 9,
        )
        assert row.decode_status == "png_native"
    finally:
        register_codec(prev)
    row = decode_metadata(df, with_status=True).collect()[0]
    assert (row.fake_width, row.fake_height, row.decode_status) == (3, 5, "png")
