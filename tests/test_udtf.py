"""Python UDTF surface: chunk_text table function + SQL lateral call."""

from __future__ import annotations

from datalake_scripts_spark.functions.udtfs import register_udtfs


def test_chunk_text_lateral_sql(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz"), (3, ""), (4, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("_udtf_t")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk, c.chunk_len
        FROM _udtf_t d, LATERAL chunk_text(d.text, 4) c
        ORDER BY d.doc_id, c.chunk_id
        """
    ).collect()
    got = [(r.doc_id, r.chunk_id, r.chunk, r.chunk_len) for r in rows]
    assert got == [
        (1, 1, "abcd", 4),
        (1, 2, "efgh", 4),
        (1, 3, "ij", 2),
        (2, 1, "xyz", 3),
        # doc 3 (empty) and doc 4 (NULL) yield no chunks
    ]


def test_chunk_text_direct_invocation(spark):
    from pyspark.sql.functions import lit

    from datalake_scripts_spark.functions.udtfs import ChunkText

    rows = ChunkText(lit("aabb"), lit(2)).collect()
    assert [(r.chunk_id, r.chunk) for r in rows] == [(1, "aa"), (2, "bb")]


def test_register_is_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)
    assert spark.sql("SELECT * FROM chunk_text('abc', 2)").count() == 2
