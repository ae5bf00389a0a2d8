"""Product quantization (operators/similarity.py PQ section): encode
determinism, ADC-vs-exact consistency when the shortlist covers the
corpus, and the two-tier recall ordering."""

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings")


def test_pq_encode_shape_and_range(spark, emb):
    cbs = S.pq_codebooks(emb, m=8, stride=10)
    assert len(cbs) == 8 and len(cbs[0][0][1]) == 8
    k = len(cbs[0])
    codes = S.pq_encode(emb, cbs)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        for j in range(8):
            assert 0 <= r[f"code_{j}"] < k


def test_full_shortlist_rerank_equals_exact(spark, emb):
    """With the shortlist covering the whole corpus, PQ+rerank IS the
    exact-L2 top-k — the approximation lives only in the shortlist."""
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    exact = S.l2_brute_topk(q, emb, k=5)
    rer = S.pq_rerank_topk(q, emb, k=5, shortlist=n, m=8, stride=10)
    key = lambda r: (r["query_id"], r["rnk"], r["neighbor_id"])  # noqa: E731
    assert sorted(map(key, rer.collect())) == sorted(
        map(key, exact.collect())
    )


def test_rerank_recall_not_below_adc(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"])
          for r in S.l2_brute_topk(q, emb, k=5).collect()}
    adc = {(r["query_id"], r["neighbor_id"])
           for r in S.pq_topk(q, emb, k=5, m=8, stride=10).collect()}
    rer = {(r["query_id"], r["neighbor_id"])
           for r in S.pq_rerank_topk(q, emb, k=5, shortlist=50, m=8,
                                     stride=10).collect()}
    assert len(rer & ex) >= len(adc & ex)
