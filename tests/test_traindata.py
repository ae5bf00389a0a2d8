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
