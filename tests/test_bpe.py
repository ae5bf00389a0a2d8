"""Distributed BPE trainer vs a sequential pure-Python reference
(Sennrich et al. 2016 semantics): identical merge tables and identical
final segmentations, plus the batched variant's disjointness contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import bpe as B


# --- sequential reference implementation (the published algorithm) ---


def _ref_pair_counts(vocab: dict[tuple[str, ...], int]):
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            counts[pair] = counts.get(pair, 0) + freq
    return counts


def _ref_apply(syms: tuple[str, ...], left: str, right: str):
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def _ref_learn(vocab: dict[tuple[str, ...], int], n_merges: int, min_freq=2):
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(vocab)
        counts = {p: c for p, c in counts.items() if c >= min_freq}
        if not counts:
            break
        # max count, ties broken lexicographically — matches the
        # orderBy(desc(count), left, right) in the Spark trainer
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        vocab = {_ref_apply(s, *best): f for s, f in vocab.items()}
        merges.append(best)
    return merges, vocab


def _spark_vocab_dict(vocab_df):
    return {
        tuple(r.syms): r.freq for r in vocab_df.select("syms", "freq").collect()
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from datalake_scripts_spark.io import read_table

    return read_table(spark, sf_dir, "documents")


def test_initial_vocab_chars(spark, docs):
    v = B.initial_vocab(docs)
    row = v.first()
    assert list(row.syms) == list(row.word)
    # freq really is the corpus word frequency
    total = v.agg(F.sum("freq")).first()[0]
    n_tokens = docs.select(
        F.sum(F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                              lambda x: x != "")))
    ).first()[0]
    assert total == n_tokens


def test_learn_bpe_matches_sequential_reference(spark, docs):
    vocab_df = B.initial_vocab(docs)
    ref_vocab = _spark_vocab_dict(vocab_df)

    merges, final_df = B.learn_bpe(vocab_df, n_merges=10)
    ref_merges, ref_final = _ref_learn(dict(ref_vocab), 10)

    assert merges == ref_merges
    assert _spark_vocab_dict(final_df) == ref_final


def test_learn_bpe_batched_merges_are_symbol_disjoint(spark, docs):
    vocab_df = B.initial_vocab(docs)
    merges, final_df = B.learn_bpe(vocab_df, n_merges=8, batch=4)
    assert len(merges) == 8
    # within each learned batch, no symbol (input or output) repeats
    # — the condition that makes batched == sequential application
    for i in range(0, len(merges), 4):
        seen: set[str] = set()
        for left, right in merges[i : i + 4]:
            assert not {left, right, left + right} & seen
            seen |= {left, right, left + right}
    # segmentation is a valid partition: concatenating symbols
    # reconstructs every word
    bad = final_df.filter(
        F.concat_ws("", F.col("syms")) != F.col("word")
    ).count()
    assert bad == 0


def test_segment_words_applies_learned_merges(spark, docs):
    vocab_df = B.initial_vocab(docs)
    merges, final_df = B.learn_bpe(vocab_df, n_merges=6)
    # re-segmenting the same words with the merge table reproduces the
    # trainer's final segmentation exactly
    re_seg = B.segment_words(vocab_df.select("word", "freq"), merges)
    assert _spark_vocab_dict(re_seg) == _spark_vocab_dict(final_df)


def test_merge_fold_nonoverlapping_left_to_right(spark):
    # 'aaa' + (a,a) -> ['aa','a'], never ['a','aa'] nor ['aa','aa']
    df = spark.createDataFrame([("aaa",)], "word string")
    out = B.segment_words(df, [("a", "a")]).first()
    assert list(out.syms) == ["aa", "a"]
    out2 = B.segment_words(df, [("a", "a"), ("aa", "a")]).first()
    assert list(out2.syms) == ["aaa"]


def test_second_merge_query_bit_identical_to_fold_trainer(spark, sf_dir):
    """The sentinel-replace round-2 query (queries/traindata.py
    bpe_second_merge) reproduces pair_counts after the F.aggregate
    fold applies the round-1 winner — the string-replace and the
    array-fold are the same greedy-leftmost rule."""
    from datalake_scripts_spark.queries.traindata import (
        _BPE_TOP,
        bpe_second_merge,
    )

    got = bpe_second_merge(spark, sf_dir).collect()
    assert len(got) > 0

    from datalake_scripts_spark.io import read_table

    vocab = B.initial_vocab(read_table(spark, sf_dir, "documents"))
    win = (
        B.pair_counts(vocab)
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .first()
    )
    merged = vocab.withColumn(
        "syms", B._apply_merge(F.col("syms"), win.left_sym, win.right_sym)
    )
    want = (
        B.pair_counts(merged)
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP)
        .collect()
    )
    assert [(r.left_sym, r.right_sym, r.pair_count) for r in got] == [
        (r.left_sym, r.right_sym, r.pair_count) for r in want
    ]
    assert all(r.merged_sym == win.left_sym + win.right_sym for r in got)
