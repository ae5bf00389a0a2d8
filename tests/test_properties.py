"""Property-based tests (hypothesis) for the normalization kit and text
operators: invariants that hold for ALL inputs, not just fixtures.

Each example builds one small DataFrame (batched rows per example keep
the Spark-job count low; deadline disabled because JVM round-trips
aren't constant-time).
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from datalake_scripts_spark.operators.dedup import word_shingles
from datalake_scripts_spark.operators.nested import flatten
from datalake_scripts_spark.operators.text import tokens

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcxyz", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


@SLOW
@given(st.lists(st.tuples(st.integers(-1000, 1000), words, st.floats(allow_nan=False, allow_infinity=False, width=32)), min_size=1, max_size=20))
def test_flatten_nest_roundtrip(spark, rows):
    """nest -> flatten == identity (modulo path-prefixed names)."""
    df = spark.createDataFrame([Row(a=a, b=b, c=float(c)) for a, b, c in rows])
    nested = df.select(F.struct(F.col("a"), F.struct("b", "c").alias("in")).alias("top"))
    flat = flatten(nested)
    assert flat.columns == ["top_a", "top_in_b", "top_in_c"]
    orig = sorted(map(tuple, df.collect()))
    back = sorted(map(tuple, flat.collect()))
    assert orig == back


@SLOW
@given(st.lists(texts, min_size=1, max_size=10), st.integers(1, 4))
def test_shingle_count_invariant(spark, docs, n):
    """len(shingles) == max(0, len(tokens) - n + 1), every shingle has
    exactly n tokens."""
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(docs)])
    out = df.select(
        "i",
        F.size(tokens("t")).alias("n_tok"),
        word_shingles("t", n).alias("sh"),
    ).collect()
    for r in out:
        assert len(r.sh) == max(0, r.n_tok - n + 1), (r, n)
        for s in r.sh:
            assert len(s.split(" ")) == n


@SLOW
@given(st.lists(texts, min_size=2, max_size=8))
def test_jaccard_bounds_and_symmetry(spark, docs):
    """0 < jaccard <= 1 on emitted pairs; identical docs always hit 1.0."""
    from datalake_scripts_spark.operators.dedup import ngram_jaccard_pairs

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    # plant a guaranteed duplicate of doc 0
    rows.append(Row(doc_id=len(rows), text=docs[0]))
    df = spark.createDataFrame(rows)
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.0).collect()
    for p in pairs:
        assert 0.0 < p.jaccard <= 1.0
        assert p.id_a < p.id_b
    if len(tokens_of(docs[0])) > 0:
        dup = [p for p in pairs if p.id_a == 0 and p.id_b == len(docs)]
        assert dup and dup[0].jaccard == 1.0


def tokens_of(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=15),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000), st.floats(0, 100, allow_nan=False)), min_size=0, max_size=15),
)
def test_asof_join_invariants(spark, left_rows, right_rows):
    """For every matched left row: ts_matched <= ts, and it is the MAX
    right ts at-or-before among the same key; unmatched rows have no
    earlier right row."""
    import datetime as dt

    from datalake_scripts_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(k=k, ts=base + dt.timedelta(seconds=s), lid=i)
         for i, (k, s) in enumerate(left_rows)]
    )
    rrows = [Row(k=k, ts=base + dt.timedelta(seconds=s), value=float(v))
             for k, s, v in right_rows]
    right = (
        spark.createDataFrame(rrows)
        if rrows
        else spark.createDataFrame([], "k int, ts timestamp, value double")
    )
    out = asof_join(left, right, on="k", right_cols=["value"]).collect()
    rights = {}
    for r in rrows:
        rights.setdefault(r.k, []).append((r.ts, r.value))
    for row in out:
        cands = [(ts, v) for ts, v in rights.get(row.k, []) if ts <= row.ts]
        if not cands:
            assert row.ts_matched is None and row.value_matched is None
        else:
            best_ts = max(ts for ts, _ in cands)
            assert row.ts_matched == best_ts


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(texts, min_size=2, max_size=10), st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_positional_filters_lossless(spark, docs, threshold):
    """For ANY corpus and threshold, the prefix+length+positional
    filtered jaccard returns exactly the exhaustive inverted-join
    result (same pairs, same scores) — the PPJoin bounds are necessary
    conditions, never heuristics."""
    from datalake_scripts_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    kw = dict(n=2, threshold=threshold, min_df_keep=3)
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", prefix_filter=True, **kw
        ).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", prefix_filter=False, **kw
        ).collect()
    }
    assert fast == slow


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(texts, min_size=2, max_size=10), st.sampled_from([0.5, 0.8, 1.0]))
def test_containment_prefix_filter_lossless_any_corpus(spark, docs, threshold):
    """For ANY corpus and threshold, the contained-side prefix filter
    returns exactly the exhaustive result (same directional pairs, same
    containment scores) — the asymmetric prefix bound is a necessary
    condition, never a heuristic. Also checks both directions of exact
    duplicates survive."""
    from pyspark.sql import Row

    from datalake_scripts_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    kw = dict(n=2, threshold=threshold, min_df_keep=3)
    fast = {
        (r.id_contained, r.id_container, r.containment)
        for r in containment_pairs(
            df, "doc_id", "text", prefix_filter=True, **kw
        ).collect()
    }
    slow = {
        (r.id_contained, r.id_container, r.containment)
        for r in containment_pairs(
            df, "doc_id", "text", prefix_filter=False, **kw
        ).collect()
    }
    assert fast == slow


@SLOW
@given(
    arrs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),   # h
            st.integers(min_value=1, max_value=9),   # w
            st.sampled_from([1, 3, 4]),              # channels
            st.integers(min_value=0, max_value=2**32 - 1),  # seed
        ),
        min_size=1,
        max_size=4,
    )
)
def test_png_roundtrip_property(arrs):
    """encode_png/decode_png are exact inverses for every 8-bit
    shape/channel combination (no Spark needed — pure codec law)."""
    import numpy as np

    from datalake_scripts_spark.functions.png import decode_png, encode_png

    for h, w, ch, seed in arrs:
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)


@SLOW
@given(
    specs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2000),  # n samples
            st.sampled_from([1, 2]),                   # channels
            st.sampled_from([8000, 16000, 44100]),     # rate
            st.integers(min_value=0, max_value=2**32 - 1),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_wav_roundtrip_property(specs):
    """encode_wav/decode_wav are exact inverses over the FULL int16
    range (including -32768) for mono/stereo at any rate; rms is
    finite and order-of-magnitude sane."""
    import numpy as np

    from datalake_scripts_spark.functions.wav import (
        decode_wav, encode_wav, rms_int16,
    )

    for n, ch, rate, seed in specs:
        rng = np.random.default_rng(seed)
        a = rng.integers(-(2**15), 2**15, size=(n, ch), dtype=np.int16)
        # force the extreme value in: the int16 min is the classic
        # overflow trap for naive abs/square implementations
        a.flat[0] = -(2**15)
        decoded, got_rate = decode_wav(encode_wav(a, rate))
        assert got_rate == rate
        assert np.array_equal(decoded, a)
        r = rms_int16(a)
        assert 0.0 <= r <= 2**15


def _scd2_python_twin(changes):
    """Brute-force SCD2: per key, sort by (ts, seq), last-write-wins per
    ts, collapse no-change runs, close intervals."""
    out = []
    keys = {k for k, _, _, _ in changes}
    for k in sorted(keys):
        rows = sorted(
            [(ts, seq, v) for kk, ts, seq, v in changes if kk == k]
        )
        lww = {}
        for ts, seq, v in rows:  # later (ts, seq) wins within a ts
            lww[ts] = v
        collapsed = []
        for ts in sorted(lww):
            if not collapsed or collapsed[-1][1] != lww[ts]:
                collapsed.append((ts, lww[ts]))
        for i, (ts, v) in enumerate(collapsed):
            nxt = collapsed[i + 1][0] if i + 1 < len(collapsed) else None
            out.append((k, v, ts, nxt, nxt is None))
    return sorted(out)


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),                # key
            st.integers(0, 5),                # day offset (duplicates ok)
            st.sampled_from(["a", "b", "c"]),  # tracked value
        ),
        min_size=1,
        max_size=16,
    )
)
def test_scd2_from_changes_matches_python_twin(spark, rows):
    """SCD2 invariants for ALL change feeds: intervals per key are
    disjoint, contiguous, end open; history equals the brute-force
    last-write-wins + collapse twin."""
    import datetime as dt

    from datalake_scripts_spark.operators.upsert import scd2_from_changes

    feed = [
        (k, dt.datetime(2024, 1, 1 + d), seq, v)
        for seq, (k, d, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(k, ts, seq, v) for k, ts, seq, v in feed],
        "k long, ts timestamp, seq long, city string",
    )
    got = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_from_changes(
            df, ["k"], ["city"], tiebreak=["seq"]
        ).collect()
    )
    want = _scd2_python_twin([(k, ts, seq, v) for k, ts, seq, v in feed])
    assert got == want
    # structural invariants: per key, exactly one open row and
    # contiguous half-open intervals
    per_key = {}
    for k, v, vf, vt, cur in got:
        per_key.setdefault(k, []).append((vf, vt, cur))
    for k, ivs in per_key.items():
        ivs.sort()
        assert sum(1 for _, vt, cur in ivs if cur) == 1
        for (f1, t1, _), (f2, _, _) in zip(ivs, ivs[1:]):
            assert t1 == f2  # contiguous, no gap or overlap
        assert ivs[-1][1] is None
