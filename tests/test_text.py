"""Text analysis: tokenization, quality, language ID, fingerprints."""

from pyspark.sql import Row

from datalake_scripts_spark.operators import text as X


def test_token_count(spark):
    df = spark.createDataFrame([Row(t="Hello  world foo"), Row(t=""), Row(t="   ")])
    out = [r.n for r in df.select(X.token_count("t").alias("n")).collect()]
    assert sorted(out) == [0, 0, 3]


def test_punct_and_stopword_ratio(spark):
    df = spark.createDataFrame([Row(t="the cat, the hat!")])
    r = df.select(
        X.punct_ratio("t").alias("p"), X.stopword_ratio("t").alias("s")
    ).first()
    assert abs(r.p - 2 / 17) < 1e-12
    assert abs(r.s - 2 / 4) < 1e-12


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, t="the cat and the dog of the house is here"),
            Row(doc_id=2, t="der hund und die katze das ist gut"),
            Row(doc_id=3, t="el perro y la casa que es grande"),
            Row(doc_id=4, t="xyz abc qqq"),
        ]
    )
    out = {r.doc_id: r.lang for r in df.select("doc_id", X.lang_id("t").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, t="alpha beta gamma"),
            Row(doc_id=2, t="gamma alpha beta beta"),
            Row(doc_id=3, t="alpha beta delta"),
        ]
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", X.fingerprint("t").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([Row(t="x " * 300), Row(t="a,;:!?.")])
    vals = [r.q for r in df.select(X.quality_score("t").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_winnow_fingerprints_short_text_guard(spark):
    from datalake_scripts_spark.operators.text import with_winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, None), (4, "x" * 40)], "doc_id int, text string"
    )
    out = {r.doc_id: r.fps for r in with_winnow_fingerprints(df).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] is None or out[3] == []  # null text propagates
    # 40 identical chars -> all k-grams identical -> exactly one fingerprint
    assert len(out[4]) == 1


def test_winnow_fingerprints_shift_invariance(spark):
    from datalake_scripts_spark.operators.text import with_winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, "PREFIX PAD >> " + base)], "doc_id int, text string"
    )
    out = {r.doc_id: set(r.fps) for r in with_winnow_fingerprints(df).collect()}
    # winnowing fingerprints of the shared substring survive the shift
    assert len(out[1] & out[2]) >= 3


def test_blocklist_redact_counts_and_text(spark):
    from datalake_scripts_spark.queries.llmops import text_blocklist_redact

    out = {
        r.doc_id: r
        for r in text_blocklist_redact(spark, "/root/testdata/sf0.001")
        .filter("doc_id < 5")
        .collect()
    }
    import duckdb

    src = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id < 5"
    ).fetchall()
    from datalake_scripts_spark.queries.llmops import BLOCKLIST_TERMS

    for doc_id, text in src:
        toks = [w for w in text.lower().split() if w]
        expect_hits = sum(1 for w in toks if w in BLOCKLIST_TERMS)
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_redacted == expect_hits
        assert r.was_redacted == (expect_hits > 0)
        assert "[REDACTED]" in r.text_redacted if expect_hits else True
        # redacted text has the same token count and no blocklist term left
        red = r.text_redacted.split(" ")
        assert len(red) == len(toks)
        assert not any(w in BLOCKLIST_TERMS for w in red)


def test_token_entropy_matches_math(spark):
    import math

    from pyspark.sql import Row

    from datalake_scripts_spark.operators import text as X  # noqa: F401
    from datalake_scripts_spark.queries import llmops  # noqa: F401

    # handcrafted: uniform distribution -> ln(k); single token -> 0
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),       # H = ln 4
            Row(doc_id=2, text="x x x x"),       # H = 0
            Row(doc_id=3, text="a a b"),         # H = ln3 - (2 ln2)/3
        ]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in llmops.text_token_entropy(spark, d).collect()
        }
    assert out[1].n_tokens == 4 and out[1].n_distinct == 4
    assert abs(out[1].entropy_micro / 1e6 - math.log(4)) < 2e-6
    assert out[2].entropy_micro == 0.0  # single repeated token
    h3 = math.log(3) - (2 * math.log(2)) / 3
    assert abs(out[3].entropy_micro / 1e6 - h3) < 2e-6


def test_url_canonicalize_properties(spark):
    """url_canonicalize: case/port/fragment/param-order/tracking-param
    variants of one URL all collapse to a single canonical form, path
    case survives, and the transform is IDEMPOTENT."""
    from datalake_scripts_spark.operators.text import url_canonicalize
    from pyspark.sql import functions as F

    variants = [
        "https://www.site.com/Path/A?b=2&a=1",
        "HTTPS://WWW.SITE.COM/Path/A?b=2&a=1",
        "https://www.site.com:443/Path/A?a=1&b=2",
        "https://www.site.com/Path/A?utm_source=x&b=2&a=1",
        "https://www.site.com/Path/A?b=2&utm_campaign=y&a=1#frag",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], "i int, url string")
    canon = df.select(url_canonicalize("url").alias("c"))
    got = {r.c for r in canon.collect()}
    assert got == {"https://www.site.com/Path/A?a=1&b=2"}
    # idempotence
    twice = df.select(url_canonicalize(url_canonicalize("url")).alias("c2"))
    assert {r.c2 for r in twice.collect()} == got
    # http default port + no-query forms
    more = spark.createDataFrame(
        [(0, "HTTP://Host.ORG:80/x"), (1, "http://host.org/x"),
         (2, "https://h.io/p?utm_a=1")],
        "i int, url string",
    ).select(url_canonicalize("url").alias("c")).collect()
    assert more[0].c == more[1].c == "http://host.org/x"
    assert more[2].c == "https://h.io/p"


def test_url_canonicalize_edge_cases(spark):
    """ADVICE r4 (low): malformed URLs pass through instead of
    collapsing into one false-duplicate group; the query splits at the
    FIRST '?' (embedded '?' stays in the value); only the scheme's own
    default port is stripped (http://h:443 is a real non-default
    endpoint)."""
    from datalake_scripts_spark.operators.text import url_canonicalize

    rows = [
        (0, "not a url at all"),
        (1, "relative/path?b=2&a=1#frag"),
        (2, "also-not-a-url"),
        (3, "https://h.io/p?x=a?b&id=3"),
        (4, "http://h.io:443/p"),
        (5, "https://h.io:80/p"),
        (6, "ftp://h.io:443/p"),
    ]
    df = spark.createDataFrame(rows, "i int, url string")
    got = {r.i: r.c for r in df.select(
        "i", url_canonicalize("url").alias("c")).collect()}
    # malformed: fragment stripped, otherwise untouched — all distinct
    assert got[0] == "not a url at all"
    assert got[1] == "relative/path?b=2&a=1"
    assert got[2] == "also-not-a-url"
    assert len({got[0], got[1], got[2]}) == 3
    # first-'?' split: embedded '?' stays inside the param value
    assert got[3] == "https://h.io/p?id=3&x=a?b"
    # cross-scheme default ports are NOT stripped
    assert got[4] == "http://h.io:443/p"
    assert got[5] == "https://h.io:80/p"
    assert got[6] == "ftp://h.io:443/p"
    # idempotence holds on every edge case
    twice = {r.i: r.c2 for r in df.select(
        "i", url_canonicalize(url_canonicalize("url")).alias("c2")).collect()}
    assert twice == got


def test_bm25_pruned_topk_lossless(spark, sf_dir):
    """The MaxScore-style pruned top-k equals brute force exactly
    (lossless bounds), over a candidate universe genuinely larger than
    k (the selection is real, not a pass-through)."""
    from pyspark.sql import functions as F

    from datalake_scripts_spark.operators import text as X
    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.queries.llmops import BM25_QUERY_TERMS
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.queries.llmops import (
        _BM25_TOPK,
        text_bm25_topk_pruned,
    )

    pruned = [
        (r.doc_id, r.bm25_micro)
        for r in text_bm25_topk_pruned(spark, sf_dir).collect()
    ]
    brute = [
        (r.doc_id, r.bm25_micro)
        for r in REGISTRY["text_bm25_scores"].fn(spark, sf_dir).collect()
    ]
    assert pruned == brute[: len(pruned)]
    assert len(pruned) == _BM25_TOPK
    n_candidates = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(X.tokens("text")).alias("token"))
        .filter(F.col("token").isin(BM25_QUERY_TERMS))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_candidates > _BM25_TOPK
