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
