"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language ID, fingerprinting.

Not in the reference (its text columns pass through untyped); required
engine surface for 100 TB document processing (SURVEY.md §7 phase 4c).
All pure built-in expressions — JVM-side, codegen'd, no Python in the
hot path. Formulas are written to be exactly replicable in ANSI SQL so
the DuckDB oracle can hash-match them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword language
# heuristic. Deliberately small and inlined: the same constants appear in
# the DuckDB oracle so both engines compute identical scores.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "les", "est"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of lowercased text (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (the cheap len(text.split()) proxy)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punct units via regex
    (one unit per letter-run, digit-run, or punct char)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(F.split(c, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), lambda x: F.trim(x) != "")
    ).cast("bigint")


def char_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("bigint")


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars.

    Plain double division of identical integer operands — bit-identical
    across engines, so NOT rounded (decimal rounding of doubles differs
    at half-way boundaries between engines; raw IEEE ops don't).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def _contains(arr: Column):
    # single-arg lambda factory: F.filter treats a 2-arg lambda as
    # (element, index), so a default-arg closure would misbind.
    return lambda x: F.array_contains(arr, x)


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (unrounded; see punct_ratio)."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    n_sw = F.size(F.filter(toks, _contains(sw)))
    return n_sw.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: str | Column) -> Column:
    """Composite quality heuristic in [0,1]: favors mid-length documents
    with low punctuation density and moderate stopword share. Fixed
    left-to-right evaluation order -> bit-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(400.0), F.lit(1.0))
    return (
        0.5 * len_score + 0.25 * (1.0 - punct_ratio(c)) + 0.25 * (1.0 - stopword_ratio(c))
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the token set."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, _contains(arr))).cast("bigint")
    return out


def lang_id(col: str | Column) -> Column:
    """argmax language by marker count; 'und' when no marker hits.

    Ties break in fixed LANG_MARKERS key order (en > de > es > fr), which
    the oracle replicates with a CASE chain.
    """
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def with_winnow_fingerprints(
    df, text_col: str = "text", k: int = 16, w: int = 8, out_col: str = "fps"
):
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every character ``k``-gram (the rolling-hash pass), then keep the
    minimum hash of each sliding window of ``w`` consecutive k-gram
    hashes. Adds ``out_col`` = sorted distinct minima — a
    position-robust fingerprint set whose overlap localizes shared
    substrings. All native HOFs (transform/slice/array_min), JVM-side;
    md5 is bit-identical in DuckDB so the oracle states the formula.

    DataFrame-level on purpose: the k-gram hash array MUST be
    materialized as its own projection before the window pass. Inlining
    it into the window lambda re-evaluates the whole O(n) md5 transform
    per window — O(n^2) per row, measured 20-50x slower (CollapseProject
    leaves the split alone because the alias is non-cheap and
    multiply-referenced). Rows shorter than k + w - 1 chars get an empty
    fingerprint set (guarded — ``sequence`` would otherwise count DOWN).

    Hashes are the first 8 hex chars of md5 — 32-bit fingerprints, the
    width the original winnowing paper uses. The window-min pass does
    O(n_chars * w) string comparisons, so 8-char operands instead of
    32-char cut the operator's wall time ~40% at equal semantics."""
    # spread to cluster parallelism ONLY when the source is
    # under-parallelized (single-row-group parquet -> unsplittable
    # one-partition scan): the O(n_chars * w) hash + window-min passes
    # run in the scan stage and would serialize on one task. At real
    # scale the scan already has >= parallelism partitions and no
    # shuffle is added.
    par = df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming and df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    text = F.col(text_col)
    hs_col = f"_{out_col}_hs"
    hashes = F.when(
        F.length(text) >= k + w - 1,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - k + 1),
            lambda i: F.substring(F.md5(F.substr(text, i, F.lit(k))), 1, 8),
        ),
    ).otherwise(F.array().cast("array<string>"))
    h = F.col(hs_col)
    wins = F.when(
        F.size(h) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(h) - w + 1),
            lambda j: F.array_min(F.slice(h, j, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.withColumn(hs_col, hashes)
        .withColumn(out_col, F.array_sort(F.array_distinct(wins)))
        .drop(hs_col)
    )


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Identical token multisets (ignoring order/dup) collide —
    the classic shingle-free near-dup prefilter."""
    toks = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.concat_ws(" ", toks))


def url_canonicalize(col: str | Column) -> Column:
    """Canonical URL form for web-corpus dedup (the CCNet first pass):
    lowercase the scheme+host, strip the scheme's OWN default port
    (https:443 / http:80 — never the other's, so http://h:443 stays a
    distinct non-default endpoint) and the #fragment, drop utm_*
    tracking params, and SORT the surviving query params so parameter
    order never splits a duplicate group. The query string starts at
    the FIRST ``?`` (matching where the path stops), so an embedded
    ``?`` in a param value canonicalizes consistently. A relative or
    malformed URL (no ``scheme://host`` prefix) passes through with
    only the fragment stripped — collapsing every unparseable URL into
    one group would manufacture false duplicates. Pure native
    expressions (regex + array HOFs) — map-only at any scale.
    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)
    (property-tested). Regexes avoid lookarounds so the same patterns
    run under Java regex and RE2 (the DuckDB oracle twin)."""
    url = F.col(col) if isinstance(col, str) else col
    nofrag = F.regexp_replace(url, r"#.*$", "")
    sh = F.lower(F.regexp_extract(nofrag, r"^[a-zA-Z]+://[^/?]+", 0))
    pth = F.regexp_extract(nofrag, r"^[a-zA-Z]+://[^/?]+([^?]*)", 1)
    # everything after the FIRST '?' ([^?]* cannot cross one)
    q = F.regexp_extract(nofrag, r"^[^?]*\?(.*)$", 1)
    qq = F.array_join(
        F.array_sort(
            F.filter(F.split(q, "&"), lambda x: ~x.startswith("utm_"))
        ),
        "&",
    )
    sh_noport = (
        F.when(sh.startswith("https://"), F.regexp_replace(sh, r":443$", ""))
        .when(sh.startswith("http://"), F.regexp_replace(sh, r":80$", ""))
        .otherwise(sh)
    )
    canon = F.concat(
        sh_noport,
        pth,
        F.when(qq == "", F.lit("")).otherwise(F.concat(F.lit("?"), qq)),
    )
    return F.when(sh == "", nofrag).otherwise(canon)
