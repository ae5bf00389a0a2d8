"""Persisted inverted text index over the versioned layer — the BM25
analog of :mod:`operators.ann_index`: build the expensive parts of
lexical retrieval — the (token, doc, tf) postings and per-doc lengths —
ONCE per corpus change and serve many queries from the stored index,
instead of re-tokenizing the corpus per query (the
``text_bm25_scores`` shape, whose cost lands per *query* instead of per
*corpus change* at 100 TB).

Index layout (two versioned tables under ``index_dir``):

    index_dir/postings   (token string, doc_id bigint, tf bigint,
                          positions array<int>, bucket bigint)
                         — hive-partitioned BY BUCKET, positions make
                           it a POSITIONAL index (phrase queries)
    index_dir/docstats   (doc_id bigint, dl bigint)

- postings are partitioned by ``bucket = pmod(xxhash64(token), B)``:
  a query with Q terms probes at most Q buckets, computed driver-side
  via the pure-Python xxhash64 twin (functions/xxh.py), so the scan
  statically prunes to the probed buckets' files — serving cost tracks
  the probed fraction of the vocabulary, never the corpus;
- ALL postings for a token live in its one bucket, so document
  frequencies computed inside the pruned scan are exact corpus-wide;
- the docstats commit meta carries the exact corpus scalars
  (``n_docs``, ``total_len``) so BM25's idf/avgdl need no corpus scan
  at query time.

Unlike the ANN index there is NO drift trigger: BM25's statistics
(df, dl, n_docs, total_len) are derived at query time from the stored
postings + meta, so incremental appends keep scoring exact — there is
no stale-model analog of shifted centroids. Non-append changes
(delete/update/overwrite) still force the honest full rebuild: postings
of removed rows cannot be carved out of an append-only index.

Concurrency mirrors ann_index: the POSTINGS commit is the single
linearization point — it CASes on the postings version the maintainer
read and records both the source watermark and the ``docstats_version``
it belongs with; serving resolves docstats PINNED through that record,
so a torn postings/docstats pair is never observable, and a lost race
retries to (typically) a no-op at the winner's watermark.

Reference parity: the reference has no text retrieval at all
(SURVEY.md §2); this is the index half of the BM25 family
(queries/llmops.py text_bm25_scores / text_bm25_topk_pruned).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.xxh import xxhash64_str
from .text import tokens
from .versioned import (
    CommitConflict,
    _load_manifest,
    current_version,
    read_changes,
    read_versioned,
    version_with_meta,
    write_versioned,
)

_POSTINGS = "postings"
_DOCSTATS = "docstats"
DEFAULT_BUCKETS = 64


def _subdir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _bucket_col(token_col: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(token_col), F.lit(n_buckets))


def bucket_of(token: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`_bucket_col` (same xxhash64 seed=42
    semantics via the pure-Python implementation)."""
    return xxhash64_str(token) % n_buckets


def _resolve_docstats_version(pdir: str, ddir: str, p_v: int) -> int | None:
    """Docstats version materialized FOR postings version ``p_v``
    (marker ``for_postings_version`` in the docstats commit meta).
    Walks back through postings commits explicitly stamped
    ``no_docstats_change`` (empty watermark appends); returns None —
    repair needed — if a content-bearing postings commit has no
    materialized docstats."""
    v = p_v
    while v >= 1:
        d = version_with_meta(ddir, "for_postings_version", v)
        if d is not None:
            return d
        if not _load_manifest(pdir, v).get("meta", {}).get(
            "no_docstats_change"
        ):
            return None
        v -= 1
    return None


def _index_meta(index_dir: str) -> dict:
    """Build params + watermarks + corpus scalars, ALL resolved through
    the latest postings commit — the index's single CAS linearization
    point. Docstats is a derived materialization keyed by a
    ``for_postings_version`` marker; ``docstats_version`` is None when
    the materialization is missing (crash between the postings commit
    and the docstats commit) and :func:`repair_docstats` re-derives it
    from the postings snapshot itself."""
    pdir = _subdir(index_dir, _POSTINGS)
    ddir = _subdir(index_dir, _DOCSTATS)
    p_v = current_version(pdir)
    pm = _load_manifest(pdir, p_v).get("meta", {})
    return {
        "source_version": pm["source_version"],
        "postings_version": p_v,
        "docstats_version": _resolve_docstats_version(pdir, ddir, p_v),
        "n_buckets": pm["n_buckets"],
        "id_col": pm.get("id_col", "doc_id"),
        "text_col": pm.get("text_col", "text"),
        "n_docs": pm["n_docs"],
        "total_len": pm["total_len"],
        # pre-r11 indexes predate the flag and always stored positions
        "positions": pm.get("positions", True),
    }


def repair_docstats(spark: SparkSession, index_dir: str) -> int:
    """Materialize docstats for the CURRENT postings version by
    deriving it from the postings snapshot itself (dl = SUM(tf) per
    doc — docstats is always derivable, which is exactly why the
    postings commit can be the only linearization point). Idempotent
    and race-safe: the overwrite CASes on the docstats head; a loser
    re-resolves and accepts the winner's materialization."""
    pdir = _subdir(index_dir, _POSTINGS)
    ddir = _subdir(index_dir, _DOCSTATS)
    p_v = current_version(pdir)
    existing = _resolve_docstats_version(pdir, ddir, p_v)
    if existing is not None:
        return existing
    postings = read_versioned(spark, pdir, version=p_v)
    docstats = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    try:
        d_head = current_version(ddir)
    except Exception:
        d_head = 0
    try:
        return write_versioned(
            spark, docstats, ddir, mode="overwrite",
            expected_version=d_head,
            meta={"for_postings_version": p_v},
        )
    except CommitConflict:
        resolved = _resolve_docstats_version(pdir, ddir, p_v)
        if resolved is not None:
            return resolved
        raise


def _postings_agg(tok: DataFrame, positions: bool = True) -> DataFrame:
    """(token, doc_id, tf[, positions]) — positions sorted so the
    stored array is deterministic (collect_list order is not).
    ``positions=False`` drops the array: a BM25-only index needs just
    tf, and the positional payload grew the build shuffle ~1.8x
    (r10 budget re-freeze) — the phrase tax is opt-in (VERDICT r10
    ask #7)."""
    aggs = [F.count(F.lit(1)).alias("tf")]
    if positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return tok.groupBy("token", "doc_id").agg(*aggs)


def _tokenize(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, token) postings stream — positions ride along so
    the stored index can answer PHRASE queries, not just bags."""
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    )


def build_text_index(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    positions: bool = True,
) -> dict:
    """Build (or fully rebuild) the inverted index from the corpus
    table's CURRENT snapshot. One tokenize pass, two aggregations, one
    bucket-partitioned write — O(corpus), paid once per build.

    Commit order (race-hardened — the original docstats-first design
    let a loser's docstats land while its postings CAS failed, and
    append-carried files would poison every later pinned read; caught
    by tests/test_maintenance_races.py): POSTINGS commits FIRST and is
    the ONLY CAS point, carrying the exact corpus scalars in its meta;
    docstats materializes AFTER, keyed to that postings version by the
    ``for_postings_version`` marker. A crash or lost race between the
    two commits leaves a gap that any later maintainer/server repairs
    by re-deriving docstats from the postings snapshot itself
    (:func:`repair_docstats`). Retry-until-landed callers go through
    :func:`refresh_text_index`."""
    pdir = _subdir(index_dir, _POSTINGS)
    ddir = _subdir(index_dir, _DOCSTATS)
    p_v = current_version(pdir)
    v = current_version(corpus_dir)
    # pinned read: an append landing between current_version and the
    # scan must not be indexed-yet-above-watermark (ADVICE r9 on the
    # ANN build applies identically here)
    corpus = read_versioned(spark, corpus_dir, version=v)
    tok = _tokenize(corpus, id_col, text_col)
    # corpus scalars straight off the token stream — no per-doc groupBy
    # and no positions collect_list, just one partial-agg pass
    stats = tok.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_len"),
    ).collect()[0]
    postings = (
        _postings_agg(tok, positions=positions)
        .withColumn("bucket", _bucket_col(F.col("token"), n_buckets))
        # co-locate each bucket before the partitioned write (see
        # ann_index build: one shuffle -> ~one file per bucket, not
        # O(tasks x buckets) slivers the pruned serve pays to plan)
        .repartition(F.col("bucket"))
    )
    p_new = write_versioned(
        spark, postings, pdir, mode="overwrite", partition_by=["bucket"],
        expected_version=p_v,
        meta={
            "source_version": v,
            "n_buckets": n_buckets,
            "id_col": id_col,
            "text_col": text_col,
            "n_docs": int(stats["n_docs"] or 0),
            "total_len": int(stats["total_len"] or 0),
            "positions": positions,
        },
    )
    # docstats from the COMMITTED postings (dl = SUM(tf), the
    # repair_docstats identity): a column-pruned (doc_id, tf) parquet
    # read instead of a third tokenize pass over the whole corpus
    docstats = (
        read_versioned(spark, pdir, version=p_new)
        .groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    )
    d_new = write_versioned(
        spark, docstats, ddir, mode="overwrite",
        meta={"for_postings_version": p_new},
    )
    return {
        "action": "built",
        "source_version": v,
        "postings_version": p_new,
        "docstats_version": d_new,
        "n_docs": int(stats["n_docs"] or 0),
    }


def refresh_text_index(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    max_attempts: int = 5,
) -> dict:
    """Bring the index up to the corpus's current snapshot.

    - no corpus change since the watermark: no-op, zero jobs;
    - append-only changes: tokenize ONLY the new docs (the change
      feed's append fast path reads just the added files — O(batch))
      and append their postings/docstats; corpus scalars update by
      exact-integer addition in the commit meta;
    - non-append changes: full rebuild (append-only postings cannot
      un-index removed rows).

    Lost CAS races retry from fresh state (typically to a no-op at the
    winner's watermark); after ``max_attempts`` the conflict
    propagates named."""
    last: CommitConflict | None = None
    for _ in range(max_attempts):
        try:
            return _refresh_once(spark, corpus_dir, index_dir)
        except CommitConflict as exc:
            last = exc
    raise last


def _refresh_once(spark: SparkSession, corpus_dir: str, index_dir: str) -> dict:
    meta = _index_meta(index_dir)
    v0 = meta["source_version"]
    p_v = meta["postings_version"]
    cur = current_version(corpus_dir)
    if cur == v0:
        return {"action": "noop", "source_version": v0}
    try:
        non_append = [
            v
            for v in range(v0 + 1, cur + 1)
            if _load_manifest(corpus_dir, v)["mode"] != "append"
        ]
    except FileNotFoundError:
        # A manifest in (v0, cur] was vacuumed. The append fast path is
        # unusable in exactly this state (read_changes over the same
        # range would fail too), so treat the unreadable range as
        # non-append and take the honest full rebuild (ADVICE r10).
        non_append = [cur]
    if non_append:
        return build_text_index(
            spark, corpus_dir, index_dir,
            id_col=meta["id_col"], text_col=meta["text_col"],
            n_buckets=meta["n_buckets"], positions=meta["positions"],
        ) | {"action": "rebuilt"}

    pdir = _subdir(index_dir, _POSTINGS)
    ddir = _subdir(index_dir, _DOCSTATS)
    # heal any gap FIRST so this refresh's docstats delta appends onto
    # a materialization that covers every prior postings commit
    if meta["docstats_version"] is None:
        repair_docstats(spark, index_dir)
        meta = _index_meta(index_dir)
    new_docs = read_changes(spark, corpus_dir, v0, cur).drop("_change_type")
    tok = _tokenize(new_docs, meta["id_col"], meta["text_col"])
    # batch scalars straight off the token stream (same shape as the
    # build: no per-doc groupBy, no positions payload)
    stats = tok.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_len"),
    ).collect()[0]
    n_new = int(stats["n_docs"] or 0)
    base_meta = {
        "source_version": cur,
        "n_buckets": meta["n_buckets"],
        "id_col": meta["id_col"],
        "text_col": meta["text_col"],
        # exact-integer scalar roll-forward — never a re-scan
        "n_docs": meta["n_docs"] + n_new,
        "total_len": meta["total_len"] + int(stats["total_len"] or 0),
        "positions": meta["positions"],
    }
    if n_new == 0:
        # empty appends still move the watermark: metadata-only stamp,
        # explicitly marked so docstats resolution walks past it
        write_versioned(
            spark,
            read_versioned(spark, pdir).limit(0),
            pdir, mode="append", partition_by=["bucket"],
            expected_version=p_v,
            meta=base_meta | {"no_docstats_change": True},
        )
        return {"action": "appended", "n_new_docs": 0, "source_version": cur}
    postings = (
        _postings_agg(tok, positions=meta["positions"])
        .withColumn("bucket", _bucket_col(F.col("token"), meta["n_buckets"]))
        .repartition(F.col("bucket"))
    )
    # the ONLY CAS commit — a loser raises here having written nothing
    p_new = write_versioned(
        spark, postings, pdir, mode="append", partition_by=["bucket"],
        expected_version=p_v, meta=base_meta,
    )
    # docstats delta from the COMMITTED batch (change feed reads just
    # the files this append added, column-pruned to doc_id/tf) — not a
    # third tokenize pass over the batch
    docstats = (
        read_changes(spark, pdir, p_v, p_new).drop("_change_type")
        .groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    )
    # delta materialization, keyed to the postings commit it covers; a
    # crash before this line is healed by repair_docstats on next touch
    _materialize_docstats(spark, pdir, ddir, p_new, delta=docstats,
                          expected_d=meta["docstats_version"])
    return {"action": "appended", "n_new_docs": n_new, "source_version": cur}


def _materialize_docstats(
    spark: SparkSession,
    pdir: str,
    ddir: str,
    p_new: int,
    delta: DataFrame,
    expected_d: int,
) -> None:
    """Land the docstats materialization for postings commit ``p_new``.

    Fast path: the docstats head is still the version this refresh
    resolved — append the O(batch) delta, CASed on that version so a
    stray late writer (a stalled prior winner waking after a repair)
    can never be silently carried forward by this append. Any
    interference falls back to a FULL re-derive overwrite (overwrites
    don't carry files, so they wash strays out of the lineage)."""
    try:
        if current_version(ddir) == expected_d:
            write_versioned(
                spark, delta, ddir, mode="append",
                expected_version=expected_d,
                meta={"for_postings_version": p_new},
            )
            return
    except CommitConflict:
        pass  # lost the CAS to an interloper: full derive below
    postings = read_versioned(spark, pdir, version=p_new)
    full = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    try:
        write_versioned(
            spark, full, ddir, mode="overwrite",
            expected_version=current_version(ddir),
            meta={"for_postings_version": p_new},
        )
    except CommitConflict:
        # tolerable only if someone else materialized exactly p_new
        if version_with_meta(ddir, "for_postings_version", p_new) is None:
            raise


def bm25_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    prune: bool = True,
) -> dict | DataFrame:
    """Serve BM25 top-k FROM the stored index: no tokenize pass, no
    corpus scan — the postings scan statically prunes to the <= Q
    buckets of the query terms (driver-side xxhash64 twin), df comes
    from the pruned postings (exact: a token's postings all live in
    its bucket), dl joins from docstats, and idf/avgdl use the exact
    corpus scalars recorded in the commit meta. Output contract and
    float discipline are IDENTICAL to ``text_bm25_scores``
    (doc_id, bm25_micro, n_matched_terms) — same fold order, FLOOR
    fixed-pointing — so the same oracle verifies both."""
    meta = _index_meta(index_dir)
    if meta["docstats_version"] is None:
        # crash gap between a postings commit and its docstats
        # materialization: heal it (derivable from postings), re-read
        repair_docstats(spark, index_dir)
        meta = _index_meta(index_dir)
    pdir = _subdir(index_dir, _POSTINGS)
    ddir = _subdir(index_dir, _DOCSTATS)
    p = read_versioned(spark, pdir, version=meta["postings_version"])
    if prune:
        probed = sorted({bucket_of(t, meta["n_buckets"]) for t in terms})
        p = p.filter(F.col("bucket").isin(probed))
    tf = p.filter(F.col("token").isin(list(terms))).select(
        "token", "doc_id", "tf"
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    dl = read_versioned(spark, ddir, version=meta["docstats_version"]).select(
        "doc_id", "dl"
    )
    n_docs = float(meta["n_docs"])
    avgdl = float(meta["total_len"]) / n_docs
    idf = F.log(
        (F.lit(n_docs) - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    term_score = (
        idf
        * (F.col("tf").cast("double") * (k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl))
        )
    )
    scored = (
        # bcast: O(query terms) — df rows, bounded by the term list
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.floor(term_score * 1e6).cast("bigint").alias("term_score_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_score_micro").cast("bigint").alias("bm25_micro"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
    )


def phrase_search_indexed(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    prune: bool = True,
) -> DataFrame:
    """Exact phrase search FROM the stored positional index: probe only
    the phrase words' buckets (static partition pruning, like BM25
    serving), join the words' posting rows per doc, explode the first
    word's positions and check each successor with array_contains —
    no corpus scan, no tokenize, and the join count is bounded by the
    phrase length. Returns (phrase, doc_id, n_occurrences) — the same
    contract as the on-the-fly positional-intersection query
    (queries.llmops.text_phrase_search), so the same oracle verifies
    both."""
    words = phrase.split()
    if not words:
        raise ValueError("empty phrase")
    meta = _index_meta(index_dir)
    if not meta["positions"]:
        raise ValueError(
            "index was built with positions=False (BM25-only); phrase "
            "search needs a positional index — rebuild with "
            "build_text_index(..., positions=True)"
        )
    if meta["docstats_version"] is None:
        repair_docstats(spark, index_dir)
        meta = _index_meta(index_dir)
    pdir = _subdir(index_dir, _POSTINGS)
    p = read_versioned(spark, pdir, version=meta["postings_version"])
    if prune:
        probed = sorted({bucket_of(w, meta["n_buckets"]) for w in words})
        p = p.filter(F.col("bucket").isin(probed))
    m = (
        p.filter(F.col("token") == words[0])
        .select(
            F.col("doc_id").alias("d0"),
            F.explode("positions").alias("p0"),
        )
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = p.filter(F.col("token") == w).select(
            F.col("doc_id").alias(f"d{i}"),
            F.col("positions").alias(f"ps{i}"),
        )
        m = (
            m.join(nxt, on=[F.col("d0") == F.col(f"d{i}")])
            .filter(F.array_contains(F.col(f"ps{i}"), F.col("p0") + i))
            .drop(f"d{i}", f"ps{i}")
        )
    return (
        m.groupBy("d0")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select(
            F.lit(phrase).alias("phrase"),
            F.col("d0").alias("doc_id"),
            "n_occurrences",
        )
    )
