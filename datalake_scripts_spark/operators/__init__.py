"""Operator library — the engine's public API surface.

- nested: flatten / explode_into / normalize (the reference's core kit)
- dedup: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  near-dup, duplicate clustering
- similarity: brute-force + SRP-LSH cosine top-k
- text: tokens, quality, language ID, fingerprints
- asof: as-of join, broadcast range join
- scale: skew salting, bucketed joins, history snapshots, sessionize
- upsert: MERGE emulation, SCD2
- versioned: snapshot tables (atomic commits, time travel, vacuum)
- profile: single-pass column profiling
- plan_lint: physical-plan anti-pattern detection
- multimodal: binary payload columns + stubbed decode
"""

from .nested import flatten, explode_into, normalize, ChildSpec, NormalizeSpec  # noqa: F401
from .asof import asof_join, range_join_broadcast  # noqa: F401
from .dedup import (  # noqa: F401
    duplicate_clusters,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from .similarity import brute_force_topk, cosine, dot, lsh_bucket_topk  # noqa: F401
from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from .scale import (  # noqa: F401
    latest_snapshot,
    salted_group_sum,
    salted_join,
    sessionize,
    write_bucketed,
)
from .upsert import merge_upsert, scd2_apply  # noqa: F401
from .versioned import (  # noqa: F401
    current_version,
    read_versioned,
    vacuum,
    write_versioned,
)
from .profile import profile  # noqa: F401
from .plan_lint import lint_plan  # noqa: F401
from .multimodal import decode_metadata, frame_sample_plan  # noqa: F401
