"""PageRank: integer-fixed-point recurrence vs a pure-Python reference,
plus invariants on the derived supplier graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_scripts_spark.operators.graph import (
    BASE,
    RANK_ONE,
    pagerank_fixed,
)
from datalake_scripts_spark.queries.graph import graph_pagerank_suppliers


def _reference_pagerank(edges, iterations):
    """The same nano-unit recurrence, dict-based."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: RANK_ONE for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {n: BASE + (85 * s[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_reference_on_hand_graph(spark):
    # cyclic graph with a dangler (4) and a sink-ish hub (3)
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank_fixed(df, iterations=4).collect()
    }
    assert got == _reference_pagerank(edges, 4)


def test_pagerank_rank_double_is_nano_over_1e9(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    rows = pagerank_fixed(df, iterations=2).collect()
    for r in rows:
        assert r["rank"] == r["rank_nano"] / 1e9
    # symmetric 2-cycle: both nodes identical rank
    assert len({r["rank_nano"] for r in rows}) == 1


def test_supplier_pagerank_matches_reference(spark, sf_dir):
    out = graph_pagerank_suppliers(spark, sf_dir)
    rows = out.collect()
    # every supplier in the co-fulfillment graph gets a rank >= (1-d)
    assert all(r["rank_nano"] >= BASE for r in rows)
    assert len(rows) == out.select("node").distinct().count()
    # recompute the derived edge list and replay the recurrence in
    # pure Python — full-output equality (at sf0.001 the graph is
    # near-complete, so equal ranks are expected and correct)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
    edges = {
        (a, b)
        for sks in by_order.values()
        for a in sks
        for b in sks
        if a != b
    }
    expected = _reference_pagerank(sorted(edges), 3)
    assert {r["node"]: r["rank_nano"] for r in rows} == expected


def test_pagerank_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = pagerank_fixed(df, iterations=2)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_triangle_counts_k4_and_path(spark):
    """K4: every node is in C(3,2)=3 triangles, clustering 1.0; a path
    graph has none."""
    from itertools import combinations

    from pyspark.sql import Row

    from datalake_scripts_spark.operators.graph import triangle_counts

    k4 = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in combinations(range(4), 2)]
    )
    out = {r.node: r for r in triangle_counts(k4).collect()}
    assert all(out[n].n_triangles == 3 for n in range(4))
    assert all(out[n].clustering == 1.0 for n in range(4))
    path = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(5)])
    out = {r.node: r for r in triangle_counts(path).collect()}
    assert all(r.n_triangles == 0 and r.clustering == 0.0 for r in out.values())


def test_triangle_counts_match_bruteforce_random(spark):
    """Random graph vs itertools brute force — also exercises duplicate
    and reversed input edges (operator must canonicalize)."""
    import random
    from itertools import combinations

    from pyspark.sql import Row

    from datalake_scripts_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    nodes = list(range(12))
    und = {tuple(sorted(e)) for e in combinations(nodes, 2) if rng.random() < 0.4}
    rows = []
    for a, b in und:
        rows.append(Row(src=a, dst=b))
        if rng.random() < 0.5:
            rows.append(Row(src=b, dst=a))  # reversed duplicate
    df = spark.createDataFrame(rows)
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    expect = {n: 0 for n in {x for e in und for x in e}}
    for a, b, c in combinations(sorted(expect), 3):
        if ((a, b) in und) and ((b, c) in und) and ((a, c) in und):
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert got == expect


def test_bfs_hops_hand_checked_and_properties(spark):
    """4-node path graph a-b-c-d (+ isolated e): hops from a are
    0,1,2,3 and e is unreachable; max_hops truncates the frontier."""
    from datalake_scripts_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    capped = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}
    # a node on a cycle keeps its MIN hop (revisits are anti-joined out)
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got_cyc = {r.node: r.hop for r in bfs_hops(cyc, seeds, max_hops=9).collect()}
    assert got_cyc == {1: 0, 2: 1, 3: 2}


def _sym(pairs):
    out = []
    for a, b in pairs:
        out += [(a, b), (b, a)]
    return out


def test_kcore_rounds_hand_checked(spark):
    """Triangle {1,2,3} + pendant chain 3-4, 4-5 at k=2: round 1 peels
    the degree-1 node 5, round 2 peels 4 (its degree fell to 1), the
    triangle is the stable 2-core; census rows then repeat via the
    fixpoint early-exit (no further shuffles, identical rows)."""
    from datalake_scripts_spark.operators.graph import kcore_rounds

    e = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]),
        "src long, dst long",
    )
    rows = {r.round: r for r in kcore_rounds(e, k=2, rounds=4).collect()}
    assert rows[1].n_nodes == 4 and rows[1].n_edges == 4  # 5 peeled
    assert rows[2].n_nodes == 3 and rows[2].n_edges == 3  # 4 peeled
    assert rows[3].n_nodes == 3 and rows[3].n_edges == 3  # fixpoint
    assert rows[4].n_nodes == 3 and rows[4].sum_nodes == 6  # 1+2+3


def test_kcore_rounds_empties_and_reports_zero(spark):
    """A path graph has no 2-core: the census must reach (0,0,0) and
    keep reporting it, not error on empty aggregates."""
    from datalake_scripts_spark.operators.graph import kcore_rounds

    e = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4)]), "src long, dst long"
    )
    rows = {r.round: r for r in kcore_rounds(e, k=2, rounds=3).collect()}
    # round 1 peels the endpoints, round 2 peels the rest
    assert rows[1].n_nodes == 2 and rows[1].n_edges == 1
    assert rows[2].n_nodes == 0 and rows[2].n_edges == 0
    assert rows[3].n_nodes == 0 and rows[3].sum_nodes == 0


def test_kcore_rounds_matches_true_core_on_random_graph(spark):
    """Enough synchronous rounds converge to the true k-core (the
    fixpoint of iterative peeling) — checked against a pure-Python
    peel on a deterministic pseudo-random graph."""
    import hashlib

    from datalake_scripts_spark.operators.graph import kcore_rounds

    und = set()
    for i in range(300):
        h = hashlib.md5(f"edge{i}".encode()).hexdigest()
        a, b = int(h[:4], 16) % 40, int(h[4:8], 16) % 40
        if a != b:
            und.add((min(a, b), max(a, b)))
    k = 4
    # python fixpoint peel
    cur = set(und)
    while True:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    true_nodes = {x for e in cur for x in e}
    df = spark.createDataFrame(_sym(sorted(und)), "src long, dst long")
    last = kcore_rounds(df, k=k, rounds=12).orderBy("round").collect()[-1]
    assert last.n_nodes == len(true_nodes)
    assert last.n_edges == len(cur)
    assert last.sum_nodes == sum(true_nodes)


def test_personalized_pagerank_hand_computed(spark):
    """Path graph 1-2-3-4 (both directions), seed {1}: the 3-round
    nano-unit recurrence is pinned by hand (note: NON-normalized PPR on
    a bipartite path oscillates — node 1 donates its whole mass each
    round, so hop-monotone decay is NOT a property of the push form;
    the invariant that matters is exactness + zero on the seedless
    component). Unreachable 9/10 are exactly 0."""
    from datalake_scripts_spark.operators.graph import (
        BASE,
        pagerank_personalized,
    )

    e = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4), (9, 10)]), "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank_nano
        for r in pagerank_personalized(e, seeds, iterations=3).collect()
    }
    # r1 = [150M, 850M, 0, 0]; r2 = [511.25M, 127.5M, 361.25M, 0];
    # r3 below — every step exact integer DIV
    assert got == {
        1: 204187500,
        2: 588093750,
        3: 54187500,
        4: 153531250,
        9: 0,
        10: 0,
    }
    # isolated seed: contributions never arrive, rank settles at base
    lone = spark.createDataFrame([(42,)], "node long")
    got2 = {
        r.node: r.rank_nano
        for r in pagerank_personalized(e, lone, iterations=2).collect()
    }
    assert got2[42] == BASE
