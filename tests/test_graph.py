"""Link-graph PageRank: exact fixed-point replay, partition invariance,
host-graph construction, and the priority-scorer adapter (W3 seam)."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.graph import (
    host_link_graph,
    host_pagerank,
    pagerank,
    pagerank_priority_scorer,
)

Q = 10**12


def replay(edges, iters, q=Q, num=85, den=100):
    """Pure-Python fixed-point replay of the exact integer arithmetic."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = Counter(s for s, _ in edges)
    base = q * (den - num) // den
    r = {n: q for n in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {n: base + num * inc.get(n, 0) // den for n in nodes}
    return r


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4),
    (6, 1), (6, 2), (6, 3),  # 6 is dangling-in only via others; 7 below
    (2, 7),                  # 7 is a dangling node (no out-edges)
]


def test_pagerank_matches_pure_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank_q"] for r in pagerank(df, iterations=5).collect()}
    assert got == replay(EDGES, 5)


def test_pagerank_rejects_bad_checkpoint_interval_before_any_job(spark):
    # validation must run before the edge cache is built/materialized —
    # an invalid argument must not cost a Spark job or leak a persisted
    # frame (ADVICE round 4)
    df = spark.createDataFrame(EDGES, "src long, dst long")
    cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with pytest.raises(ValueError, match="checkpoint_interval"):
        pagerank(df, iterations=2, checkpoint_interval=0)
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        == cached_before
    )


def test_pagerank_duplicate_edges_counted_once(spark):
    df = spark.createDataFrame(EDGES + EDGES[:4], "src long, dst long")
    got = {r["id"]: r["rank_q"] for r in pagerank(df, iterations=3).collect()}
    assert got == replay(EDGES, 3)


def test_pagerank_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r["id"]: r["rank_q"]
         for r in pagerank(df.repartition(1), iterations=4,
                           num_partitions=3).collect()}
    b = {r["id"]: r["rank_q"]
         for r in pagerank(df.repartition(13), iterations=4,
                           num_partitions=7).collect()}
    assert a == b == replay(EDGES, 4)


def test_pagerank_dangling_node_keeps_base_plus_inflow(spark):
    # node 7 has no out-edges: its mass leaks (documented variant), but it
    # still accumulates base + damped inflow from 2 every round
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank_q"] for r in pagerank(df, iterations=2).collect()}
    exp = replay(EDGES, 2)
    assert got[7] == exp[7] and got[7] > 0


def test_host_link_graph_counts_and_drops_self_loops(spark):
    rows = [
        ("a.test", ["b.test", "b.test", "a.test"]),
        ("a.test", ["c.test"]),
        ("b.test", ["a.test"]),
    ]
    df = spark.createDataFrame(rows, "host string, link_hosts array<string>")
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(df).collect()
    }
    assert got == {
        ("a.test", "b.test"): 2,
        ("a.test", "c.test"): 1,
        ("b.test", "a.test"): 1,
    }


def test_host_pagerank_end_to_end(spark):
    rows = [
        ("hub.test", ["a.test", "b.test"]),
        ("a.test", ["hub.test"]),
        ("b.test", ["hub.test"]),
        ("c.test", ["hub.test"]),
    ]
    df = spark.createDataFrame(rows, "host string, link_hosts array<string>")
    ranks = {r["host"]: r["rank_q"] for r in host_pagerank(df, 4).collect()}
    # everyone links to the hub: it must outrank every other host
    assert ranks["hub.test"] == max(ranks.values())
    assert ranks["hub.test"] > ranks["c.test"]


def test_priority_scorer_broadcasts_and_defaults(spark):
    rows = [
        ("hub.test", ["a.test"]),
        ("a.test", ["hub.test"]),
    ]
    hr = host_pagerank(
        spark.createDataFrame(rows, "host string, link_hosts array<string>"), 3
    )
    scorer = pagerank_priority_scorer(hr)
    cand = spark.createDataFrame(
        [
            ("u1", "hub.test", 1, 0, 0, 0.5),
            ("u2", "unknown.test", 1, 0, 1, 0.5),
        ],
        "url string, host string, depth int, parent_seq long, "
        "link_pos int, priority double",
    )
    out = scorer(cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["url"]: r["priority"] for r in out.collect()}
    assert got["u1"] == pytest.approx(1.0)  # max-rank host normalizes to 1
    assert got["u2"] == 0.5                 # unknown host keeps the default
    assert set(out.columns) == set(cand.columns)


def test_pagerank_scorer_drives_crawl_end_to_end(
    spark, corpus_parquet, corpus_spec, tmp_path
):
    """Two-phase crawl: a discovery pass builds the host link graph, its
    PageRank feeds the W3 priority seam, and the ranked re-crawl visits
    high-authority hosts first within each wave while reaching the exact
    same URL set (priority reorders, never drops)."""
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl

    # seed h1 before h0: the corpus's PageRank puts h0 above h1, so the
    # BFS order (parent_seq asc => h1 first) and the ranked order
    # (priority desc => h0 first) genuinely disagree
    seeds = [s["url"] for s in reversed(default_seeds(corpus_spec))]
    pages = spark.read.parquet(corpus_parquet)

    base = crawl(spark, pages, seeds, config=CrawlConfig(depth=2),
                 run_dir=str(tmp_path / "base"))
    hr = host_pagerank(base.pages(spark), iterations=4)
    rank_by_host = {r["host"]: r["rank_q"] for r in hr.collect()}
    assert len(set(rank_by_host.values())) > 1  # ranks genuinely differ

    ranked = crawl(
        spark, pages, seeds,
        config=CrawlConfig(depth=2,
                           priority_scorer=pagerank_priority_scorer(hr)),
        run_dir=str(tmp_path / "ranked"),
    )
    base_rows = base.pages(spark).orderBy("seq").collect()
    ranked_rows = ranked.pages(spark).orderBy("seq").collect()

    # reorders, never drops: same reachable set, different visit order
    assert {r["url"] for r in base_rows} == {r["url"] for r in ranked_rows}
    assert [r["url"] for r in base_rows] != [r["url"] for r in ranked_rows]

    # within every wave the visit order follows the priority-queue key,
    # with priority recomputable from the driver-side rank table
    mx = max(rank_by_host.values())

    def prio(r):
        if r["depth"] == 0:  # seeds carry the default
            return 0.5
        return min(1.0, max(0.0, rank_by_host.get(r["host"], 0.5 * mx) / mx))

    by_wave = {}
    for r in ranked_rows:
        by_wave.setdefault(r["wave"], []).append(r)
    for grp in by_wave.values():
        grp.sort(key=lambda r: r["seq"])
        keys = [(-prio(r), r["parent_seq"], r["link_pos"]) for r in grp]
        assert keys == sorted(keys)


def test_pagerank_plan_is_jvm_only(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank(df, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# HITS (hubs & authorities)
# --------------------------------------------------------------------------

def _py_hits(edges, iterations, q=10**9):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: q for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iterations):
        a_raw = {n: 0 for n in nodes}
        for u, v in edges:
            a_raw[v] += hub[u]
        anorm = max(max(a_raw.values()) // q, 1)
        auth = {n: a_raw[n] // anorm for n in nodes}
        h_raw = {n: 0 for n in nodes}
        for u, v in edges:
            h_raw[u] += auth[v]
        hnorm = max(max(h_raw.values()) // q, 1)
        hub = {n: h_raw[n] // hnorm for n in nodes}
    return auth, hub


def test_hits_matches_python_replay(spark):
    from crawler_spark.operators.graph import hits

    edges = [(1, 10), (2, 10), (3, 10), (1, 20), (2, 20), (10, 1), (1, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: (r["auth_q"], r["hub_q"]) for r in hits(df, 3).collect()}
    exp_auth, exp_hub = _py_hits(edges, 3)
    assert out == {n: (exp_auth[n], exp_hub[n]) for n in exp_auth}


def test_hits_hub_vs_authority_star(spark):
    from crawler_spark.operators.graph import hits

    # 0 points at 1..5 (pure hub); 1..5 point nowhere
    edges = [(0, v) for v in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r for r in hits(df, 2).collect()}
    assert out[0]["hub_q"] == max(r["hub_q"] for r in out.values())
    assert out[0]["auth_q"] == 0  # nothing points at the hub
    for v in range(1, 6):
        assert out[v]["hub_q"] == 0 and out[v]["auth_q"] > 0


def test_hits_partition_invariant(spark):
    from crawler_spark.operators.graph import hits

    edges = [(i % 7, (i * 3 + 1) % 7) for i in range(25) if i % 7 != (i * 3 + 1) % 7]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, hits(df.repartition(1), 3).collect()))
    b = sorted(map(tuple, hits(df.repartition(9, "src"), 3).collect()))
    assert a == b


def test_host_hits_names_join(spark):
    from crawler_spark.operators.graph import host_hits

    rows = [
        ("hub.test", ["a.test", "b.test", "c.test"]),
        ("a.test", ["b.test"]),
    ]
    out = {
        r["host"]: r
        for r in host_hits(
            spark.createDataFrame(rows, "host string, link_hosts array<string>"),
            2,
        ).collect()
    }
    assert out["hub.test"]["hub_q"] == max(r["hub_q"] for r in out.values())
    assert out["b.test"]["auth_q"] >= out["c.test"]["auth_q"]


# ---------------------------------------------------------------------------
# TrustRank (seed-personalized teleport)
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import trustrank


def replay_trust(edges, seeds, iters, q=Q, num=85, den=100):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = Counter(s for s, _ in edges)
    seeds = sorted(set(seeds))
    base = q * (den - num) // (den * len(seeds))
    r = {n: (q // len(seeds) if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {
            n: (base if n in seeds else 0) + num * inc.get(n, 0) // den
            for n in nodes
        }
    return r


def test_trustrank_matches_pure_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["id"]: r["rank_q"]
        for r in trustrank(df, [1, 4], iterations=4).collect()
    }
    assert got == replay_trust(EDGES, [1, 4], 4)


def test_trustrank_unreachable_island_gets_zero(spark):
    # 10 -> 11 is disconnected from seed 1's reach: no teleport, no inflow
    edges = EDGES + [(10, 11), (11, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank_q"] for r in trustrank(df, [1], iterations=3).collect()
    }
    assert got == replay_trust(edges, [1], 3)
    assert got[10] == 0 and got[11] == 0
    assert got[1] > 0


def test_trustrank_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r["id"]: r["rank_q"]
         for r in trustrank(df.repartition(1), [2, 5], iterations=3).collect()}
    b = {r["id"]: r["rank_q"]
         for r in trustrank(df.repartition(9), [2, 5], iterations=3).collect()}
    assert a == b == replay_trust(EDGES, [2, 5], 3)


def test_trustrank_empty_seeds_raises(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        trustrank(df, [], iterations=2)


def test_pagerank_unchanged_without_seeds(spark):
    # the seed plumbing must not disturb the classic path
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank_q"] for r in pagerank(df, iterations=3).collect()}
    assert got == replay(EDGES, 3)


# ---------------------------------------------------------------------------
# reciprocal links (link nepotism)
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import reciprocal_links, reciprocity_by_source


def test_reciprocal_links_hand_checked(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (4, 3), (5, 5), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r["id_a"], r["id_b"]) for r in reciprocal_links(df).collect())
    # {1,2} mutual, {3,4} mutual (dup edge counted once), 5->5 self ignored
    assert got == [(1, 2), (3, 4)]


def test_reciprocity_by_source(spark):
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["n_out"], r["n_mutual"], r["reciprocity"])
           for r in reciprocity_by_source(df).collect()}
    # node 1: out {2,3,4}; mutual {2,4} -> 2/3
    assert got[1] == (3, 2, round(2 / 3, 6))
    assert got[2] == (1, 1, 1.0)
    assert got[4] == (1, 1, 1.0)
    assert 3 not in got  # node 3 has no out-edges


def test_reciprocal_links_plan_is_hash_join(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = reciprocal_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# label propagation (host communities)
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import host_communities, label_propagation


def lpa_replay(edges, iters):
    """Pure-Python replay of the deterministic synchronous self-vote LPA
    spec: undirected self-loop-free neighbor relation, init label = id,
    per round every node takes the most frequent label among its
    neighbors plus one vote for its own current label, ties to the
    smallest label."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs = defaultdict(list)
    for s, d in und:
        nbrs[s].append(d)
    nodes = sorted(nbrs)
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            c = Counter(lab[m] for m in nbrs[n])
            c[lab[n]] += 1
            new[n] = min((-cnt, l) for l, cnt in c.items())[1]
        lab = new
    return lab


LPA_EDGES = [
    # clique A {1,2,3} + clique B {10,11,12} + one bridge 3->10, plus a
    # pendant 20-21 pair, duplicate and self edges to exercise cleanup
    (1, 2), (2, 3), (1, 3), (3, 1),
    (10, 11), (11, 12), (10, 12),
    (3, 10),
    (20, 21), (21, 21), (20, 21),
]


def test_label_propagation_matches_replay(spark):
    df = spark.createDataFrame(LPA_EDGES, "src long, dst long")
    got = {r["id"]: r["label"]
           for r in label_propagation(df, iterations=4).collect()}
    assert got == lpa_replay(LPA_EDGES, 4)


def test_label_propagation_two_cliques_separate_communities(spark):
    df = spark.createDataFrame(LPA_EDGES, "src long, dst long")
    got = {r["id"]: r["label"]
           for r in label_propagation(df, iterations=5).collect()}
    # each clique converges to one label, and the two differ; the pendant
    # pair forms its own community
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]
    assert got[20] == got[21]
    assert got[20] not in (got[1], got[10])


def test_label_propagation_partition_invariance(spark):
    df = spark.createDataFrame(LPA_EDGES, "src long, dst long")
    a = {r["id"]: r["label"]
         for r in label_propagation(df.repartition(1), iterations=3,
                                    num_partitions=3).collect()}
    b = {r["id"]: r["label"]
         for r in label_propagation(df.repartition(11), iterations=3,
                                    num_partitions=7).collect()}
    assert a == b == lpa_replay(LPA_EDGES, 3)


def test_label_propagation_plan_is_jvm_only(spark):
    df = spark.createDataFrame(LPA_EDGES, "src long, dst long")
    out = label_propagation(df, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_communities_end_to_end(spark):
    rows = [
        ("a.test", ["b.test", "c.test"]),
        ("b.test", ["a.test", "c.test"]),
        ("c.test", ["a.test"]),
        ("x.test", ["y.test"]),
        ("y.test", ["x.test"]),
    ]
    df = spark.createDataFrame(rows, "host string, link_hosts array<string>")
    got = {r["host"]: r["community"]
           for r in host_communities(df, iterations=5).collect()}
    # the {a,b,c} triangle is one community, {x,y} another; community
    # names resolve back to member host names
    assert got["a.test"] == got["b.test"] == got["c.test"]
    assert got["x.test"] == got["y.test"]
    assert got["a.test"] != got["x.test"]
    assert got["a.test"] in {"a.test", "b.test", "c.test"}
    assert got["x.test"] in {"x.test", "y.test"}


# ---------------------------------------------------------------------------
# jobs/rank.py CLI (one graph build -> signal tables)
# ---------------------------------------------------------------------------

def test_rank_cli_writes_signal_tables(spark, tmp_path, monkeypatch, capsys):
    import json as _json
    import sys

    import jobs.rank as jr

    rows = [
        ("hub.test", ["a.test", "b.test"]),
        ("a.test", ["hub.test", "b.test"]),
        ("b.test", ["hub.test", "a.test"]),
        ("c.test", ["hub.test"]),
        ("x.test", ["y.test"]),
        ("y.test", ["x.test"]),
    ]
    pages = spark.createDataFrame(
        rows, "host string, link_hosts array<string>"
    )
    inp, out = str(tmp_path / "pages"), str(tmp_path / "signals")
    pages.write.parquet(inp)

    monkeypatch.setattr(sys, "argv", [
        "rank.py", "--pages", inp, "--out", out, "--iterations", "4",
        "--hits", "--communities", "--reciprocity",
        "--trust-seeds", "hub.test",
    ])
    jr.main()
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_hosts"] == 6

    pr = {r["host"]: r["rank_q"]
          for r in spark.read.parquet(f"{out}/pagerank").collect()}
    assert pr == {r["host"]: r["rank_q"]
                  for r in host_pagerank(pages, iterations=4).collect()}

    tr = {r["host"]: r["rank_q"]
          for r in spark.read.parquet(f"{out}/trustrank").collect()}
    assert tr["hub.test"] > 0
    # x/y island is unreachable from the trusted seed: exactly zero trust
    assert tr["x.test"] == 0 and tr["y.test"] == 0

    cm = {r["host"]: r["community"]
          for r in spark.read.parquet(f"{out}/communities").collect()}
    assert cm == {r["host"]: r["community"]
                  for r in host_communities(pages, iterations=4).collect()}

    rc = {r["host"]: r["reciprocity"]
          for r in spark.read.parquet(f"{out}/reciprocity").collect()}
    assert rc["x.test"] == 1.0 and rc["c.test"] == 0.0

    hs = spark.read.parquet(f"{out}/hits")
    assert set(hs.columns) == {"host", "auth_q", "hub_q", "auth", "hub"}
    assert hs.count() == 6


def test_rank_cli_unknown_trust_seed_fails_loudly(
    spark, tmp_path, monkeypatch
):
    import sys

    import jobs.rank as jr

    pages = spark.createDataFrame(
        [("a.test", ["b.test"])], "host string, link_hosts array<string>"
    )
    inp = str(tmp_path / "p2")
    pages.write.parquet(inp)
    monkeypatch.setattr(sys, "argv", [
        "rank.py", "--pages", inp, "--out", str(tmp_path / "o2"),
        "--trust-seeds", "nosuch.test",
    ])
    with pytest.raises(SystemExit):
        jr.main()


def test_community_diversity_signal_blends_into_priority(spark):
    from crawler_spark.operators.graph import community_diversity_signal
    from crawler_spark.operators.priority import blend_host_signals

    comm = spark.createDataFrame(
        [("a.test", "a.test"), ("b.test", "a.test"), ("c.test", "a.test"),
         ("solo.test", "solo.test")],
        "host string, community string",
    )
    sig = {r["host"]: r["score"]
           for r in community_diversity_signal(comm).collect()}
    assert sig["solo.test"] == 1.0
    assert sig["a.test"] == sig["b.test"] == round(1 / 3, 6)

    # blends with an authority signal through the standard seam
    pr = spark.createDataFrame(
        [("a.test", 1.0), ("solo.test", 0.1)], "host string, score string"
    ).selectExpr("host", "cast(score as double) as score")
    blended = {r["host"]: r["score"] for r in blend_host_signals({
        "diversity": (community_diversity_signal(comm), 1.0),
        "pagerank": (pr, 1.0),
    }).collect()}
    # a.test: mean(1/3, 1.0); solo.test: mean(1.0, 0.1); c.test: diversity only
    assert blended["a.test"] == pytest.approx((1 / 3 + 1.0) / 2, abs=1e-6)
    assert blended["solo.test"] == pytest.approx(0.55, abs=1e-6)
    assert blended["c.test"] == pytest.approx(1 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# harmonic centrality: exact truncated + HyperBall
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import harmonic_centrality, hyperball_harmonic


def test_harmonic_hand_graph(spark):
    # path 1 -> 2 -> 3, plus 4 -> 3.  Within max_dist=2:
    # H(3) = 1/1 (from 2) + 1/1 (from 4) + 1/2 (from 1) = 2.5
    # H(2) = 1/1 (from 1); H(1) = 0; H(4) = 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 3)], "src long, dst long"
    )
    out = {r["id"]: r for r in harmonic_centrality(edges, max_dist=2).collect()}
    assert out[3]["harmonic_q"] == 2 * 1_000_000 + 500_000
    assert out[2]["harmonic_q"] == 1_000_000
    assert out[1]["harmonic_q"] == 0
    assert out[4]["harmonic_q"] == 0
    assert out[3]["harmonic"] == 2.5


def test_harmonic_truncation_and_self_loops(spark):
    # 1 -> 2 -> 3 -> 4 chain: at max_dist=2 node 4 sees 3 (d=1) and
    # 2 (d=2) but NOT 1; self-loop on 2 is ignored
    edges = spark.createDataFrame(
        [(1, 2), (2, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["id"]: r["harmonic_q"]
           for r in harmonic_centrality(edges, max_dist=2).collect()}
    assert out[4] == 1_000_000 + 500_000


def test_harmonic_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 31 + j * 17) % 40) for i in range(40) for j in (1, 2, 3)],
        "src long, dst long",
    )
    one = sorted(harmonic_centrality(edges, max_dist=3).collect())
    many = sorted(
        harmonic_centrality(edges.repartition(13), max_dist=3).collect()
    )
    assert one == many


def test_hyperball_tracks_exact_and_is_deterministic(spark):
    edges = spark.createDataFrame(
        [(i, (i * 31 + j * 17) % 60) for i in range(60) for j in (1, 2, 3)],
        "src long, dst long",
    ).cache()
    exact = {r["id"]: r["harmonic"]
             for r in harmonic_centrality(edges, max_dist=3).collect()}
    hb = {r["id"]: r["harmonic_est"]
          for r in hyperball_harmonic(edges, max_dist=3).collect()}
    assert set(hb) == set(exact)
    # HLL at m=512 on balls of <= 60 nodes sits in the linear-counting
    # regime; per-level differencing amplifies the per-ball error, so the
    # per-node bound is loose (this is a sketch) while the corpus-level
    # aggregate — the number a curation pipeline actually consumes for
    # ranking cutoffs — must track tightly
    for i, ex in exact.items():
        assert hb[i] == pytest.approx(ex, rel=0.3, abs=1.0), (i, ex, hb[i])
    assert sum(hb.values()) == pytest.approx(sum(exact.values()), rel=0.1)
    # ranking agreement: the sketch's top-10 nodes are drawn from the
    # exact top half
    top_hb = sorted(hb, key=lambda i: -hb[i])[:10]
    top_exact = set(sorted(exact, key=lambda i: -exact[i])[:30])
    assert all(i in top_exact for i in top_hb)
    # bit-reproducible across partitionings (the repo contract)
    hb2 = {r["id"]: r["harmonic_est"]
           for r in hyperball_harmonic(edges.repartition(11), max_dist=3).collect()}
    assert hb == hb2


def test_hyperball_packed_bit_identical_to_flat(spark):
    # the round-5 packed-register + dirty-set rework must be a pure
    # performance change: same registers, same estimate arithmetic,
    # bit-identical output at the web-scale p (6) and the default (9)
    edges = spark.createDataFrame(
        [(i, (i * 31 + j * 17) % 60) for i in range(60) for j in (1, 2, 3)],
        "src long, dst long",
    ).cache()
    for p in (6, 9):
        flat = sorted(
            hyperball_harmonic(edges, max_dist=3, p=p, impl="flat").collect()
        )
        packed = sorted(
            hyperball_harmonic(edges, max_dist=3, p=p, impl="packed").collect()
        )
        assert flat == packed
    with pytest.raises(ValueError, match="impl"):
        hyperball_harmonic(edges, max_dist=1, impl="nope")


def test_hyperball_dirty_set_collapses_at_saturation(spark):
    # two disjoint 4-cycles: every ball saturates by t=4, so rounds 5+
    # must be no-ops — same output as max_dist=4 (the dirty frontier is
    # empty and propagates nothing, the paper's systolic invariant)
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    cyc += [(10 + i, 10 + (i + 1) % 4) for i in range(4)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    at4 = sorted(hyperball_harmonic(edges, max_dist=4, p=6).collect())
    at8 = sorted(hyperball_harmonic(edges, max_dist=8, p=6).collect())
    assert at4 == at8


def test_hyperball_state_is_registers_not_pairs(spark):
    # the recurrence's working set: (id, bucket, rank) rows only — assert
    # the plan never materializes a (y, x) pairs table by checking the
    # output schema and that one hub node with many in-paths costs the
    # same state as any other node
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 50)], "src long, dst long"
    )
    out = hyperball_harmonic(edges, max_dist=2)
    assert set(out.columns) == {"id", "reach_est", "harmonic_est"}
    hub = {r["id"]: r for r in out.collect()}[0]
    # the hub's incoming ball is all 49 spokes at distance 1
    assert hub["harmonic_est"] == pytest.approx(49.0, rel=0.15)


def test_hyperball_small_p_still_ranks(spark):
    # p=6 (m=64) is the web-scale operating point: 8x less register state;
    # estimates get noisier but the hub ordering must survive
    edges = spark.createDataFrame(
        [(i, (i * 31 + j * 17) % 60) for i in range(60) for j in (1, 2, 3)],
        "src long, dst long",
    ).cache()
    exact = {r["id"]: r["harmonic"]
             for r in harmonic_centrality(edges, max_dist=3).collect()}
    hb = {r["id"]: r["harmonic_est"]
          for r in hyperball_harmonic(edges, max_dist=3, p=6).collect()}
    assert sum(hb.values()) == pytest.approx(sum(exact.values()), rel=0.2)
    top_hb = sorted(hb, key=lambda i: -hb[i])[:5]
    top_exact = set(sorted(exact, key=lambda i: -exact[i])[:30])
    assert all(i in top_exact for i in top_hb)
    # determinism holds at every p
    hb2 = {r["id"]: r["harmonic_est"]
           for r in hyperball_harmonic(
               edges.repartition(7), max_dist=3, p=6).collect()}
    assert hb == hb2


# ---------------------------------------------------------------------------
# bowtie decomposition (Broder et al. 2000)
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import (  # noqa: E402
    bowtie,
    reachability_closure,
)


def test_bowtie_hand_graph(spark):
    # core cycle 0->4->8->0; 1 -> core (in); core -> 2 (out);
    # 3 isolated and the 5->6 tendril pair never touch the core (other)
    edges = spark.createDataFrame(
        [(0, 4), (4, 8), (8, 0), (1, 0), (8, 2), (5, 6)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 4, 5, 6, 8)], "id long"
    )
    got = {r["id"]: r["component"] for r in bowtie(edges, nodes).collect()}
    assert got == {
        0: "core", 4: "core", 8: "core",
        1: "in", 2: "out",
        3: "other", 5: "other", 6: "other",
    }


def test_bowtie_matches_python_replay_and_partition_invariance(spark):
    import random

    rng = random.Random(3)
    n = 60
    es = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(110)})
    edf = spark.createDataFrame(es, "src long, dst long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"] for r in bowtie(edf, ndf, pivot=0).collect()
    }
    adj, radj = {}, {}
    for s, d in es:
        adj.setdefault(s, []).append(d)
        radj.setdefault(d, []).append(s)

    def close(a, start):
        seen, st = {start}, [start]
        while st:
            x = st.pop()
            for y in a.get(x, []):
                if y not in seen:
                    seen.add(y)
                    st.append(y)
        return seen

    fw, bw = close(adj, 0), close(radj, 0)
    want = {
        i: (
            "core" if i in fw and i in bw
            else "out" if i in fw
            else "in" if i in bw
            else "other"
        )
        for i in range(n)
    }
    assert got == want
    got2 = {
        r["id"]: r["component"]
        for r in bowtie(edf.repartition(7, "dst"), ndf, pivot=0).collect()
    }
    assert got2 == got


def test_bowtie_default_pivot_is_min_node(spark):
    edges = spark.createDataFrame([(10, 20), (20, 10)], "src long, dst long")
    got = {r["id"]: r["component"] for r in bowtie(edges).collect()}
    # pivot = 10; both nodes in the 10<->20 SCC
    assert got == {10: "core", 20: "core"}


def test_reachability_closure_cap_raises_loudly(spark):
    # a 12-node path needs 11 rounds; cap at 3 must raise, never truncate
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="max_rounds|frontier"):
        reachability_closure(edges, [0], max_rounds=3)


def test_reachability_closure_completing_exactly_at_cap_is_fine(spark):
    # a 4-node path completes in exactly 3 rounds; cap 3 must NOT raise
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    got = sorted(
        r["id"] for r in reachability_closure(edges, [0], max_rounds=3).collect()
    )
    assert got == [0, 1, 2, 3]
