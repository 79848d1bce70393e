"""Redirect-chain resolution (pointer doubling) vs a pure-Python walk."""

import pytest

from crawler_spark.frontier.redirects import resolve_redirects, rewrite_to_terminal


def _walk(edges, max_hops):
    nxt = {u: v for u, v in edges if v is not None}
    out = {}
    for u, _ in edges:
        cur, hops = u, 0
        while cur in nxt and hops <= max_hops:
            cur, hops = nxt[cur], hops + 1
        if cur in nxt or hops > max_hops:  # cap hit mid-chain
            out[u] = (None, None, False)
        else:
            out[u] = (cur, hops, True)
    return out


EDGES = [
    ("a", "b"), ("b", "c"), ("c", None),
    ("d", "d"),                       # self-loop
    ("e", "f"), ("f", "e"),           # 2-cycle
    ("g", "zz"),                      # dangling target = terminal
    ("h", "i"), ("i", "j"), ("j", "k"), ("k", "l"), ("l", "m"), ("m", None),
]


@pytest.mark.parametrize("max_hops", [2, 4, 5, 32])
def test_matches_pure_python_walk(spark, max_hops):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert got == _walk(EDGES, max_hops)


def test_long_chain_resolves_in_log_rounds(spark):
    n = 64
    edges = [(f"u{i}", f"u{i+1}") for i in range(n)] + [(f"u{n}", None)]
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    got = {r["url"]: r for r in resolve_redirects(df, max_hops=64).collect()}
    assert got["u0"]["final_url"] == f"u{n}" and got["u0"]["hops"] == n
    assert all(got[f"u{i}"]["resolved"] for i in range(n + 1))


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    a = sorted(map(tuple, resolve_redirects(df.repartition(1), max_hops=8).collect()))
    b = sorted(map(tuple, resolve_redirects(df.repartition(7), max_hops=8).collect()))
    assert a == b


def test_rewrite_to_terminal(spark):
    e = spark.createDataFrame(EDGES, "url string, redirect_to string")
    resolved = resolve_redirects(e, max_hops=8)
    frontier = spark.createDataFrame(
        [("a",), ("d",), ("q",), ("m",)], "url string"
    )
    got = sorted(r["url"] for r in rewrite_to_terminal(frontier, resolved).collect())
    # a -> c (chain), d unresolved -> unchanged, q unknown -> unchanged, m terminal -> m
    assert got == ["c", "d", "m", "q"]


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    plan = (
        resolve_redirects(df, max_hops=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
