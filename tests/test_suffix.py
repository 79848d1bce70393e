"""Suffix-array module (operators/suffix.py): brute-force parity.

The oracle here is literal Python: materialize every suffix, sort, and
compare — the thing the distributed operator must never do but a 38-token
test corpus can.  The DuckDB cross-check runs in the gate
(``sa_rank_docs`` / ``sa_repeat_spans_docs`` via check_entry --extended).
"""

import re

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the cat sat on the mat the cat sat on the hat"),
    (1, "a completely different sentence with unique words only"),
    (2, "the cat sat on the mat again and again and again"),
    (3, "singleton"),
    (4, "  Mixed   CASE tokens  the cat sat  "),
    (5, ""),
    (6, "the cat sat on the mat the cat sat on the hat"),  # exact dup of 0
]


def _toks(t):
    t = t.strip().lower()
    return [x for x in re.split(r"\s+", t) if x] if t else []


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def suffixes():
    corpus = {d: _toks(t) for d, t in DOCS}
    return [
        (d, p, tuple(tk[p:])) for d, tk in corpus.items()
        for p in range(len(tk))
    ]


def test_suffix_ranks_match_brute_force_sort(spark, docs_df, suffixes):
    from crawler_spark.operators.suffix import suffix_array_ranks

    order = sorted(set(s for _, _, s in suffixes))
    want = {(d, p): order.index(s) for d, p, s in suffixes}
    got = {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_array_ranks(docs_df).collect()
    }
    assert got == want


def test_identical_suffixes_tie(spark, docs_df):
    from crawler_spark.operators.suffix import suffix_array_ranks

    ranks = {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_array_ranks(docs_df).collect()
    }
    # doc 6 is byte-identical to doc 0: every aligned suffix pair ties
    for p in range(12):
        assert ranks[(0, p)] == ranks[(6, p)]


def test_max_repeat_len_matches_brute_force(spark, docs_df, suffixes):
    from crawler_spark.operators.suffix import max_repeat_len

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    want = {}
    for d, p, s in suffixes:
        want[(d, p)] = max(
            (lcp(s, s2) for d2, p2, s2 in suffixes if (d2, p2) != (d, p)),
            default=0,
        )
    got = {
        (r["doc_id"], r["pos"]): r["repeat_len"]
        for r in max_repeat_len(docs_df).collect()
    }
    assert got == want


def test_sa_spans_equal_hashed_dup_spans(spark, docs_df):
    """Same Lee-et-al. semantics through disjoint machinery: LCP descent
    over the suffix array vs corpus n-gram hash counting."""
    from crawler_spark.operators.dedup import duplicate_ngram_spans
    from crawler_spark.operators.suffix import sa_duplicate_spans

    for n in (3, 5):
        a = sorted(tuple(r) for r in sa_duplicate_spans(docs_df, min_len=n).collect())
        b = sorted(tuple(r) for r in duplicate_ngram_spans(docs_df, n=n).collect())
        assert a == b
    assert len(sa_duplicate_spans(docs_df, min_len=3).collect()) > 0


def test_order_preserving_rank_dense_and_ordered(spark):
    from crawler_spark.operators.suffix import order_preserving_rank

    df = spark.range(0, 5000).select(
        F.col("id"),
        F.expr("concat('k', pmod(xxhash64(cast(id as string)), 700))").alias("k"),
    )
    rows = order_preserving_rank(df, ["k"], "rk").collect()
    want = {k: i for i, k in enumerate(sorted(set(r["k"] for r in rows)))}
    assert all(r["rk"] == want[r["k"]] for r in rows)


def test_order_preserving_rank_partition_invariant(spark):
    """Ranks are a function of the data, not of the partitioning — the
    AQE-coalesce bug class this primitive had to dodge (offsets derived
    from a different physical evaluation of the same frame)."""
    from crawler_spark.operators.suffix import order_preserving_rank

    df = spark.range(0, 3000).select(
        F.expr("cast(pmod(xxhash64(cast(id as string)), 900) as string)").alias("k"),
        F.col("id"),
    )
    outs = []
    for parts in (1, 3, 16):
        rows = order_preserving_rank(
            df.repartition(parts), ["k"], "rk", num_partitions=parts
        ).collect()
        outs.append(sorted((r["id"], r["rk"]) for r in rows))
    assert outs[0] == outs[1] == outs[2]


def test_empty_and_degenerate_corpora(spark):
    from crawler_spark.operators.suffix import (
        max_repeat_len,
        sa_duplicate_spans,
        suffix_array_ranks,
    )

    empty = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
    assert suffix_array_ranks(empty).count() == 0
    assert sa_duplicate_spans(empty).count() == 0

    one = spark.createDataFrame([(7, "lonely")], ["doc_id", "text"])
    assert [tuple(r) for r in suffix_array_ranks(one).collect()] == [(7, 0, 0)]
    assert [tuple(r) for r in max_repeat_len(one).collect()] == [(7, 0, 0)]
    assert sa_duplicate_spans(one).count() == 0
