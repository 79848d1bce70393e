"""Inverted index + phrase search vs pure-Python replay."""

from collections import defaultdict

import pytest

from crawler_spark.operators.index import (
    bm25_search,
    doc_lengths,
    phrase_search,
    posting_lists,
    term_stats,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat the cat the cat"),
    (2, "a dog sat on the cat mat"),
    (3, ""),
    (4, "   "),
    (5, "cat"),
]


def _tokens(text):
    return [t for t in text.lower().strip().split() if t]


def _replay_postings(docs):
    out = {}
    for did, text in docs:
        for pos, t in enumerate(_tokens(text)):
            out.setdefault((t, did), []).append(pos)
    return {k: (len(v), sorted(v)) for k, v in out.items()}


def _replay_phrase(docs, phrase):
    out = {}
    for did, text in docs:
        toks = _tokens(text)
        k = len(phrase)
        hits = [i for i in range(len(toks) - k + 1) if toks[i:i + k] == list(phrase)]
        if hits:
            out[did] = (len(hits), hits[0])
    return out


@pytest.fixture(scope="module")
def postings(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return posting_lists(df)


def test_postings_match_replay(postings):
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in postings.collect()
    }
    assert got == _replay_postings(DOCS)


def test_term_stats(postings):
    got = {r["term"]: (r["df"], r["cf"]) for r in term_stats(postings).collect()}
    exp = defaultdict(lambda: [0, 0])
    for (t, _), (tf, _) in _replay_postings(DOCS).items():
        exp[t][0] += 1
        exp[t][1] += tf
    assert got == {t: tuple(v) for t, v in exp.items()}


@pytest.mark.parametrize(
    "phrase",
    [("the", "cat"), ("cat", "sat"), ("the", "cat", "the"), ("cat",),
     ("sat", "on", "the"), ("missing", "words")],
)
def test_phrase_search_matches_replay(postings, phrase):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(postings, phrase).collect()
    }
    assert got == _replay_phrase(DOCS, phrase)


def test_overlapping_matches_counted(spark):
    # "the the the" contains ("the","the") at positions 0 and 1
    df = spark.createDataFrame([(0, "the the the")], "doc_id long, text string")
    got = phrase_search(posting_lists(df), ("the", "the")).collect()
    assert [(r["doc_id"], r["n_matches"], r["first_pos"]) for r in got] == [(0, 2, 0)]


def test_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, phrase_search(posting_lists(df.repartition(1)), ("the", "cat")).collect()))
    b = sorted(map(tuple, phrase_search(posting_lists(df.repartition(7)), ("the", "cat")).collect()))
    assert a == b


def test_plan_jvm_only(postings):
    df = phrase_search(postings, ("the", "cat"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

import math


def _replay_bm25(docs, query, k=10, k1=1.2, b=0.75):
    toks = {did: _tokens(text) for did, text in docs}
    dls = {did: len(t) for did, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    terms = sorted(set(query))
    out = {}
    for did, t in toks.items():
        score, n_terms = 0.0, 0
        for w in terms:
            tf = t.count(w)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if w in tt)
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[did] / avgdl))
            n_terms += 1
        if n_terms:
            out[did] = (n_terms, score)
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return [(did, nt, round(s, 9)) for did, (nt, s) in ranked]


def test_bm25_matches_replay(postings):
    got = [
        (r["doc_id"], r["n_terms"], round(r["score"], 9))
        for r in bm25_search(postings, ["cat", "mat"], k=10).collect()
    ]
    assert got == _replay_bm25(DOCS, ["cat", "mat"])


def test_bm25_duplicate_query_terms_collapse(postings):
    a = bm25_search(postings, ["cat", "cat", "mat"]).collect()
    b = bm25_search(postings, ["cat", "mat"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_rare_term_outranks_stopword(postings):
    # "dog" appears in one doc; "the" in most — doc 2 must rank first
    top = bm25_search(postings, ["dog"], k=1).collect()
    assert top[0]["doc_id"] == 2


def test_bm25_precomputed_doc_lens(postings):
    dl = doc_lengths(postings)
    a = bm25_search(postings, ["cat", "sat"], doc_lens=dl).collect()
    b = bm25_search(postings, ["cat", "sat"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_empty_query_raises(postings):
    with pytest.raises(ValueError):
        bm25_search(postings, [])


def test_bm25_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    runs = [
        [
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
            for r in bm25_search(posting_lists(df.repartition(n)), ["cat", "on"]).collect()
        ]
        for n in (1, 7)
    ]
    assert runs[0] == runs[1]


def test_bm25_plan_jvm_only(postings):
    df = bm25_search(postings, ("the", "cat"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# jobs/search.py CLI (build -> bucket-pruned query)
# ---------------------------------------------------------------------------


def test_search_cli_build_and_query(spark, tmp_path, monkeypatch, capsys):
    import json as _json
    import sys

    import jobs.search as js

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    inp, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    docs.write.parquet(inp)

    monkeypatch.setattr(sys, "argv", [
        "search.py", "build", "--input", inp, "--index", idx,
    ])
    js.main()
    built = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 4  # docs 3/4 are empty -> no dl rows

    # bm25 through the bucket-pruned CLI path == full-postings operator
    monkeypatch.setattr(sys, "argv", [
        "search.py", "bm25", "--index", idx, "--query", "cat mat", "--k", "5",
    ])
    js.main()
    lines = capsys.readouterr().out.strip().splitlines()
    got = [(_json.loads(l)["doc_id"], _json.loads(l)["score"])
           for l in lines[:-1]]
    full = posting_lists(docs)
    exp = [(r["doc_id"], round(r["score"], 6))
           for r in bm25_search(full, ["cat", "mat"], k=5).collect()]
    assert got == exp

    monkeypatch.setattr(sys, "argv", [
        "search.py", "phrase", "--index", idx, "--query", "the cat",
    ])
    js.main()
    lines = capsys.readouterr().out.strip().splitlines()
    hits = {_json.loads(l)["doc_id"]: _json.loads(l)["n_matches"]
            for l in lines[:-1]}
    assert hits == {0: 1, 1: 3, 2: 1}


# ---------------------------------------------------------------------------
# RRF hybrid retrieval (rrf_fuse / hybrid_search)
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_checked(spark):
    from crawler_spark.operators.index import rrf_fuse

    # list A ranks: d1, d2, d3; list B ranks: d3, d2, d4
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (2, 0.8), (4, 0.7)], "doc_id long, c double"
    )
    got = {
        r.doc_id: (r.rrf_score, r.n_lists)
        for r in rrf_fuse([(a, "s"), (b, "c")], k=10, c=60).collect()
    }
    exp = {
        1: round(1 / 61, 9),
        2: round(1 / 62 + 1 / 62, 9),
        3: round(1 / 63 + 1 / 61, 9),
        4: round(1 / 63, 9),
    }
    assert {d: v[0] for d, v in got.items()} == pytest.approx(exp)
    assert {d: v[1] for d, v in got.items()} == {1: 1, 2: 2, 3: 2, 4: 1}
    # docs in both lists outrank docs in one
    order = sorted(got, key=lambda d: (-got[d][0], d))
    assert set(order[:2]) == {2, 3}


def test_rrf_fuse_tie_break_and_k(spark):
    from crawler_spark.operators.index import rrf_fuse

    a = spark.createDataFrame(
        [(i, 1.0) for i in range(5)], "doc_id long, s double"
    )  # all scores tie -> rank by doc_id
    out = rrf_fuse([(a, "s")], k=3, c=60).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]
    assert out[0].rrf_score == round(1 / 61, 9)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no rankings"):
        rrf_fuse([], k=3)


def test_rrf_fuse_partition_invariant(spark):
    from crawler_spark.operators.index import rrf_fuse

    a = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(30)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(10, 40)], "doc_id long, c double"
    )
    one = [(r.doc_id, r.rrf_score) for r in rrf_fuse([(a, "s"), (b, "c")], k=15).collect()]
    many = [
        (r.doc_id, r.rrf_score)
        for r in rrf_fuse(
            [(a.repartition(7), "s"), (b.repartition(3), "c")], k=15
        ).collect()
    ]
    assert one == many


def test_hybrid_search_end_to_end(spark):
    from crawler_spark.operators.index import hybrid_search, posting_lists

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple banana"),
            (3, "dog cat mouse"),
            (4, "apple dog"),
        ],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_search(
        posting_lists(docs), embs, ["apple", "banana"], [1.0, 0.0], k=4
    ).collect()
    got = {r.doc_id: r.n_lists for r in out}
    # doc 1 and 2 are strong in BOTH lexical and vector lists
    assert got[1] == 2 and got[2] == 2
    top = max(out, key=lambda r: (r.rrf_score, -r.doc_id)).doc_id
    assert top in (1, 2)
