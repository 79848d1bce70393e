"""Inverted index + phrase search vs pure-Python replay."""

from collections import defaultdict

import pytest

from crawler_spark.operators.index import phrase_search, posting_lists, term_stats

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
