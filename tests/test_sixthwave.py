"""Sixth-wave operators: Flesch/FK readability, sloppy-cp1252 mojibake
repair, and within-document line dedup — pure-Python replays, convention
edges, determinism, JVM-only plans."""

import re

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.filters import doc_line_dedup
from crawler_spark.operators.text_analysis import (
    MOJIBAKE_PAIRS,
    _sloppy_cp1252,
    fix_mojibake,
    readability,
)


# ---------------------------------------------------------------- readability

def py_readability(text):
    toks = (text or "").lower().split()
    n_words = len(toks)
    segs = re.split(r"[.!?]+", text or "")
    n_sent = max(sum(1 for s in segs if s.strip()), 1)
    n_syll = sum(
        max(len(re.findall(r"[aeiouy]+", w)), 1) for w in toks
    )
    if n_words == 0:
        return n_words, n_sent, n_syll, None, None
    wps, spw = n_words / n_sent, n_syll / n_words
    return (
        n_words,
        n_sent,
        n_syll,
        round(206.835 - 1.015 * wps - 84.6 * spw, 6),
        round(0.39 * wps + 11.8 * spw - 15.59, 6),
    )


READ_ROWS = [
    (0, "The cat sat on the mat. It was happy! Was it? Yes."),
    (1, "single"),
    (2, ""),                     # empty: 0 words, scores NULL
    (3, None),                   # NULL counts as empty
    (4, "no terminal punctuation here at all"),
    (5, "Dr. Smith went to Washington. He arrived... eventually!"),
    (6, "rhythm myth 123 !!! xyz"),  # vowel-free tokens floor at 1 syllable
    (7, "A long, winding sentence that keeps going and going, full of "
        "clauses, parentheticals, and enumerations, will push the "
        "words-per-sentence ratio high enough to depress reading ease "
        "substantially compared to short punchy prose."),
]


def test_readability_matches_python_replay(spark):
    df = spark.createDataFrame(READ_ROWS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"],
                      r["flesch"], r["fk_grade"])
        for r in readability(df).collect()
    }
    for i, t in READ_ROWS:
        assert got[i] == py_readability(t), (i, got[i], py_readability(t))


def test_readability_orders_difficulty(spark):
    # short punchy prose must read easier than the run-on monster
    df = spark.createDataFrame(READ_ROWS, "doc_id int, text string")
    got = {r["doc_id"]: r["flesch"] for r in readability(df).collect()}
    assert got[0] > got[7]


def test_readability_plan_jvm_only(spark):
    df = spark.createDataFrame(READ_ROWS, "doc_id int, text string")
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_readability_partition_invariance(spark):
    df = spark.createDataFrame(READ_ROWS, "doc_id int, text string")
    a = sorted(map(tuple, readability(df.coalesce(1)).collect()))
    b = sorted(map(tuple, readability(df.repartition(5)).collect()))
    assert a == b


# --------------------------------------------------------------- fix_mojibake

def garble(s):
    """UTF-8 bytes re-read under sloppy-cp1252 — the corruption the
    operator inverts."""
    return "".join(_sloppy_cp1252(b) for b in s.encode("utf-8"))


CLEAN_TEXTS = [
    "café déjà-vu – naïve “quotes” €9",
    "Œuvre… ‘single’ — ™ and Š š Ž ž Ÿ ƒ",
    "ñoño über straße GARÇON",
    "".join(t for _, t in MOJIBAKE_PAIRS),  # every target at once
]


def test_fix_mojibake_inverts_garble(spark):
    rows = [(i, garble(s)) for i, s in enumerate(CLEAN_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["fixed_text"] for r in fix_mojibake(df).collect()}
    for i, s in enumerate(CLEAN_TEXTS):
        assert got[i] == s, (i, got[i], s)


def test_fix_mojibake_leaves_clean_text_alone(spark):
    rows = [(0, "plain ascii text."), (1, "already-clean café — fine"),
            (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["fixed_text"] for r in fix_mojibake(df).collect()}
    assert got[0] == "plain ascii text."
    assert got[1] == "already-clean café — fine"  # é/— carry no signature lead
    assert got[2] == "" and got[3] is None


def test_fix_mojibake_pairs_longest_first():
    lens = [len(f) for f, _ in MOJIBAKE_PAIRS]
    assert lens == sorted(lens, reverse=True)
    # no mojibake sequence may contain an earlier-applied longer one
    for i, (f1, _) in enumerate(MOJIBAKE_PAIRS):
        for f2, _ in MOJIBAKE_PAIRS[:i]:
            assert f2 not in f1 or f2 == f1


def test_fix_mojibake_idempotent_on_repaired(spark):
    rows = [(i, garble(s)) for i, s in enumerate(CLEAN_TEXTS[:3])]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    once = fix_mojibake(df).select(
        "doc_id", F.col("fixed_text").alias("text")
    )
    twice = {r["doc_id"]: r["fixed_text"] for r in fix_mojibake(once).collect()}
    for i, s in enumerate(CLEAN_TEXTS[:3]):
        assert twice[i] == s


def test_fix_mojibake_plan_jvm_only(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    plan = fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# -------------------------------------------------------------- doc_line_dedup

def py_line_dedup(text, delim="\n"):
    if text is None:
        return None, None, None
    lines = text.split(delim)
    kept, seen = [], set()
    for l in lines:
        if l.strip() == "":
            kept.append(l)
        elif l not in seen:
            seen.add(l)
            kept.append(l)
    return len(lines), len(kept), delim.join(kept)


LINE_ROWS = [
    (0, "nav\nintro\n\nbody\nnav\n\nnav\nend"),
    (1, "a\na\na"),
    (2, "only one line"),
    (3, ""),
    (4, None),
    (5, "x\n\n\nx\n  \nx"),            # blanks (incl. whitespace-only) all kept
    (6, "Case\ncase\nCase"),            # dedup is case-sensitive
]


def test_doc_line_dedup_matches_python_replay(spark):
    df = spark.createDataFrame(LINE_ROWS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["deduped_text"])
        for r in doc_line_dedup(df).collect()
    }
    for i, t in LINE_ROWS:
        assert got[i] == py_line_dedup(t), (i, got[i], py_line_dedup(t))


def test_doc_line_dedup_keeps_first_occurrence_positions(spark):
    df = spark.createDataFrame([(0, "b\na\nb\na")], "doc_id int, text string")
    r = doc_line_dedup(df).collect()[0]
    assert r["deduped_text"] == "b\na"


def test_doc_line_dedup_plan_jvm_only_no_shuffle(spark):
    df = spark.createDataFrame(LINE_ROWS, "doc_id int, text string")
    plan = doc_line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    assert "Exchange" not in plan  # row-local by construction


def test_doc_line_dedup_then_global_composes(spark):
    # intra-doc pass first removes within-page copies; the global pass
    # then sees each page's distinct lines only
    from crawler_spark.operators.filters import line_dedup_global

    df = spark.createDataFrame(
        [(1, "shared\nmine1\nshared"), (2, "shared\nmine2")],
        "doc_id int, text string",
    )
    local = doc_line_dedup(df).select("doc_id", F.col("deduped_text").alias("text"))
    out = {
        r["doc_id"]: r["deduped_text"]
        for r in line_dedup_global(local).collect()
    }
    assert out[1] == "shared\nmine1"
    assert out[2] == "mine2"


# ------------------------------------------------------- corpus-level sanity

def test_sixthwave_on_corpus(spark, corpus_parquet):
    pages = spark.read.parquet(corpus_parquet).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    r = readability(pages)
    assert r.filter("n_words > 0 AND flesch IS NULL").count() == 0
    m = fix_mojibake(pages, out_col="fixed")
    # synthetic corpus is clean ascii: repair must be identity
    assert m.filter("fixed != text").count() == 0
    d = doc_line_dedup(pages)
    assert d.filter("n_kept_lines > n_lines").count() == 0
