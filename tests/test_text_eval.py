"""Token P/R/F1 eval (operators/text_eval.py): pure-Python replay,
multiset semantics, empty-side conventions, rollups, partition
invariance, JVM-only plan."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.text_eval import prf_summary, token_prf


def py_prf(pred, truth):
    p = pred.lower().split()
    t = truth.lower().split()
    cp, ct = Counter(p), Counter(t)
    tp = sum(min(cp[w], ct[w]) for w in cp)
    if not p:
        prec = 1.0 if not t else 0.0
    else:
        prec = tp / len(p)
    if not t:
        rec = 1.0 if not p else 0.0
    else:
        rec = tp / len(t)
    f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    return len(p), len(t), tp, round(prec, 6), round(rec, 6), round(f1, 6)


ROWS = [
    (0, "the cat sat on the mat", "the cat sat on the mat"),   # perfect
    (1, "the the the cat", "the cat"),                          # multiset caps tp
    (2, "alpha beta gamma", "delta epsilon"),                   # disjoint
    (3, "", "some truth here"),                                 # empty pred
    (4, "some pred here", ""),                                  # empty truth
    (5, "", ""),                                                # both empty
    (6, "a b c d", "b d e"),                                    # partial
    (7, "Case FOLD test", "case fold TEST extra"),              # case folding
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, pred string, truth string")
    return token_prf(df, "pred", "truth").cache()


def test_matches_python_replay(spark, scored):
    got = {
        r["doc_id"]: (r["n_pred"], r["n_truth"], r["tp"],
                      r["precision"], r["recall"], r["f1"])
        for r in scored.collect()
    }
    assert len(got) == len(ROWS)
    for i, p, t in ROWS:
        assert got[i] == py_prf(p, t), (i, got[i], py_prf(p, t))


def test_multiset_not_set(spark, scored):
    r = {x["doc_id"]: x for x in scored.collect()}[1]
    # "the the the cat" vs "the cat": tp = min(3,1) + 1 = 2, not 4
    assert r["tp"] == 2 and r["precision"] == 0.5 and r["recall"] == 1.0


def test_summary_micro_vs_macro(spark, scored):
    s = prf_summary(scored).collect()[0]
    rows = [py_prf(p, t) for _, p, t in ROWS]
    tp = sum(r[2] for r in rows)
    np_, nt = sum(r[0] for r in rows), sum(r[1] for r in rows)
    assert s["n_rows"] == len(ROWS) and s["tp"] == tp
    assert s["micro_precision"] == round(tp / np_, 6)
    assert s["micro_recall"] == round(tp / nt, 6)
    assert s["macro_precision"] == round(sum(r[3] for r in rows) / len(rows), 6)


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, pred string, truth string")
    base = sorted(map(tuple, token_prf(df.coalesce(1), "pred", "truth").collect()))
    alt = sorted(map(tuple, token_prf(df.repartition(7), "pred", "truth").collect()))
    assert base == alt


def test_plan_jvm_only(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, pred string, truth string")
    plan = token_prf(df, "pred", "truth")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_self_comparison_is_perfect(spark, corpus_parquet):
    pages = spark.read.parquet(corpus_parquet).select(
        F.xxhash64("url").alias("doc_id"), F.col("text").alias("a"),
        F.col("text").alias("b"),
    )
    s = prf_summary(token_prf(pages, "a", "b")).collect()[0]
    assert s["micro_f1"] == 1.0 and s["macro_f1"] == 1.0


def test_null_text_follows_empty_conventions(spark):
    df = spark.createDataFrame(
        [(0, None, "some truth"), (1, "some pred", None), (2, None, None)],
        "doc_id int, pred string, truth string",
    )
    got = {
        r["doc_id"]: (r["n_pred"], r["n_truth"], r["precision"], r["recall"], r["f1"])
        for r in token_prf(df, "pred", "truth").collect()
    }
    assert got[0] == (0, 2, 0.0, 0.0, 0.0)
    assert got[1] == (2, 0, 0.0, 0.0, 0.0)
    assert got[2] == (0, 0, 1.0, 1.0, 1.0)
    s = prf_summary(token_prf(df, "pred", "truth")).collect()[0]
    assert s["n_rows"] == 3 and s["macro_f1"] == round(1 / 3, 6)


def test_summary_grouped_by(spark):
    rows = [(0, "s1", "a b", "a b"), (1, "s1", "a", "b"), (2, "s2", "x y", "x y")]
    df = spark.createDataFrame(rows, "doc_id int, src string, pred string, truth string")
    scored = token_prf(df, "pred", "truth").join(
        df.select("doc_id", "src"), "doc_id"
    )
    got = {r["src"]: r for r in prf_summary(scored, by="src").collect()}
    assert got["s2"]["micro_f1"] == 1.0 and got["s2"]["n_rows"] == 1
    assert got["s1"]["n_rows"] == 2 and got["s1"]["tp"] == 2
    assert got["s1"]["micro_precision"] == round(2 / 3, 6)
    # grouped rows contain the same columns as the global rollup + key
    glob = prf_summary(scored).collect()[0]
    assert set(got["s1"].asDict()) == {"src", *glob.asDict().keys()}
