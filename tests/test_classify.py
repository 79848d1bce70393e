"""Hashed NB classifier + DSIR importance resampling
(`operators/classify.py`).

Semantics are replayed exactly in pure Python (same md5 hash60
arithmetic, same fixed-point quantization); DuckDB value-hash parity for
the same operators runs in the driver gate (`__spark_entry__`:
`nb_quality_docs`, `dsir_sample_docs`)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.classify import (
    dsir_topk,
    dsir_weights,
    nb_classifier_gate,
    nb_score,
    nb_train,
)

_Q = 1_000_000


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str):
    return [t for t in text.strip().lower().split() if t]


def _nb_replay(rows, n_buckets):
    """Pure-Python replay of nb_train + nb_score on (id, text, label)."""
    pos = [0] * n_buckets
    neg = [0] * n_buckets
    for _, text, y in rows:
        for t in _toks(text):
            b = _h60(t) % n_buckets
            if y:
                pos[b] += 1
            else:
                neg[b] += 1
    pt, nt = sum(pos), sum(neg)
    llr = [
        int(
            round(
                (
                    math.log((pos[b] + 1) / (pt + n_buckets))
                    - math.log((neg[b] + 1) / (nt + n_buckets))
                )
                * _Q
            )
        )
        for b in range(n_buckets)
    ]
    out = {}
    for i, text, _ in rows:
        feats = [_h60(t) % n_buckets for t in _toks(text)]
        out[i] = (len(feats), sum(llr[b] for b in feats))
    return out


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", 1),
        (1, "a curated well written paragraph about science", 1),
        (2, "science and careful prose about the quick world", 1),
        (3, "buy cheap buy cheap buy cheap click here now", 0),
        (4, "zzz qqq xxx spam spam spam spam link link", 0),
        (5, "", 0),  # empty doc: zero features, evidence 0
        (6, "the careful fox writes prose about science", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, label int")
    return rows, df.cache()


def test_nb_matches_pure_python_replay(spark, labeled):
    rows, df = labeled
    model = nb_train(df, n_buckets=64)
    got = {
        r["doc_id"]: (r["n_feats"], r["sum_llr_q"])
        for r in nb_score(df, model).collect()
    }
    assert got == _nb_replay(rows, 64)


def test_nb_prior_and_margin(spark, labeled):
    rows, df = labeled
    model = nb_train(df, n_buckets=64)
    n_pos = sum(y for _, _, y in rows)
    n_neg = len(rows) - n_pos
    assert model.prior_q == int(
        round(math.log((n_pos + 1) / (n_neg + 1)) * _Q)
    )
    r = {x["doc_id"]: x for x in nb_score(df, model).collect()}
    for i, (nf, s) in _nb_replay(rows, 64).items():
        assert r[i]["nb_margin"] == round((model.prior_q + s) / _Q, 6)
        assert r[i]["nb_pred"] == int(model.prior_q + s > 0)
    # empty doc scores exactly the prior
    assert r[5]["n_feats"] == 0 and r[5]["sum_llr_q"] == 0


def test_nb_separates_the_training_classes(spark, labeled):
    rows, df = labeled
    kept = {
        r["doc_id"]
        for r in nb_classifier_gate(df, df, n_buckets=64).collect()
    }
    # spammy docs score negative, curated docs positive (self-scoring —
    # the smoke check that the sign convention is right, not a claim of
    # generalization)
    assert {0, 1, 2, 6} <= kept
    assert 3 not in kept and 4 not in kept


def test_nb_partition_invariance(spark, labeled):
    rows, df = labeled
    model = nb_train(df.repartition(7), n_buckets=64)
    a = sorted(
        (r["doc_id"], r["sum_llr_q"])
        for r in nb_score(df.repartition(3), model).collect()
    )
    model1 = nb_train(df.coalesce(1), n_buckets=64)
    b = sorted(
        (r["doc_id"], r["sum_llr_q"])
        for r in nb_score(df.coalesce(1), model1).collect()
    )
    assert a == b


def test_nb_model_is_bucket_sized_and_broadcast(spark, labeled):
    rows, df = labeled
    model = nb_train(df, n_buckets=32)
    assert model.table.count() == 32  # every bucket present, smoothed
    plan = nb_score(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _dsir_replay(raw_rows, target_rows, n_buckets):
    def feats(text):
        tk = _toks(text)
        return [
            _h60(tk[i] + " " + tk[i + 1]) % n_buckets
            for i in range(len(tk) - 1)
        ]

    t_cnt = [0] * n_buckets
    r_cnt = [0] * n_buckets
    for _, text in target_rows:
        for b in feats(text):
            t_cnt[b] += 1
    for _, text in raw_rows:
        for b in feats(text):
            r_cnt[b] += 1
    tt, rt = sum(t_cnt), sum(r_cnt)
    lw = [
        int(
            round(
                (
                    math.log((t_cnt[b] + 1) / (tt + n_buckets))
                    - math.log((r_cnt[b] + 1) / (rt + n_buckets))
                )
                * _Q
            )
        )
        for b in range(n_buckets)
    ]
    return {
        i: (len(feats(text)), sum(lw[b] for b in feats(text)))
        for i, text in raw_rows
    }


@pytest.fixture(scope="module")
def raw_target(spark):
    raw = [
        (0, "science prose about careful experiments and results"),
        (1, "buy cheap click now buy cheap click now"),
        (2, "careful experiments about science results and prose"),
        (3, "x"),  # single token: no bigrams, weight 0
        (4, "link spam link spam link spam link spam"),
    ]
    target = [
        (100, "careful science experiments and careful results"),
        (101, "prose about science and about experiments"),
    ]
    return (
        raw,
        target,
        spark.createDataFrame(raw, "doc_id int, text string").cache(),
        spark.createDataFrame(target, "doc_id int, text string").cache(),
    )


def test_dsir_matches_pure_python_replay(spark, raw_target):
    raw, target, rdf, tdf = raw_target
    got = {
        r["doc_id"]: (r["n_feats"], r["sum_lw_q"])
        for r in dsir_weights(rdf, tdf, n_buckets=128).collect()
    }
    assert got == _dsir_replay(raw, target, 128)


def test_dsir_ranks_target_like_docs_first(spark, raw_target):
    raw, target, rdf, tdf = raw_target
    top = dsir_topk(rdf, tdf, 2, n_buckets=128).collect()
    assert {r["doc_id"] for r in top} == {0, 2}
    # zero-bigram doc carries weight 0, never NULL
    w = {r["doc_id"]: r["sum_lw_q"] for r in
         dsir_weights(rdf, tdf, n_buckets=128).collect()}
    assert w[3] == 0


def test_curate_cli_nb_gate_and_dsir(spark, tmp_path, monkeypatch):
    """jobs/curate.py --nb-seed / --dsir-target end-to-end: the NB gate
    drops the spam docs, DSIR keeps the most target-like survivors."""
    import sys

    import jobs.curate as jc

    docs = spark.createDataFrame(
        [
            (0, "the careful fox writes prose about the quiet science", "s1"),
            (1, "the quick brown fox jumps over the lazy dog again", "s1"),
            (2, "buy cheap buy cheap click the offer now now now", "s2"),
            (3, "the spam link spam link spam link spam here", "s2"),
        ],
        "doc_id int, text string, source string",
    )
    seed = spark.createDataFrame(
        [
            ("careful prose about quiet science and writing", 1),
            ("the fox writes about science", 1),
            ("buy cheap click offer now", 0),
            ("spam link spam link here", 0),
        ],
        "text string, label int",
    )
    target = spark.createDataFrame(
        [(100, "the careful fox writes about quiet science")],
        "doc_id int, text string",
    )
    inp, seedp = str(tmp_path / "in"), str(tmp_path / "seed")
    tgtp, outp = str(tmp_path / "tgt"), str(tmp_path / "out")
    docs.write.parquet(inp)
    seed.write.parquet(seedp)
    target.write.parquet(tgtp)

    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", outp,
        "--min-quality", "0.0", "--langs", "en", "unknown",
        "--nb-seed", seedp, "--nb-buckets", "64",
        "--dsir-target", tgtp, "--dsir-keep", "1",
        "--dsir-buckets", "128",
    ])
    jc.main()
    kept = spark.read.parquet(outp).collect()
    # NB drops both spam docs; DSIR keeps the single most target-like doc
    assert [r["doc_id"] for r in kept] == [0]

    # --dsir-target without --dsir-keep is a usage error, not a crash
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", outp,
        "--dsir-target", tgtp,
    ])
    with pytest.raises(SystemExit):
        jc.main()


def test_dsir_topk_partition_invariant_and_top_n_plan(spark, raw_target):
    raw, target, rdf, tdf = raw_target
    a = [r["doc_id"] for r in dsir_topk(rdf.repartition(5), tdf, 3,
                                        n_buckets=128).collect()]
    b = [r["doc_id"] for r in dsir_topk(rdf.coalesce(1), tdf, 3,
                                        n_buckets=128).collect()]
    assert a == b
    plan = (
        dsir_topk(rdf, tdf, 3, n_buckets=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
