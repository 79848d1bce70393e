"""Corpus-trained bigram LM scoring (`operators/lm.py`), exact duplicate
n-gram span detection/stripping (`operators/dedup.py`), source-reputation
gating (`operators/curation.py`), and the connected-components adaptive
fast path.

LM values are hand-computed from the add-one-smoothing definition; the
DuckDB value-hash parity for every operator here runs in the driver gate
(`__spark_entry__`)."""

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    connected_components,
    duplicate_ngram_spans,
    strip_duplicate_spans,
)
from crawler_spark.operators.lm import (
    kn_score,
    lm_score,
    perplexity_buckets,
    perplexity_filter,
    sb_score,
)


@pytest.fixture(scope="module")
def lm_docs(spark):
    rows = [
        (0, "a b a b"),
        (1, "a b c"),
        (2, "z"),          # single token: no bigrams
        (3, ""),           # empty text tokenizes to [] -> no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def _expected_nll(bigrams, bg_n, ctx_n, v):
    qs = [
        round(math.log((bg_n[b] + 1) / (ctx_n[b[0]] + v)) * 1_000_000)
        for b in bigrams
    ]
    return round(-sum(qs) / len(qs) / 1_000_000, 6)


def test_lm_score_hand_computed(lm_docs):
    out = {r["doc_id"]: r for r in lm_score(lm_docs).collect()}
    # corpus bigrams: doc0 (a,b)(b,a)(a,b), doc1 (a,b)(b,c)
    # counts: (a,b)=3 (b,a)=1 (b,c)=1; contexts: a=3 b=2
    # vocab over all tokens: a b c z -> 4 (empty text contributes no token;
    # tokens_expr filters the '' Spark's split('') would otherwise emit,
    # matching DuckDB's string_split_regex semantics)
    bg_n = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ctx_n = {"a": 3, "b": 2}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_nll"] == _expected_nll(
        [("a", "b"), ("b", "a"), ("a", "b")], bg_n, ctx_n, 4
    )
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_nll"] == _expected_nll(
        [("a", "b"), ("b", "c")], bg_n, ctx_n, 4
    )
    # short docs: zero bigrams, NULL score, zero exact sum
    for d in (2, 3):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["sum_logp_q"] == 0
        assert out[d]["avg_nll"] is None


def test_lm_score_partition_invariant(lm_docs):
    one = sorted(lm_score(lm_docs).collect())
    many = sorted(lm_score(lm_docs.repartition(7)).collect())
    assert one == many


def test_perplexity_filter_keeps_predictable_and_short(lm_docs):
    scores = {r["doc_id"]: r["avg_nll"] for r in lm_score(lm_docs).collect()}
    cut = scores[0]  # doc0 is the most predictable (repeats the hot bigram)
    kept = sorted(
        r["doc_id"] for r in perplexity_filter(lm_docs, cut).collect()
    )
    assert 0 in kept
    assert 2 in kept and 3 in kept  # no-bigram docs always pass the LM gate
    assert 1 not in kept  # strictly above the cut


# ---------------------------------------------------------------------------
# trigram Stupid Backoff (train/score split so every tier fires)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sb_corpora(spark):
    # train: unigrams a=2 b=2 c=2 (n_tok=6, v=3); bigrams (a,b)=2 (b,c)=2;
    # trigrams (a,b,c)=2
    train = spark.createDataFrame(
        [(10, "a b c"), (11, "a b c")], "doc_id int, text string"
    ).cache()
    score = spark.createDataFrame(
        [
            (0, "a b c"),  # trigram tier: ln(n3/n2(a,b)) = ln(2/2)
            (1, "x b c"),  # bigram tier: ln(0.4 * n2(b,c)/n1(b))
            (2, "x y c"),  # unigram floor, c in vocab: ln(.16*(2+1)/9)
            (3, "x y z"),  # unigram floor, z OOV:      ln(.16*(0+1)/9)
            (4, "a b"),    # < 3 tokens: no trigrams, NULL score
        ],
        "doc_id int, text string",
    ).cache()
    return train, score


def _sbq(x):
    return round(math.log(x) * 1_000_000)


def test_sb_score_every_backoff_tier(sb_corpora):
    train, score = sb_corpora
    out = {r["doc_id"]: r for r in sb_score(score, train_df=train).collect()}
    expected_q = {
        0: _sbq(2 / 2),
        1: _sbq(0.4 * (2 / 2)),
        2: _sbq(0.16 * (2 + 1) / (6 + 3)),
        3: _sbq(0.16 * (0 + 1) / (6 + 3)),
    }
    for d, q in expected_q.items():
        assert out[d]["n_trigrams"] == 1
        assert out[d]["sum_logsb_q"] == q
        assert out[d]["avg_nll_sb"] == round(-q / 1_000_000, 6)
    assert out[4]["n_trigrams"] == 0
    assert out[4]["sum_logsb_q"] == 0
    assert out[4]["avg_nll_sb"] is None


def test_sb_score_self_train_never_backs_off(sb_corpora):
    train, _ = sb_corpora
    # trained on itself, every scored trigram was observed: doc trigram
    # (a,b,c) has n3=2, ctx n2(a,b)=2 -> ln(1) = 0 exactly
    out = {r["doc_id"]: r for r in sb_score(train).collect()}
    for d in (10, 11):
        assert out[d]["sum_logsb_q"] == 0
        assert out[d]["avg_nll_sb"] == 0.0


def test_sb_score_partition_invariant(sb_corpora):
    train, score = sb_corpora
    one = sorted(sb_score(score, train_df=train).collect())
    many = sorted(
        sb_score(score.repartition(7), train_df=train.repartition(5)).collect()
    )
    assert one == many


# ---------------------------------------------------------------------------
# duplicate n-gram spans
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "one two three four five"  # 5-gram shared by docs 0 and 1
    rows = [
        (0, f"alpha {shared} beta gamma"),
        (1, f"{shared} delta epsilon zeta eta theta"),
        (2, "totally different words in this document here now"),
        # doc 3 repeats a 6-token phrase internally -> self-duplicate,
        # and the two occurrences' covered positions merge into one span
        (3, "p q r s t u p q r s t u"),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_duplicate_spans_hand_checked(span_docs):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["span_tokens"]
        for r in duplicate_ngram_spans(span_docs, n=5).collect()
    }
    # doc0: tokens 1..5 are the shared 5-gram
    # doc1: tokens 0..4
    # doc3: "p q r s t u p q r s t u" — every 5-gram window of the repeated
    # phrase occurs twice, covering the whole doc as ONE merged span
    assert spans == {(0, 1, 5): 5, (1, 0, 4): 5, (3, 0, 11): 12}


def test_strip_spans_rebuilds_in_order(span_docs):
    out = {r["doc_id"]: r for r in strip_duplicate_spans(span_docs, n=5).collect()}
    assert out[0]["kept_text"] == "alpha beta gamma"
    assert out[0]["removed_tokens"] == 5
    assert out[1]["kept_text"] == "delta epsilon zeta eta theta"
    assert out[2]["kept_text"] == "totally different words in this document here now"
    assert out[2]["removed_tokens"] == 0
    assert out[3]["kept_text"] == ""  # fully covered
    assert out[3]["removed_tokens"] == 12
    assert out[4]["kept_text"] == "tiny"


def test_strip_spans_preserves_case(spark):
    """The surviving text keeps its original case: detection hashes
    lowercased n-grams, but the rebuild must not lowercase the corpus
    (a training-set CLI that silently lowercases destroys information)."""
    shared = "One Two Three Four Five"
    rows = [
        (0, f"Alpha {shared} BETA gamma"),
        (1, f"{shared.lower()} delta epsilon zeta eta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, n=5).collect()}
    # the mixed-case and lower-case occurrences match each other (detection
    # is case-insensitive) and both get stripped, case intact elsewhere
    assert out[0]["kept_text"] == "Alpha BETA gamma"
    assert out[1]["kept_text"] == "delta epsilon zeta eta theta"
    assert out[0]["removed_tokens"] == 5 and out[1]["removed_tokens"] == 5


def test_strip_spans_partition_invariant(span_docs):
    one = sorted(strip_duplicate_spans(span_docs, n=5).collect())
    many = sorted(
        strip_duplicate_spans(span_docs.repartition(5), n=5).collect()
    )
    assert one == many


# ---------------------------------------------------------------------------
# source reputation
# ---------------------------------------------------------------------------


def test_source_stats_and_filter(spark):
    from crawler_spark.operators.curation import (
        source_reputation_filter,
        source_stats,
    )

    # srcA: two identical docs (dup_frac 1/2); srcB: unique docs
    rows = [
        (0, "the cat and the dog with a hat for the win", "srcA"),
        (1, "the cat and the dog with a hat for the win", "srcA"),
        (2, "the quick brown fox jumps over the lazy dog today", "srcB"),
        (3, "pack my box with five dozen liquor jugs right now", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    st = {r["source"]: r for r in source_stats(docs).collect()}
    assert st["srcA"]["n_docs"] == 2 and st["srcA"]["exact_dup_frac"] == 0.5
    assert st["srcB"]["n_docs"] == 2 and st["srcB"]["exact_dup_frac"] == 0.0
    # mean_quality is the fixed-point mean of the per-doc quality scores
    from crawler_spark.operators.text_analysis import quality_score

    per_doc = {
        r["doc_id"]: r["quality"] for r in quality_score(docs).collect()
    }
    exp_a = round(
        (round(per_doc[0] * 1e6) + round(per_doc[1] * 1e6)) / 2 / 1e6, 6
    )
    assert st["srcA"]["mean_quality"] == exp_a

    kept = source_reputation_filter(docs, max_dup_frac=0.25)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # stats table is sources-sized: the join back must be a broadcast
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# connected-components adaptive fast path
# ---------------------------------------------------------------------------


def test_cc_fast_path_matches_distributed(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a int, id_b int"
    )
    fast = sorted(connected_components(pairs).collect())
    slow = sorted(connected_components(pairs, local_threshold=0).collect())
    assert fast == slow
    assert fast  # non-trivial graph actually produced components


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ppl_docs(spark):
    # 12 scoreable docs in one group + 1 unscorable (single token);
    # repeated common bigrams make low doc_ids predictably lower-NLL
    rows = [(i, "g1", "a b " * (6 - i // 3) + "x" + str(i) + " y" + str(i))
            for i in range(12)]
    rows.append((99, "g1", "z"))
    rows += [(100 + i, "g2", "p q r " * (i + 1)) for i in range(6)]
    return spark.createDataFrame(
        rows, "doc_id int, lang string, text string"
    ).cache()


def test_ppl_buckets_exact_balanced_and_ordered(ppl_docs):
    out = perplexity_buckets(ppl_docs, by="lang", n_buckets=3).collect()
    rows = [r for r in out if r["lang"] == "g1" and r["bucket"] is not None]
    sizes = {b: sum(1 for r in rows if r["bucket"] == b) for b in (1, 2, 3)}
    assert sizes == {1: 4, 2: 4, 3: 4}  # ntile balance
    # ranking respected: every head NLL <= every tail NLL
    head = [r["avg_nll"] for r in rows if r["bucket"] == 1]
    tail = [r["avg_nll"] for r in rows if r["bucket"] == 3]
    assert max(head) <= min(tail)
    labels = {r["bucket"]: r["ppl_bucket"] for r in rows}
    assert labels == {1: "head", 2: "middle", 3: "tail"}


def test_ppl_buckets_unscored_docs(ppl_docs):
    out = {r["doc_id"]: r for r in perplexity_buckets(ppl_docs).collect()}
    assert out[99]["bucket"] is None
    assert out[99]["ppl_bucket"] == "unscored"


def test_ppl_buckets_nondefault_n_labels(ppl_docs):
    rows = [
        r
        for r in perplexity_buckets(ppl_docs, n_buckets=4).collect()
        if r["lang"] == "g1" and r["bucket"] is not None
    ]
    assert sorted(set(r["ppl_bucket"] for r in rows)) == ["1", "2", "3", "4"]
    assert all(r["ppl_bucket"] == str(r["bucket"]) for r in rows)


def test_ppl_buckets_exact_partition_invariant(ppl_docs):
    key = lambda df: sorted(
        (r["doc_id"], r["bucket"]) for r in df.collect()
    )
    assert key(perplexity_buckets(ppl_docs.repartition(1))) == key(
        perplexity_buckets(ppl_docs.repartition(7, "doc_id"))
    )


def test_ppl_buckets_approx_near_exact_and_invariant(ppl_docs):
    exact = {
        (r["lang"], r["bucket"]): 1
        for r in perplexity_buckets(ppl_docs).collect()
    }
    ap = perplexity_buckets(ppl_docs, approx_bins=4096)
    sizes = {}
    for r in ap.collect():
        if r["bucket"] is not None:
            sizes[(r["lang"], r["bucket"])] = (
                sizes.get((r["lang"], r["bucket"]), 0) + 1
            )
    # per-group totals conserved, every bucket within 2 of balanced
    assert sum(v for (g, _), v in sizes.items() if g == "g1") == 12
    assert sum(v for (g, _), v in sizes.items() if g == "g2") == 6
    assert all(abs(v - 4) <= 2 for (g, _), v in sizes.items() if g == "g1")
    a = sorted((r["doc_id"], r["bucket"]) for r in ap.collect())
    b = sorted(
        (r["doc_id"], r["bucket"])
        for r in perplexity_buckets(
            ppl_docs.repartition(5, "doc_id"), approx_bins=4096
        ).collect()
    )
    assert a == b


def test_ppl_buckets_approx_all_unscored(spark):
    # every doc too short for bigrams: the approx path must not crash on
    # an empty score range — everyone lands in the "unscored" seam
    df = spark.createDataFrame(
        [(0, "g1", "x"), (1, "g1", "")], "doc_id int, lang string, text string"
    )
    out = perplexity_buckets(df, approx_bins=128).collect()
    assert all(r["bucket"] is None and r["ppl_bucket"] == "unscored" for r in out)


def test_curate_cli_ppl_keep(spark, tmp_path, monkeypatch):
    """jobs/curate.py --ppl-keep: CCNet bucket gate keeps exactly the
    head/middle ntiles, and the kept docs are the lowest-NLL ones."""
    import sys

    import jobs.curate as jc
    from crawler_spark.operators.lm import lm_score

    rows = []
    for i in range(9):
        # graded predictability: common filler repeated, plus i rare words
        rare = " ".join(f"zq{i}x{j}" for j in range(i))
        rows.append((i, ("the cat sat on the mat " * 4 + rare).strip(), "s"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    inp = str(tmp_path / "in")
    docs.write.parquet(inp)

    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", out,
        "--min-quality", "0.0", "--langs", "en", "unknown",
        "--ppl-keep", "head", "middle",
    ])
    jc.main()
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert len(kept) == 6
    nll = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_score(docs, id_col="doc_id").collect()
    }
    dropped = set(nll) - kept
    assert max(nll[i] for i in kept) <= min(nll[i] for i in dropped)

    out2 = str(tmp_path / "out2")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", out2,
        "--min-quality", "0.0", "--langs", "en", "unknown",
        "--ppl-keep", "head", "--ppl-bins", "64",
    ])
    jc.main()
    kept2 = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert len(kept2) == 3 and kept2 <= kept


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram scoring
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kn_corpora(spark):
    # train: bigram types (a,b)=2, (b,c)=2 -> B=2, V=3;
    # N1p(a)=N1p(b)=1, ctx_n(a)=ctx_n(b)=2; N1c(b)=N1c(c)=1
    train = spark.createDataFrame(
        [(10, "a b c"), (11, "a b c")], "doc_id int, text string"
    ).cache()
    score = spark.createDataFrame(
        [
            (0, "a b"),  # seen bigram:   (max(2-.75,0)+.75*1*Pc(b))/2
            (1, "x b"),  # unseen ctx:    Pc(b) = (1+1)/(2+3)
            (2, "x z"),  # unseen ctx + never-continuation: (0+1)/5
            (3, "a c"),  # seen ctx, unseen bigram: (0+.75*1*Pc(c))/2
            (4, "a"),    # < 2 tokens: no bigrams, NULL score
        ],
        "doc_id int, text string",
    ).cache()
    return train, score


def test_kn_score_every_branch(kn_corpora):
    train, score = kn_corpora
    out = {r["doc_id"]: r for r in kn_score(score, train_df=train).collect()}
    pc_b = (1 + 1) / (2 + 3)
    pc_c = (1 + 1) / (2 + 3)
    expected_q = {
        0: _sbq((max(2 - 0.75, 0.0) + 0.75 * 1 * pc_b) / 2),
        1: _sbq(pc_b),
        2: _sbq((0 + 1) / (2 + 3)),
        3: _sbq((0.0 + 0.75 * 1 * pc_c) / 2),
    }
    for d, q in expected_q.items():
        assert out[d]["n_bigrams"] == 1
        assert out[d]["sum_logkn_q"] == q
        assert out[d]["avg_nll_kn"] == round(-q / 1_000_000, 6)
    assert out[4]["n_bigrams"] == 0
    assert out[4]["sum_logkn_q"] == 0
    assert out[4]["avg_nll_kn"] is None


def test_kn_discount_penalizes_template_tokens(spark):
    # "t" appears 8 times but always after the SAME context (low
    # continuation diversity); "v" appears twice after two different
    # contexts. KN's continuation distribution must prefer v over t when
    # the context is unseen, even though raw frequency says otherwise.
    train = spark.createDataFrame(
        [(0, "s t s t s t s t s t s t s t s t"), (1, "p v"), (2, "q v")],
        "doc_id int, text string",
    )
    score = spark.createDataFrame(
        [(100, "unseen t"), (101, "unseen v")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r["avg_nll_kn"]
        for r in kn_score(score, train_df=train).collect()
    }
    assert out[101] < out[100]  # lower NLL = more probable


def test_kn_score_partition_invariant(kn_corpora):
    train, score = kn_corpora
    one = sorted(kn_score(score, train_df=train).collect())
    many = sorted(
        kn_score(score.repartition(7), train_df=train.repartition(5)).collect()
    )
    assert one == many
