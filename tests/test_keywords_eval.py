"""Fifth-wave operators: word-n-gram P/R/F (ROUGE-N family,
operators/text_eval.ngram_prf) and RAKE keyphrase extraction
(operators/text_analysis.rake_keywords): pure-Python replays,
convention edges, determinism, JVM-only plans."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.text import STOPWORDS
from crawler_spark.operators.text_analysis import rake_keywords
from crawler_spark.operators.text_eval import ngram_prf, token_prf


# ---------------------------------------------------------------- ngram_prf

def py_ngrams(text, n):
    toks = text.lower().split()
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def py_ngram_prf(pred, truth, n):
    cp, ct = Counter(py_ngrams(pred, n)), Counter(py_ngrams(truth, n))
    np_, nt = sum(cp.values()), sum(ct.values())
    tp = sum(min(cp[g], ct[g]) for g in cp)
    prec = (1.0 if nt == 0 else 0.0) if np_ == 0 else tp / np_
    rec = (1.0 if np_ == 0 else 0.0) if nt == 0 else tp / nt
    f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    return np_, nt, tp, round(prec, 6), round(rec, 6), round(f1, 6)


NGRAM_ROWS = [
    (0, "the cat sat on the mat", "the cat sat on the mat"),  # perfect
    (1, "a b a b a b", "a b"),                                # repeated bigram caps
    (2, "alpha beta gamma", "beta gamma alpha"),              # order matters for n=2
    (3, "single", "single"),                                  # < n tokens: both empty
    (4, "one token", ""),                                     # one side empty
    (5, "x y z w", "y z w q"),                                # partial overlap
]


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_matches_python_replay(spark, n):
    df = spark.createDataFrame(NGRAM_ROWS, "doc_id int, pred string, truth string")
    got = {
        r["doc_id"]: (r["n_pred"], r["n_truth"], r["tp"],
                      r["precision"], r["recall"], r["f1"])
        for r in ngram_prf(df, "pred", "truth", n=n).collect()
    }
    assert len(got) == len(NGRAM_ROWS)
    for i, p, t in NGRAM_ROWS:
        assert got[i] == py_ngram_prf(p, t, n), (n, i, got[i])


def test_n1_is_token_prf(spark):
    df = spark.createDataFrame(NGRAM_ROWS, "doc_id int, pred string, truth string")
    a = sorted(map(tuple, token_prf(df, "pred", "truth").collect()))
    b = sorted(map(tuple, ngram_prf(df, "pred", "truth", n=1).collect()))
    assert a == b


def test_order_sensitivity_vs_tokens(spark):
    # same token multiset, different order: token F1 perfect, bigram F1 not
    df = spark.createDataFrame(
        [(0, "alpha beta gamma", "beta gamma alpha")],
        "doc_id int, pred string, truth string",
    )
    t = token_prf(df, "pred", "truth").collect()[0]
    b = ngram_prf(df, "pred", "truth", n=2).collect()[0]
    assert t["f1"] == 1.0
    assert b["tp"] == 1 and b["f1"] == 0.5  # only "beta gamma" survives


def test_short_doc_conventions(spark):
    # both sides shorter than n -> degenerate-perfect; one side only -> 0
    df = spark.createDataFrame(
        [(0, "single", "single"), (1, "two tokens", "one")],
        "doc_id int, pred string, truth string",
    )
    got = {r["doc_id"]: r for r in ngram_prf(df, "pred", "truth", n=2).collect()}
    assert got[0]["n_pred"] == 0 and got[0]["f1"] == 1.0
    assert got[1]["n_pred"] == 1 and got[1]["n_truth"] == 0 and got[1]["f1"] == 0.0


def test_ngram_partition_invariance(spark):
    df = spark.createDataFrame(NGRAM_ROWS, "doc_id int, pred string, truth string")
    a = sorted(map(tuple, ngram_prf(df.coalesce(1), "pred", "truth", n=2).collect()))
    b = sorted(map(tuple, ngram_prf(df.repartition(7), "pred", "truth", n=2).collect()))
    assert a == b


def test_ngram_plan_jvm_only(spark):
    df = spark.createDataFrame(NGRAM_ROWS, "doc_id int, pred string, truth string")
    plan = (
        ngram_prf(df, "pred", "truth", n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


def test_ngram_self_comparison_perfect(spark, corpus_parquet):
    from crawler_spark.operators.text_eval import prf_summary

    pages = spark.read.parquet(corpus_parquet).select(
        F.xxhash64("url").alias("doc_id"),
        F.col("text").alias("a"),
        F.col("text").alias("b"),
    )
    s = prf_summary(ngram_prf(pages, "a", "b", n=2)).collect()[0]
    assert s["micro_f1"] == 1.0 and s["macro_f1"] == 1.0


# ------------------------------------------------------------ rake_keywords

def py_rake(text, k=5):
    """Direct single-node RAKE replay with the operator's exact
    conventions (normalized tokens, 26-word reference stopword set,
    fixed-point word scores)."""
    import re

    toks = text.lower().split()
    norm = [re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", t) for t in toks]
    phrases, cur = [], []
    for w in norm:
        if w == "" or w in STOPWORDS:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(cur)
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wscore = {w: deg[w] * 1048576 // freq[w] for w in freq}
    seen = {}
    for p in phrases:
        s = " ".join(p)
        if s not in seen:
            seen[s] = (sum(wscore[w] for w in p), len(p))
    ranked = sorted(seen.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [
        (i + 1, ph, nw, round(fp / 1048576.0, 6))
        for i, (ph, (fp, nw)) in enumerate(ranked)
    ]


RAKE_TEXTS = [
    (0, "deep learning systems and deep learning models are deep"),
    (1, "the quick brown fox is a fox, and the fox was quick!"),
    (2, "alpha"),                          # one phrase, one word
    (3, "the and or but"),                 # all stopwords -> no phrases
    (4, ""),                               # empty doc -> no rows
    (5, "Compound keyword extraction: rapid automatic keyword extraction "
        "beats plain frequency when keyword extraction spans phrases"),
]


@pytest.fixture(scope="module")
def rake_df(spark):
    return spark.createDataFrame(RAKE_TEXTS, "doc_id int, text string")


def test_rake_matches_python_replay(spark, rake_df):
    got = {}
    for r in rake_keywords(rake_df, k=5).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["phrase"], r["n_words"], r["score"])
        )
    for i, text in RAKE_TEXTS:
        want = py_rake(text, 5)
        have = sorted(got.get(i, []))
        assert have == want, (i, have, want)


def test_rake_phrases_beat_single_words(spark, rake_df):
    # doc 0: "deep learning systems" must outrank the bare "deep"
    rows = {r["rank"]: r for r in rake_keywords(rake_df, k=5).filter("doc_id = 0").collect()}
    assert rows[1]["n_words"] >= 2
    phrases = [rows[i]["phrase"] for i in sorted(rows)]
    assert phrases.index("deep learning systems") < phrases.index("deep")


def test_rake_stopword_and_empty_docs(spark, rake_df):
    got = rake_keywords(rake_df, k=5).filter("doc_id IN (3, 4)").count()
    assert got == 0


def test_rake_punctuation_normalization(spark, rake_df):
    # doc 1: "fox," and "fox" and "quick!" normalize together
    rows = rake_keywords(rake_df, k=10).filter("doc_id = 1").collect()
    words = {r["phrase"] for r in rows}
    assert "fox" in words and not any("," in w or "!" in w for w in words)


def test_rake_partition_invariance(spark, rake_df):
    a = sorted(map(tuple, rake_keywords(rake_df.coalesce(1), k=5).collect()))
    b = sorted(map(tuple, rake_keywords(rake_df.repartition(7), k=5).collect()))
    assert a == b


def test_rake_plan_jvm_only(spark, rake_df):
    plan = (
        rake_keywords(rake_df, k=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


def test_rake_on_corpus_is_stable(spark, corpus_parquet):
    pages = spark.read.parquet(corpus_parquet).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    out = rake_keywords(pages, k=3)
    n = out.count()
    assert n > 0
    # rank is dense 1..k per doc
    bad = out.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.max("rank").alias("m")
    ).filter("c != m").count()
    assert bad == 0


# ---------------------------------------------------------------------------
# ROUGE-L (token-LCS P/R/F1)
# ---------------------------------------------------------------------------

from crawler_spark.operators.text_eval import rouge_l


def _py_lcs(a, b):
    import itertools
    # exponential reference implementation for tiny cases only
    best = 0
    for k in range(len(a), 0, -1):
        for comb in itertools.combinations(range(len(a)), k):
            sub = [a[i] for i in comb]
            it = iter(b)
            if all(x in it for x in sub):
                return k
    return best


def test_rouge_l_matches_exponential_reference(spark):
    rows = [
        (0, "a b c d e", "a x b y e"),
        (1, "the quick brown fox", "quick fox the brown"),
        (2, "w w w", "w w"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, pred string, truth string")
    out = {r["doc_id"]: r for r in rouge_l(df, "pred", "truth").collect()}
    for did, p_txt, t_txt in rows:
        p, t = p_txt.split(), t_txt.split()
        l = _py_lcs(p, t)
        r = out[did]
        assert r["lcs"] == l
        assert r["precision"] == round(l / len(p), 6)
        assert r["recall"] == round(l / len(t), 6)


def test_rouge_l_order_beats_shuffle(spark):
    # same token multiset, different order: LCS must prefer the in-order
    # candidate while ROUGE-1/token_prf cannot tell them apart
    df = spark.createDataFrame(
        [(0, "a b c d", "a b c d"), (1, "d c b a", "a b c d")],
        "doc_id int, pred string, truth string",
    )
    out = {r["doc_id"]: r["f1"] for r in rouge_l(df, "pred", "truth").collect()}
    assert out[0] == 1.0 and out[1] < out[0]
    tok = {r["doc_id"]: r["f1"]
           for r in token_prf(df, "pred", "truth").collect()}
    assert tok[0] == tok[1] == 1.0


def test_rouge_l_empty_and_null_conventions(spark):
    df = spark.createDataFrame(
        [(0, "", ""), (1, None, "x"), (2, "x", None), (3, None, None)],
        "doc_id int, pred string, truth string",
    )
    out = {r["doc_id"]: r for r in rouge_l(df, "pred", "truth").collect()}
    assert out[0]["f1"] == 1.0 and out[3]["f1"] == 1.0
    assert out[1]["f1"] == 0.0 and out[2]["f1"] == 0.0


def test_rouge_l_partition_invariant(spark):
    rows = [(i, f"tok{i} a b c", "a b c") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, pred string, truth string")
    one = sorted(rouge_l(df, "pred", "truth").collect())
    many = sorted(rouge_l(df.repartition(7), "pred", "truth").collect())
    assert one == many


# --------------------------------------------------------------- bleu_corpus

from crawler_spark.operators.text_eval import bleu_corpus  # noqa: E402


def py_bleu(rows, max_n=4):
    """Reference corpus BLEU (Papineni et al. 2002, unsmoothed) over
    (pred, truth) string pairs — mirrors bleu_corpus's conventions."""
    import math

    m = [0] * (max_n + 1)
    h = [0] * (max_n + 1)
    r_len = 0
    for pred, truth in rows:
        r_len += len((truth or "").lower().split())
        for n in range(1, max_n + 1):
            cp = Counter(py_ngrams(pred or "", n))
            ct = Counter(py_ngrams(truth or "", n))
            h[n] += sum(cp.values())
            m[n] += sum(min(cp[g], ct[g]) for g in cp)
    p = [None] + [
        round(0.0 if h[n] == 0 else m[n] / h[n], 6)
        for n in range(1, max_n + 1)
    ]
    bp_raw = 1.0 if h[1] >= r_len else math.exp(1.0 - r_len / h[1]) if h[1] else 0.0
    bp = round(0.0 if h[1] == 0 else bp_raw, 6)
    if h[1] == 0 or any(m[n] == 0 for n in range(1, max_n + 1)):
        bleu = 0.0
    else:
        mean_ln = sum(math.log(m[n] / h[n]) for n in range(1, max_n + 1)) / max_n
        bleu = round(bp_raw * math.exp(mean_ln), 6)
    out = {"r_len": r_len, "bp": bp, "bleu": bleu}
    for n in range(1, max_n + 1):
        out[f"m{n}"] = m[n]
        out[f"h{n}"] = h[n]
        out[f"p{n}"] = p[n]
    return out


BLEU_ROWS = [
    # (source, pred, truth)
    ("a", "the cat sat on the mat today", "the cat sat on the mat today"),
    ("a", "the cat sat the mat today", "the cat sat on the mat today"),
    ("a", "a a a a a", "a b a c a d"),              # clipping binds m1 to 3
    ("b", "one two three four five six", "one two three four five six seven"),
    ("b", "", "something here"),                    # empty pred contributes r_len
    ("b", "x", None),                               # NULL truth = empty reference
    ("c", "alpha beta", "gamma delta"),             # no overlap: group bleu 0
]


def _bleu_got(spark, rows, group):
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    return bleu_corpus(df, "pred", "truth",
                       group_cols=["source"] if group else [])


def test_bleu_matches_python_replay_per_group(spark):
    got = {r["source"]: r.asDict() for r in
           _bleu_got(spark, BLEU_ROWS, True).collect()}
    assert set(got) == {"a", "b", "c"}
    for src in got:
        exp = py_bleu([(p, t) for s, p, t in BLEU_ROWS if s == src])
        for k, v in exp.items():
            assert got[src][k] == v, (src, k, got[src][k], v)


def test_bleu_ungrouped_single_row(spark):
    out = _bleu_got(spark, BLEU_ROWS, False).collect()
    assert len(out) == 1
    exp = py_bleu([(p, t) for _, p, t in BLEU_ROWS])
    for k, v in exp.items():
        assert out[0][k] == v, (k, out[0][k], v)


def test_bleu_identity_is_one(spark):
    rows = [("s", "the quick brown fox jumps", "the quick brown fox jumps")]
    r = _bleu_got(spark, rows, True).collect()[0]
    assert r["bleu"] == 1.0 and r["bp"] == 1.0
    assert all(r[f"p{n}"] == 1.0 for n in range(1, 5))


def test_bleu_brevity_penalty_fires(spark):
    # perfect prefix: every pred n-gram matches, bleu == bp < 1
    import math

    rows = [("s", "a b c d e f g h", "a b c d e f g h i j")]
    r = _bleu_got(spark, rows, True).collect()[0]
    assert all(r[f"p{n}"] == 1.0 for n in range(1, 5))
    assert r["bleu"] == r["bp"] == round(math.exp(1.0 - 10 / 8), 6)


def test_bleu_zero_when_any_order_dry(spark):
    # unigrams overlap but no shared 4-gram -> unsmoothed bleu is 0
    rows = [("s", "a x b y c z d w", "a b c d e f g h")]
    r = _bleu_got(spark, rows, True).collect()[0]
    assert r["m1"] > 0 and r["m4"] == 0 and r["bleu"] == 0.0


def test_bleu_partition_invariant(spark):
    rows = [("s%d" % (i % 3), f"tok{i} a b c d", f"a b c d tok{i}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.xxhash64("pred"))
    one = sorted(map(tuple, bleu_corpus(df.coalesce(1), "pred", "truth",
                                        group_cols=["source"]).collect()))
    many = sorted(map(tuple, bleu_corpus(df.repartition(11), "pred", "truth",
                                         group_cols=["source"]).collect()))
    assert one == many


def test_bleu_plan_jvm_only(spark):
    df = spark.createDataFrame(BLEU_ROWS, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    plan = (
        bleu_corpus(df, "pred", "truth", group_cols=["source"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    # the fusion contract: BOTH sides of every gram ride ONE explode
    assert plan.count("Generate") == 1


# --------------------------------------------------------------- chrf_corpus

from crawler_spark.operators.text_eval import chrf_corpus  # noqa: E402


def py_chrf(rows, max_n=6, beta=2.0):
    """Reference corpus chrF (Popović 2015) over (pred, truth) string
    pairs — mirrors chrf_corpus's fixed-denominator conventions."""
    import re

    def norm(s):
        return re.sub(r"\s+", "", (s or "").lower())

    def grams(s, n):
        return [s[i : i + n] for i in range(len(s) - n + 1)]

    m = [0] * (max_n + 1)
    h = [0] * (max_n + 1)
    r = [0] * (max_n + 1)
    for pred, truth in rows:
        ps, ts = norm(pred), norm(truth)
        for n in range(1, max_n + 1):
            cp, ct = Counter(grams(ps, n)), Counter(grams(ts, n))
            h[n] += sum(cp.values())
            r[n] += sum(ct.values())
            m[n] += sum(min(cp[g], ct[g]) for g in cp)
    p0 = sum(0.0 if h[n] == 0 else m[n] / h[n] for n in range(1, max_n + 1)) / max_n
    r0 = sum(0.0 if r[n] == 0 else m[n] / r[n] for n in range(1, max_n + 1)) / max_n
    b2 = beta * beta
    chrf = 0.0 if p0 + r0 == 0 else (1 + b2) * p0 * r0 / (b2 * p0 + r0)
    out = {"chrp": round(p0, 6), "chrr": round(r0, 6), "chrf": round(chrf, 6)}
    for n in range(1, max_n + 1):
        out[f"m{n}"], out[f"h{n}"], out[f"r{n}"] = m[n], h[n], r[n]
    return out


CHRF_ROWS = [
    ("a", "the cat sat on the mat", "the cat sat on the mat"),
    ("a", "teh cat sat on the mat", "the cat sat on the mat"),  # transposition
    ("a", "a a a a a", "a b a c a d"),
    ("b", "Hello World", "hello  world"),   # case + whitespace insensitive
    ("b", "", "something here"),
    ("b", "x", None),
    ("c", "ab", "cd"),                      # zero overlap
]


def _chrf_got(spark, rows, group):
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    return chrf_corpus(df, "pred", "truth",
                       group_cols=["source"] if group else [])


def test_chrf_matches_python_replay_per_group(spark):
    got = {r["source"]: r.asDict() for r in
           _chrf_got(spark, CHRF_ROWS, True).collect()}
    assert set(got) == {"a", "b", "c"}
    for src in got:
        exp = py_chrf([(p, t) for s, p, t in CHRF_ROWS if s == src])
        for k, v in exp.items():
            assert got[src][k] == v, (src, k, got[src][k], v)


def test_chrf_ungrouped_and_identity(spark):
    out = _chrf_got(spark, CHRF_ROWS, False).collect()
    assert len(out) == 1
    exp = py_chrf([(p, t) for _, p, t in CHRF_ROWS])
    for k, v in exp.items():
        assert out[0][k] == v, (k, out[0][k], v)
    ident = _chrf_got(
        spark, [("s", "same text here", "same  TEXT here")], True
    ).collect()[0]
    assert ident["chrf"] == 1.0 and ident["chrp"] == 1.0 and ident["chrr"] == 1.0


def test_chrf_sees_subword_damage_tokens_miss(spark):
    # one flipped char inside one token: token P/R/F1 scores the damaged
    # token as a total miss; chrF keeps most of the char-gram credit
    rows = [("s", "internatxonal trade agreement", "international trade agreement")]
    c = _chrf_got(spark, rows, True).collect()[0]
    df = spark.createDataFrame(rows, "source string, pred string, truth string") \
        .withColumn("doc_id", F.lit(0))
    t = token_prf(df, "pred", "truth").collect()[0]
    assert t["f1"] < 0.7 < c["chrf"]


def test_chrf_empty_conventions(spark):
    # both sides empty -> all-zero counts, chrf 0 (fixed-denominator form)
    r = _chrf_got(spark, [("s", "", None)], True).collect()[0]
    assert r["chrf"] == 0.0 and r["h1"] == 0 and r["r1"] == 0


def test_chrf_partition_invariant(spark):
    rows = [("s%d" % (i % 3), f"tok{i} alpha beta", f"alpha beta tok{i}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.xxhash64("pred"))
    one = sorted(map(tuple, chrf_corpus(df.coalesce(1), "pred", "truth",
                                        group_cols=["source"]).collect()))
    many = sorted(map(tuple, chrf_corpus(df.repartition(11), "pred", "truth",
                                         group_cols=["source"]).collect()))
    assert one == many


def test_chrf_plan_jvm_only(spark):
    df = spark.createDataFrame(CHRF_ROWS, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    plan = (
        chrf_corpus(df, "pred", "truth", group_cols=["source"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    # same fusion contract as the BLEU plan test
    assert plan.count("Generate") == 1


# ------------------------------------------------- seeded fuzz: bleu + chrf

def _fuzz_pairs(n=200, seed=77):
    """Deterministic word-soup pairs spanning the convention space:
    shared vocab (forces partial n-gram overlap), repeats (forces
    clipping), length skew (forces BP), empties and single tokens."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense collisions
    rows = []
    for i in range(n):
        kind = rng.randrange(6)
        if kind == 0:
            p, t = "", rng.choice(["", "w0", "w0 w1 w2"])
        elif kind == 1:
            t = " ".join(rng.choices(vocab, k=rng.randrange(1, 30)))
            p = t  # identity
        elif kind == 2:
            toks = rng.choices(vocab, k=rng.randrange(4, 40))
            cut = rng.randrange(1, len(toks))
            p, t = " ".join(toks[:cut]), " ".join(toks)  # prefix: BP fires
        else:
            p = " ".join(rng.choices(vocab, k=rng.randrange(0, 35)))
            t = " ".join(rng.choices(vocab, k=rng.randrange(0, 35)))
        rows.append((f"g{i % 5}", p, t))
    return rows


def test_bleu_fuzz_matches_python_replay(spark):
    rows = _fuzz_pairs()
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    got = {r["source"]: r.asDict() for r in
           bleu_corpus(df, "pred", "truth", group_cols=["source"]).collect()}
    assert len(got) == 5
    for src in got:
        exp = py_bleu([(p, t) for s, p, t in rows if s == src])
        for k, v in exp.items():
            assert got[src][k] == v, (src, k, got[src][k], v)


def test_chrf_fuzz_matches_python_replay(spark):
    rows = _fuzz_pairs(seed=78)
    df = spark.createDataFrame(rows, "source string, pred string, truth string")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    got = {r["source"]: r.asDict() for r in
           chrf_corpus(df, "pred", "truth", group_cols=["source"]).collect()}
    assert len(got) == 5
    for src in got:
        exp = py_chrf([(p, t) for s, p, t in rows if s == src])
        for k, v in exp.items():
            assert got[src][k] == v, (src, k, got[src][k], v)
