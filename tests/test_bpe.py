"""Distributed BPE training/encoding (`operators/bpe.py`) vs an exact
pure-Python replay of the published algorithm (Sennrich et al. 2016).

No SQL oracle: the training loop is iterative with a driver-side argmax
per round (like connected components) — the replay below IS the oracle.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.bpe import (
    _EOW,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    word_freqs,
)

TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "new new new nebular",
]


def py_bpe(texts, n_merges, min_pair_freq=2):
    wf = Counter(w for t in texts for w in t.strip().lower().split())
    syms = {w: list(w) + [_EOW] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_freq:
            break
        merges.append((rank, a, b))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms, wf


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    ).cache()


def test_bpe_train_matches_python_replay(docs):
    merges, syms_df = bpe_train(docs, n_merges=12)
    exp_merges, exp_syms, _ = py_bpe(TEXTS, 12)
    assert merges == exp_merges
    got = {r["word"]: list(r["syms"]) for r in syms_df.collect()}
    assert got == exp_syms


def test_bpe_train_partition_invariant(docs):
    a, _ = bpe_train(docs.repartition(1), n_merges=8)
    b, _ = bpe_train(docs.repartition(7, "doc_id"), n_merges=8)
    assert a == b


def test_bpe_train_early_stop_on_min_freq(docs):
    # a high floor stops training before n_merges rounds
    merges, _ = bpe_train(docs, n_merges=50, min_pair_freq=8)
    exp_merges, _, _ = py_bpe(TEXTS, 50, min_pair_freq=8)
    assert merges == exp_merges
    assert 0 < len(merges) < 50


def test_bpe_vocab_conserves_mass(docs):
    merges, syms_df = bpe_train(docs, n_merges=6)
    vocab = {r["subword"]: r["freq"] for r in bpe_vocab(syms_df).collect()}
    _, exp_syms, wf = py_bpe(TEXTS, 6)
    exp = Counter()
    for w, s in exp_syms.items():
        for sub in s:
            exp[sub] += wf[w]
    assert vocab == dict(exp)


def test_bpe_encode_replays_training_segmentation(docs):
    merges, syms_df = bpe_train(docs, n_merges=12)
    trained = {r["word"]: list(r["syms"]) for r in syms_df.collect()}
    enc = bpe_encode(docs, merges)
    for r in enc.collect():
        toks = list(r["bpe_tokens"])
        # re-split the doc's token stream word by word and compare
        i = 0
        for w in r["text"].strip().lower().split():
            seg = trained[w]
            assert toks[i : i + len(seg)] == seg
            i += len(seg)
        assert i == len(toks) == r["n_bpe_tokens"]


def test_bpe_encode_unseen_word_falls_back(docs, spark):
    merges, _ = bpe_train(docs, n_merges=12)
    new = spark.createDataFrame([(0, "zzz")], "doc_id int, text string")
    row = bpe_encode(new, merges).collect()[0]
    # nothing mergeable: raw characters + end-of-word marker survive
    assert list(row["bpe_tokens"]) == ["z", "z", "z", _EOW]


def test_word_freqs_sample_is_deterministic_slice(docs):
    full = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    half_a = {
        r["word"]: r["freq"]
        for r in word_freqs(docs, sample_frac=0.5).collect()
    }
    half_b = {
        r["word"]: r["freq"]
        for r in word_freqs(
            docs.repartition(5, "doc_id"), sample_frac=0.5
        ).collect()
    }
    assert half_a == half_b  # hash slice, not RNG
    assert set(half_a) <= set(full)


def test_bpe_multibyte_symbols(spark):
    # codepoint-level splitting: CJK text segments per character
    df = spark.createDataFrame(
        [(0, "中文 中文 中文")], "doc_id int, text string"
    )
    merges, syms_df = bpe_train(df, n_merges=3)
    got = {r["word"]: list(r["syms"]) for r in syms_df.collect()}
    exp_merges, exp_syms, _ = py_bpe(["中文 中文 中文"], 3)
    assert merges == exp_merges and got == exp_syms
    # fully merged: one symbol for the whole word
    assert got["中文"] == ["中文" + _EOW]


def test_tokenizer_cli_end_to_end(spark, docs, tmp_path, monkeypatch):
    """jobs/tokenizer.py: merges + vocab written, encode round-trips, and
    the written merge table equals the library's."""
    import sys

    import jobs.tokenizer as jt

    inp = str(tmp_path / "in")
    out = str(tmp_path / "tok")
    enc = str(tmp_path / "enc")
    docs.write.parquet(inp)
    monkeypatch.setattr(sys, "argv", [
        "tokenizer.py", "--input", inp, "--output", out,
        "--merges", "10", "--encode", enc,
    ])
    jt.main()
    stored = [
        (r["rank"], r["left"], r["right"])
        for r in spark.read.parquet(out + "/merges").orderBy("rank").collect()
    ]
    exp_merges, exp_syms, wf = py_bpe(TEXTS, 10)
    assert stored == exp_merges
    vocab = {
        r["subword"]: r["freq"]
        for r in spark.read.parquet(out + "/vocab").collect()
    }
    assert sum(vocab.values()) == sum(
        len(s) * wf[w] for w, s in exp_syms.items()
    )
    encoded = spark.read.parquet(enc)
    assert encoded.count() == len(TEXTS)
    assert "bpe_tokens" in encoded.columns and "n_bpe_tokens" in encoded.columns


def test_bpe_encode_whitespace_rule_matches_train(spark):
    """Java \\s is ASCII-only: a U+00A0 'space' is part of the token on
    both the train and encode paths (no silent split divergence)."""
    text = "aa bb aa bb cc"
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    merges, syms_df = bpe_train(df, n_merges=6, min_pair_freq=2)
    trained = {r["word"]: list(r["syms"]) for r in syms_df.collect()}
    assert "aa bb" in trained  # nbsp did NOT split the word
    row = bpe_encode(df, merges).collect()[0]
    toks = list(row["bpe_tokens"])
    exp = trained["aa bb"] * 2 + trained["cc"]
    assert toks == exp


def test_tokenizer_stats_hand_computed(spark):
    from crawler_spark.operators.bpe import tokenizer_stats

    # no merges at all: every word of length L encodes to L+1 pieces
    docs = spark.createDataFrame(
        [
            (0, "en", "ab ab"),    # 2 words, 6 pieces, 5 bytes
            (1, "en", "abc"),      # 1 word,  4 pieces, 3 bytes
            (2, "de", "a"),        # 1 word,  2 pieces, 1 byte
        ],
        "doc_id int, source string, text string",
    )
    enc = bpe_encode(docs, merges=[])
    out = {r["source"]: r for r in tokenizer_stats(enc).collect()}
    en = out["en"]
    assert (en["n_docs"], en["n_words"], en["n_bpe_tokens"], en["n_bytes"]) \
        == (2, 3, 10, 8)
    assert en["fertility"] == round(10 / 3, 6)
    assert en["bytes_per_token"] == 0.8
    assert en["pct_frag_docs"] == 1.0
    de = out["de"]
    assert de["fertility"] == 2.0 and de["pct_frag_docs"] == 1.0


def test_tokenizer_stats_trained_vocab_lowers_fertility(docs, spark):
    from crawler_spark.operators.bpe import tokenizer_stats

    labeled = docs.withColumn("source", F.lit("all"))
    raw = tokenizer_stats(bpe_encode(labeled, merges=[])).collect()[0]
    merges, _ = bpe_train(docs, n_merges=12)
    trained = tokenizer_stats(bpe_encode(labeled, merges)).collect()[0]
    assert trained["fertility"] < raw["fertility"]
    assert trained["bytes_per_token"] > raw["bytes_per_token"]
    # fully-merged words exist after training -> some doc may still be
    # fragmented, but never more than the raw encoding
    assert trained["pct_frag_docs"] <= raw["pct_frag_docs"]


def test_bpe_encode_and_stats_null_text(spark):
    from crawler_spark.operators.bpe import tokenizer_stats

    docs = spark.createDataFrame(
        [(0, "s", None), (1, "s", "ab")],
        "doc_id int, source string, text string",
    )
    enc = bpe_encode(docs, merges=[])
    rows = {r["doc_id"]: r for r in enc.collect()}
    # NULL text encodes to NOTHING — never to pieces of the string 'None'
    assert list(rows[0]["bpe_tokens"]) == [] and rows[0]["n_bpe_tokens"] == 0
    st = tokenizer_stats(enc).collect()[0]
    assert (st["n_docs"], st["n_words"], st["n_bpe_tokens"], st["n_bytes"]) \
        == (2, 1, 3, 2)
