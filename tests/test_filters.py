"""Webtext quality-filter operators (`operators/filters.py`): Gopher
repetition features, C4 flags + line filter, PII redaction, domain
blocklist, corpus-wide line dedup.

Values in the repetition tests are hand-computed from the definitions in
the module docstrings; the DuckDB value-hash parity for the same operators
runs in the driver gate (`__spark_entry__`)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.filters import (
    c4_line_filter,
    c4_quality_flags,
    domain_blocklist,
    line_dedup_global,
    pii_redact,
    repetition_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat.\nthe cat sat.\nunique line here today ok.\nshort"),
        (1, "the cat sat.\nanother line entirely for doc one, fine.\nthe cat sat."),
        (2, ""),
        (3, "a b a b a b"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def _by_id(df, *cols):
    return {r["doc_id"]: tuple(r[c] for c in cols) for r in df.collect()}


class TestRepetitionFeatures:
    def test_hand_computed(self, docs):
        got = _by_id(
            repetition_features(docs),
            "dup_word_frac",
            "top_2gram_frac",
            "top_3gram_frac",
            "dup_line_frac",
            "dup_line_char_frac",
        )
        # doc 0: 12 tokens / 9 distinct; "the cat"x2 of 11 2-grams;
        # "the cat sat." x2 of 10 3-grams; 2 of 4 lines duplicated,
        # 24 of 55 line chars inside the duplicated pair.
        assert got[0] == (0.25, 0.181818, 0.2, 0.5, 0.436364)
        # doc 1: duplicate lines straddle a unique one (sorted-run pass
        # must still pair them): 2 of 3 lines, 24 of 64 chars.
        assert got[1][3:] == (0.666667, 0.375)
        # empty text: all zeros, not 1.0 (the 0/0 guard)
        assert got[2] == (0.0, 0.0, 0.0, 0.0, 0.0)
        # doc 3: one line, no dups at line level; "a b" 3x of 5 2-grams
        assert got[3] == (0.666667, 0.6, 0.5, 0.0, 0.0)

    def test_no_python_in_plan(self, docs):
        plan = repetition_features(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestC4:
    def test_flags(self, docs, spark):
        got = _by_id(
            c4_quality_flags(docs),
            "wc_ok",
            "mean_wlen_ok",
            "no_bad_substring",
            "terminal_punct_frac",
            "c4_keep",
        )
        assert got[0] == (False, True, True, 0.75, False)  # 12 words < 50
        assert got[2] == (False, False, True, 0.0, False)
        long_ok = spark.createDataFrame(
            [(9, " ".join("word%d." % i for i in range(60)))], "doc_id int, text string"
        )
        row = c4_quality_flags(long_ok).collect()[0]
        assert row["wc_ok"] and row["c4_keep"]

    def test_bad_substrings(self, spark):
        rows = [(0, "Lorem Ipsum dolor " * 20), (1, "code { margin: 0 } " * 20)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = _by_id(c4_quality_flags(df), "no_bad_substring", "c4_keep")
        assert got[0] == (False, False) and got[1] == (False, False)

    def test_line_filter(self, docs):
        got = _by_id(c4_line_filter(docs, min_words=4), "filtered_text")
        assert got[0] == ("unique line here today ok.",)
        assert got[1] == ("another line entirely for doc one, fine.",)
        assert got[2] == ("",) and got[3] == ("",)


class TestPiiRedact:
    def test_kinds_and_order(self, spark):
        rows = [
            (0, "mail bob.smith+x@ex-ample.co.uk or call 415-555-1234"),
            (1, "server at 10.0.255.7 and 999.1.1.1 edge"),
            (2, "clean"),
            (3, "a@b.io c@d.com 1.2.3.4 +1 212 555 0000"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = _by_id(pii_redact(df), "n_email", "n_ip", "n_phone", "redacted")
        assert got[0] == (1, 0, 1, "mail [EMAIL] or call [PHONE]")
        # the 999.1.1.1 is still redacted (pattern is shape-based, not
        # range-validating — standard for scrubbing, documented)
        assert got[1] == (0, 2, 0, "server at [IP] and [IP] edge")
        assert got[2] == (0, 0, 0, "clean")
        # digits consumed by [IP] are not re-counted as phone; the "+1 "
        # prefix survives the NANP-ish phone match
        assert got[3] == (2, 1, 1, "[EMAIL] [EMAIL] [IP] +1 [PHONE]")


class TestDomainBlocklist:
    @pytest.fixture(scope="class")
    def urls(self, spark):
        rows = [
            (0, "https://a.b.spam.com/x"),   # subdomain of blocked
            (1, "https://notspam.com/y"),    # suffix of the NAME, not a label match
            (2, "http://spam.com/"),         # exact
            (3, "https://ok.example.org/z"),
            (4, "https://spam.com.evil.io/p"),  # blocked name as a LABEL PREFIX only
        ]
        return spark.createDataFrame(rows, "id int, url string").cache()

    def test_label_boundary_semantics(self, urls):
        kept = sorted(r["id"] for r in domain_blocklist(urls, ["spam.com"]).collect())
        assert kept == [1, 3, 4]
        rejects = sorted(
            r["id"] for r in domain_blocklist(urls, ["spam.com"], keep_blocked=True).collect()
        )
        assert rejects == [0, 2]

    def test_broadcast_hash_join_plan(self, urls):
        plan = (
            domain_blocklist(urls, ["spam.com"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # candidate-equality join, never a nested-loop LIKE scan
        assert "BroadcastNestedLoop" not in plan

    def test_blocked_as_dataframe(self, urls, spark):
        b = spark.createDataFrame([("SPAM.com",)], "host string")  # case-folded
        kept = sorted(r["id"] for r in domain_blocklist(urls, b).collect())
        assert kept == [1, 3, 4]


class TestLineDedupGlobal:
    def test_first_wins_across_and_within(self, docs):
        got = _by_id(line_dedup_global(docs), "deduped_text")
        # doc 0 owns the first "the cat sat." (pos 0) and keeps ONE copy
        assert got[0] == ("the cat sat.\nunique line here today ok.\nshort",)
        # doc 1 loses both copies to doc 0
        assert got[1] == ("another line entirely for doc one, fine.",)
        assert got[2] == ("",)
        assert got[3] == ("a b a b a b",)

    def test_partition_invariance(self, docs):
        a = _by_id(line_dedup_global(docs), "deduped_text")
        b = _by_id(line_dedup_global(docs.repartition(7)), "deduped_text")
        assert a == b

    def test_every_line_survives_exactly_once(self, docs):
        out = line_dedup_global(docs)
        lines = (
            out.select(F.explode(F.split("deduped_text", "\n")).alias("l"))
            .filter(F.col("l") != "")
        )
        n, nd = lines.count(), lines.distinct().count()
        assert n == nd
        orig = (
            docs.select(F.explode(F.split("text", "\n")).alias("l"))
            .filter(F.col("l") != "").distinct().count()
        )
        assert nd == orig


# ---------------------------------------------------------------------------
# per-host boilerplate line removal
# ---------------------------------------------------------------------------

from crawler_spark.operators.filters import (
    host_boilerplate_lines,
    strip_host_boilerplate,
)


class TestHostBoilerplate:
    ROWS = [
        # host A (4 docs): "footer a" on all 4, "promo a" on 2 of 4,
        # "body N" unique per doc; one doc repeats the footer twice
        (1, "a", "body 1\nfooter a"),
        (2, "a", "body 2\nfooter a\npromo a"),
        (3, "a", "footer a\nbody 3\nfooter a\npromo a"),
        (4, "a", "body 4\nfooter a"),
        # host B (2 docs, below min_docs=3): shared line must NOT be
        # flagged even at 100%
        (5, "b", "footer b\nbody 5"),
        (6, "b", "footer b\nbody 6"),
    ]
    SCHEMA = "doc_id long, source string, text string"

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, self.SCHEMA)

    def test_template_lines_flagged(self, spark):
        bp = host_boilerplate_lines(
            self._df(spark), min_frac=0.5, min_docs=3
        ).collect()
        got = {(r["source"], r["line"]): (r["n_docs"], r["host_docs"])
               for r in bp}
        # footer a: 4/4 docs (the in-doc repeat counts once); promo a: 2/4
        assert got == {
            ("a", "footer a"): (4, 4),
            ("a", "promo a"): (2, 4),
        }
        fr = {r["line"]: r["doc_frac"] for r in bp}
        assert fr["footer a"] == 1.0 and fr["promo a"] == 0.5

    def test_min_docs_guards_tiny_hosts(self, spark):
        bp = host_boilerplate_lines(
            self._df(spark), min_frac=0.5, min_docs=3
        ).collect()
        assert not any(r["source"] == "b" for r in bp)

    def test_strip_removes_all_occurrences_in_position_order(self, spark):
        out = {
            r["doc_id"]: (r["stripped_text"], r["n_boilerplate_removed"])
            for r in strip_host_boilerplate(
                self._df(spark), min_frac=0.6, min_docs=3
            ).collect()
        }
        # min_frac=0.6: only "footer a" is boilerplate; both copies in
        # doc 3 are removed, survivor order is preserved
        assert out[1] == ("body 1", 1)
        assert out[2] == ("body 2\npromo a", 1)
        assert out[3] == ("body 3\npromo a", 2)
        assert out[4] == ("body 4", 1)
        assert out[5] == ("footer b\nbody 5", 0)
        assert out[6] == ("footer b\nbody 6", 0)

    def test_doc_losing_every_line_comes_back_empty(self, spark):
        rows = [(i, "h", "only line") for i in range(1, 5)]
        out = strip_host_boilerplate(
            spark.createDataFrame(rows, self.SCHEMA), min_frac=0.9, min_docs=3
        ).collect()
        assert all(r["stripped_text"] == "" for r in out)
        assert all(r["n_boilerplate_removed"] == 1 for r in out)

    def test_precomputed_table_reused(self, spark):
        df = self._df(spark)
        bp = host_boilerplate_lines(df, min_frac=0.6, min_docs=3)
        a = strip_host_boilerplate(df, boilerplate=bp).collect()
        b = strip_host_boilerplate(df, min_frac=0.6, min_docs=3).collect()
        key = lambda r: r["doc_id"]
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_partition_invariance(self, spark):
        df = self._df(spark)
        a = {r["doc_id"]: r["stripped_text"]
             for r in strip_host_boilerplate(
                 df.repartition(1), min_frac=0.5, min_docs=3).collect()}
        b = {r["doc_id"]: r["stripped_text"]
             for r in strip_host_boilerplate(
                 df.repartition(7), min_frac=0.5, min_docs=3).collect()}
        assert a == b

    def test_plan_is_jvm_only(self, spark):
        out = strip_host_boilerplate(self._df(spark), min_frac=0.5, min_docs=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# word blocklist (C4 bad-words gate)
# ---------------------------------------------------------------------------

from crawler_spark.operators.filters import word_blocklist


class TestWordBlocklist:
    ROWS = [
        (1, "the Quick brown fox"),          # 'quick' matches case-folded
        (2, "quick quick quick"),            # repeats count once (distinct)
        (3, "quicksand is not a bad word"),  # whole-token, not substring
        (4, "clean text here"),
        (5, ""),
    ]
    SCHEMA = "doc_id long, text string"
    WORDS = ["quick", "BAD", "  word  "]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, self.SCHEMA)

    def _expect(self):
        return {1: (1, False), 2: (1, False), 3: (2, False),
                4: (0, True), 5: (0, True)}

    def test_literal_path(self, spark):
        out = {r["doc_id"]: (r["n_bad_words"], r["blocklist_keep"])
               for r in word_blocklist(self._df(spark), self.WORDS).collect()}
        # doc 3 contains the blocklisted tokens 'bad' and 'word' -> 2;
        # 'quicksand' itself never matches 'quick' (whole-token rule)
        assert out == self._expect()

    def test_join_path_matches_literal(self, spark):
        df = self._df(spark)
        a = {r["doc_id"]: (r["n_bad_words"], r["blocklist_keep"])
             for r in word_blocklist(df, self.WORDS).collect()}
        b = {r["doc_id"]: (r["n_bad_words"], r["blocklist_keep"])
             for r in word_blocklist(
                 df, self.WORDS, max_literal_words=0).collect()}
        assert a == b == self._expect()

    def test_literal_path_has_no_shuffle_or_python(self, spark):
        out = word_blocklist(self._df(spark), self.WORDS)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_join_path_broadcasts(self, spark):
        out = word_blocklist(self._df(spark), self.WORDS, max_literal_words=0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_quote_escaping(self, spark):
        df = spark.createDataFrame([(1, "it's fine")], self.SCHEMA)
        out = word_blocklist(df, ["it's"]).collect()[0]
        assert out["n_bad_words"] == 1 and out["blocklist_keep"] is False


# ---------------------------------------------------------------------------
# Gopher line/symbol flags
# ---------------------------------------------------------------------------

from crawler_spark.operators.filters import gopher_line_flags


class TestGopherLineFlags:
    def test_hand_counts(self, spark):
        rows = [
            (1, "- one\n- two\nplain line ends...\ntext # with hash"),
            (2, ""),
            (3, "1234 5678 ++ --"),  # no alphabetic words
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in gopher_line_flags(df).collect()}

        r = got[1]
        assert r["bullet_line_frac"] == 0.5          # 2 of 4 lines
        assert r["ellipsis_line_frac"] == 0.25       # 1 of 4 lines
        # 11 tokens ('ends...' is one); '-','-','#' are non-alpha -> 8/11
        assert r["alpha_word_frac"] == round(8 / 11, 6)
        assert r["symbol_word_ratio"] == round(2 / 11, 6)  # one '#', one '...'
        assert r["mean_words_per_line"] == round(11 / 4, 6)

        r = got[2]  # empty: zero evidence, keep
        assert r["gopher_line_keep"] is True
        assert r["bullet_line_frac"] == 0.0

        r = got[3]
        assert r["alpha_word_frac"] == 0.0
        assert r["gopher_line_keep"] is False

    def test_thresholds(self, spark):
        bullets = "\n".join(["- b"] * 95 + ["plain"] * 5)
        ok = "\n".join(["regular prose line"] * 10)
        df = spark.createDataFrame(
            [(1, bullets), (2, ok)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["gopher_line_keep"]
               for r in gopher_line_flags(df).collect()}
        assert got == {1: False, 2: True}

    def test_zero_shuffle_jvm_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (gopher_line_flags(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# jobs/curate.py: --strip-boilerplate / --gopher-line / --word-blocklist
# ---------------------------------------------------------------------------

def test_curate_cli_new_filter_stages(spark, tmp_path, monkeypatch):
    import sys

    import jobs.curate as jc

    prose = ("solid prose with many varied words that passes every "
             "quality and language gate " * 4).strip()
    rows = []
    # host A: 4 docs sharing a footer line; doc 3 also contains a blocked
    # word; doc 4 is all bullets (gopher kill)
    for i in range(1, 5):
        # distinct bodies: curate's exact-dedup stage must not collapse
        # the survivors after the identical footer is stripped
        body = prose + f" variant number {i}"
        if i == 3:
            body = body + " forbiddenword"
        if i == 4:
            body = "\n".join(["- bullet"] * 20)
        rows.append((i, "a", body + "\nshared footer a"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    df.write.parquet(inp)
    blfile = tmp_path / "bad.txt"
    blfile.write_text("forbiddenword\n")

    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", out,
        "--min-quality", "0.0", "--langs", "en", "xx",
        "--strip-boilerplate", "0.9", "--boilerplate-min-docs", "3",
        "--gopher-line", "--word-blocklist", str(blfile),
    ])
    jc.main()
    got = spark.read.parquet(out)
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # doc 3 (blocked word) and doc 4 (bullet wall) die; 1 and 2 survive
    assert ids == [1, 2]
    # the shared footer was stripped from every survivor
    texts = [r["text"] for r in got.collect()]
    assert all("shared footer a" not in t for t in texts)
    assert all(t.startswith("solid prose") for t in texts)


def test_word_blocklist_backslash_word_is_inert(spark):
    # a hostile blocklist entry with a backslash must neither break the
    # literal expression nor match anything it shouldn't
    from crawler_spark.operators.filters import word_blocklist

    df = spark.createDataFrame(
        [(1, "path c:\\tmp here"), (2, "clean")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_bad_words"]
           for r in word_blocklist(df, ["c:\\tmp"]).collect()}
    assert out == {1: 1, 2: 0}


# ---------------------------------------------------------------------------
# URL word scoring (RefinedWeb App. G.1)
# ---------------------------------------------------------------------------

from crawler_spark.operators.filters import (  # noqa: E402
    url_blocklist_filter,
    url_word_score,
)

_UW_ROWS = [
    (1, "https://www.example.com/free-casino-poker/page1"),
    (2, "HTTP://Spam.xxx/CLASS-notes"),
    (3, "https://news.site.org/articles/2024"),
    (4, None),
    (5, "ftp://files.host/casino/casino"),  # repeated word counts once
]
_UW_TOKENS = [("casino", 2), ("poker", 1), ("ass", 3)]
_UW_SUBSTR = [("xxx", 5)]


def _uw_df(spark):
    return spark.createDataFrame(_UW_ROWS, "doc_id long, url string")


def test_url_word_score_token_vs_substring_semantics(spark):
    got = {
        r["doc_id"]: (
            r["url_token_score"], r["url_substr_score"], r["url_score"]
        )
        for r in url_word_score(
            _uw_df(spark), _UW_TOKENS, _UW_SUBSTR
        ).collect()
    }
    assert got == {
        1: (3, 0, 3),   # casino(2) + poker(1)
        2: (0, 5, 5),   # 'class' token must NOT fire 'ass'; xxx substring
        3: (0, 0, 0),
        4: (0, 0, 0),   # NULL url scores 0, row survives scoring
        5: (2, 0, 2),   # distinct tokens: 'casino' counts once
    }


def test_url_word_score_weight_dedup_and_case(spark):
    # duplicate word rows keep the max weight; matching is case-folded
    df = spark.createDataFrame(
        [(1, "https://A.B/CASINO")], "doc_id long, url string"
    )
    got = url_word_score(
        df, [("casino", 1), ("CASINO", 7)], []
    ).collect()[0]
    assert got["url_token_score"] == 7


def test_url_blocklist_filter_threshold_and_audit(spark):
    kept = url_blocklist_filter(
        _uw_df(spark), _UW_TOKENS, _UW_SUBSTR, threshold=2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]
    assert kept.columns == ["doc_id", "url"]  # original columns only
    blocked = url_blocklist_filter(
        _uw_df(spark), _UW_TOKENS, _UW_SUBSTR, threshold=2,
        keep_blocked=True,
    )
    assert sorted(r["doc_id"] for r in blocked.collect()) == [1, 2, 5]


def test_url_word_score_partition_invariance_and_broadcast_plan(spark):
    df = _uw_df(spark)
    a = sorted(map(tuple, url_word_score(df, _UW_TOKENS, _UW_SUBSTR).collect()))
    b = sorted(
        map(
            tuple,
            url_word_score(
                df.repartition(5, "url"), _UW_TOKENS, _UW_SUBSTR
            ).collect(),
        )
    )
    assert a == b
    plan = url_word_score(df, _UW_TOKENS, _UW_SUBSTR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # word table never shuffles the corpus
