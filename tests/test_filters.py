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
