"""Webtext quality-filter operators for training-data curation: Gopher-style
repetition features, C4-style heuristic flags + line filter, PII redaction,
domain blocklisting, and corpus-wide first-occurrence line dedup.

These are the filters a production pretraining pipeline runs between "crawled
pages" and "training-ready text" (the reference stops at relevance gating —
``/root/reference/crawler/ai_processor.py:236-268`` — so everything here is
scale-layer surface beyond the reference, like `operators/dedup.py`).

Scale notes, per operator:

- ``repetition_features`` / ``c4_quality_flags`` / ``pii_redact`` are pure
  column expressions (JVM codegen, zero Python, zero shuffle). The n-gram
  max-frequency is computed by sorting the per-document gram array and
  taking the longest equal-run with a single ``aggregate`` pass — O(L log L)
  per document, never the naive O(L²) count-each-gram scan.
- ``domain_blocklist`` never does a ``LIKE '%suffix'`` scan: each host
  explodes into its <=`_MAX_HOST_LABELS` dot-suffix candidates and the block
  decision is a hash anti-join on candidate equality — broadcastable for
  real-world blocklists (millions of hosts is still MBs), shuffle-joinable
  beyond that.
- ``line_dedup_global`` is the C4 corpus-wide "keep the first occurrence of
  every line" dedup. First-wins is resolved with ``groupBy(line).min(id,pos)``
  — partial (map-side) aggregation makes a corpus-common line skew-safe,
  unlike a window over ``partitionBy(line)`` which would funnel the hot line
  into one task. Reassembly groups by document (the natural key, uniform).

Every operator has an exact DuckDB oracle (see ``__spark_entry__.oracle_sql``)
except where noted in the gate.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import tokens_expr

# Hosts have bounded label depth in practice; cap the suffix-candidate
# explosion so a hostile 1000-dot host cannot amplify rows.
_MAX_HOST_LABELS = 10


def _nonempty_tokens(text_col: str) -> str:
    """Whitespace tokens with empties dropped (''.split semantics parity)."""
    return f"filter({tokens_expr(text_col)}, t -> t <> '')"


def _max_run_expr(sorted_arr: str) -> str:
    """Longest run of equal adjacent elements in a sorted array (= max
    frequency of any element), one aggregate pass with a struct accumulator."""
    step_run = "CASE WHEN acc.prev <=> g THEN acc.run + 1 ELSE 1 END"
    return (
        f"aggregate(array_sort({sorted_arr}), "
        "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        f"(acc, g) -> named_struct('prev', g, 'run', {step_run}, "
        f"'best', greatest(acc.best, {step_run})), "
        "acc -> acc.best)"
    )


def _grams_expr(toks: str, n: int) -> str:
    """Word n-grams (n>=2) as array<string>, via zip_with over shifted slices."""
    assert n >= 2
    sz = f"greatest(size({toks}) - {n - 1}, 0)"
    out = f"slice({toks}, 1, {sz})"
    for i in range(1, n):
        out = f"zip_with({out}, slice({toks}, {i + 1}, {sz}), (a, b) -> concat(a, ' ', b))"
    return out


def repetition_features(
    df: DataFrame, text_col: str = "text", line_delim: str = "\n"
) -> DataFrame:
    """Gopher-style repetition features, all per-document column math:

    - ``dup_word_frac``: 1 - distinct_words/words (0 for empty text)
    - ``top_2gram_frac`` / ``top_3gram_frac``: occurrence fraction of the
      most frequent word 2-/3-gram (0 when no grams)
    - ``dup_line_frac``: fraction of lines that are repeats of an earlier line
    - ``dup_line_char_frac``: fraction of line characters inside duplicated
      lines (every copy of a line occurring >1 times counts)

    Repeated-document detection is `dedup.py`'s job; these catch the
    *within*-document repetition (boilerplate, scraped nav loops, keyword
    stuffing) that document-level dedup cannot see.
    """
    toks = _nonempty_tokens(text_col)
    lines = f"filter(split({text_col}, '{line_delim}'), l -> l <> '')"

    def frac(num: str, den: str) -> Column:
        return F.expr(f"round({num} / greatest({den}, 1), 6)")

    g2, g3 = _grams_expr(toks, 2), _grams_expr(toks, 3)
    # single sorted pass: count duplicated lines and their characters
    # (all members of an equal-run after the first add length+1 copies)
    dup_line_stats = (
        f"aggregate(array_sort({lines}), "
        "named_struct('prev', cast(null as string), 'run', 0, 'dup_n', 0, 'dup_chars', 0), "
        "(acc, l) -> named_struct("
        "'prev', l, "
        "'run', CASE WHEN acc.prev <=> l THEN acc.run + 1 ELSE 1 END, "
        "'dup_n', acc.dup_n + CASE WHEN acc.prev <=> l THEN (CASE WHEN acc.run = 1 THEN 2 ELSE 1 END) ELSE 0 END, "
        "'dup_chars', acc.dup_chars + CASE WHEN acc.prev <=> l THEN (CASE WHEN acc.run = 1 THEN 2 ELSE 1 END) * length(l) ELSE 0 END), "
        "acc -> named_struct('dup_n', acc.dup_n, 'dup_chars', acc.dup_chars))"
    )
    total_line_chars = f"aggregate({lines}, 0, (acc, l) -> acc + length(l))"
    return (
        df.withColumn(
            "dup_word_frac",
            F.expr(
                f"CASE WHEN size({toks}) = 0 THEN cast(0.0 as double) "
                f"ELSE round(1.0 - size(array_distinct({toks})) / size({toks}), 6) END"
            ),
        )
        .withColumn("top_2gram_frac", frac(_max_run_expr(g2), f"size({g2})"))
        .withColumn("top_3gram_frac", frac(_max_run_expr(g3), f"size({g3})"))
        .withColumn("_dls", F.expr(dup_line_stats))
        .withColumn("dup_line_frac", frac("_dls.dup_n", f"size({lines})"))
        .withColumn("dup_line_char_frac", frac("_dls.dup_chars", total_line_chars))
        .drop("_dls")
    )


# C4's document-level gates (the line filter below is separate):
_C4_MIN_WORDS = 50
_C4_MAX_WORDS = 100_000
_C4_BAD_SUBSTRINGS = ("lorem ipsum", "{")


def c4_quality_flags(
    df: DataFrame, text_col: str = "text", line_delim: str = "\n"
) -> DataFrame:
    """C4-style heuristic flags per document, plus the conjunction ``c4_keep``.

    - ``wc_ok``: word count in [{min},{max}]
    - ``mean_wlen_ok``: mean word length in [3,10]
    - ``no_bad_substring``: no 'lorem ipsum' (case-insensitive) and no curly
      brace (C4 drops pages with ``{{`` — usually leaked code/templates)
    - ``terminal_punct_frac``: fraction of lines ending in terminal
      punctuation — the document-level signal for the line filter below

    The composite keeps the flags as columns (a real pipeline samples and
    audits the rejects; a bare boolean would hide why a page died).
    """
    toks = _nonempty_tokens(text_col)
    lines = f"filter(split({text_col}, '{line_delim}'), l -> l <> '')"
    wc = f"size({toks})"
    mean_wlen = f"(aggregate({toks}, 0, (acc, t) -> acc + length(t)) / greatest({wc}, 1))"
    bad = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in _C4_BAD_SUBSTRINGS
    )
    term = f"size(filter({lines}, l -> l rlike '[.!?\"]$'))"
    return (
        df.withColumn(
            "wc_ok",
            F.expr(f"{wc} BETWEEN {_C4_MIN_WORDS} AND {_C4_MAX_WORDS}"),
        )
        .withColumn("mean_wlen_ok", F.expr(f"{mean_wlen} BETWEEN 3 AND 10"))
        .withColumn("no_bad_substring", F.expr(f"NOT ({bad})"))
        .withColumn(
            "terminal_punct_frac",
            F.expr(f"round({term} / greatest(size({lines}), 1), 6)"),
        )
        .withColumn(
            "c4_keep", F.expr("wc_ok AND mean_wlen_ok AND no_bad_substring")
        )
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "filtered_text",
    min_words: int = 5,
    line_delim: str = "\n",
) -> DataFrame:
    """C4's line-level clean: keep only lines with >= ``min_words`` words that
    end in terminal punctuation; rejoin survivors. Pure per-row expression."""
    line_toks = "filter(split(lower(trim(l)), '\\\\s+'), t -> t <> '')"
    keep = f"l -> size({line_toks}) >= {min_words} AND trim(l) rlike '[.!?\"]$'"
    return df.withColumn(
        out_col,
        F.expr(
            f"array_join(filter(split({text_col}, '{line_delim}'), {keep}), '{line_delim}')"
        ),
    )


# Redaction order matters and is part of the contract: emails first (their
# local parts can contain digit runs), then IPs, then phone-like runs over
# the already-redacted text. Counts are measured at the same stage their
# pattern is applied, so a digit run consumed by [IP] is never double-counted
# as a phone.
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d{1,3}[- .]\d{3}[- .]\d{4}", "[PHONE]"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-like numbers to typed tokens,
    with per-type match counts (``n_email``, ``n_ip``, ``n_phone``).

    Patterns are deliberately RE2-compatible (no backrefs, no lookaround) so
    the DuckDB oracle runs the byte-identical regex; Java and RE2 agree on
    every construct used here.
    """
    cur = F.col(text_col)
    out = df
    for name, pat, token in _PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
    return out.withColumn(out_col, cur)


_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def host_expr(url_col: str = "url") -> str:
    """SQL fragment: lowercased host part of a URL (scheme://host/...)."""
    return f"lower(regexp_extract({url_col}, '{_HOST_RE}', 1))"


def host_of(url_col: str = "url") -> Column:
    return F.expr(host_expr(url_col))


def domain_blocklist(
    df: DataFrame,
    blocked: DataFrame | Sequence[str],
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop rows whose URL host is a blocked host OR a subdomain of one.

    ``blocked`` is a DataFrame with a ``host`` column (or a Python list).
    Instead of a ``host LIKE '%.blocked'`` scan (unindexable, O(rows ×
    blocklist)), each host explodes into its dot-suffix candidates
    (``a.b.spam.com`` -> [a.b.spam.com, b.spam.com, spam.com, com]) and
    membership is a plain equality semi-join — hash-joinable, broadcastable,
    and partition-prunable. Candidates are capped at ``_MAX_HOST_LABELS``
    labels. ``keep_blocked=True`` inverts the filter (returns the rejects,
    for audit sampling).
    """
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(h,) for h in blocked], "host string"
        )
    blocked = blocked.select(F.lower("host").alias("_bad_host")).distinct()

    parts = f"slice(split({host_expr(url_col)}, '\\\\.'), 1, {_MAX_HOST_LABELS})"
    cands = (
        f"transform(sequence(1, size({parts})), "
        f"i -> array_join(slice({parts}, i, size({parts}) - i + 1), '.'))"
    )
    with_c = df.withColumn("_host_cands", F.expr(cands))
    exploded = with_c.withColumn("_cand", F.explode("_host_cands"))
    hits = (
        exploded.join(
            F.broadcast(blocked), exploded["_cand"] == blocked["_bad_host"], "inner"
        )
        .select(*df.columns)
        .distinct()
    )
    if keep_blocked:
        return hits
    return df.join(hits.select(*df.columns), df.columns, "left_anti")


def line_dedup_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "deduped_text",
    line_delim: str = "\n",
) -> DataFrame:
    """Corpus-wide first-occurrence line dedup (the C4 three-sentence rule,
    generalized to lines): every distinct line survives exactly once, in the
    document where it first appears (smallest ``(id, pos)``), at its original
    position; later copies — across documents or within one — are removed.

    First-wins is a ``groupBy(line).min(struct(id, pos))`` — partial
    aggregation combines hot lines map-side, so a line appearing in half the
    corpus costs one row per input partition at the shuffle, not a
    single-task funnel. Reassembly sorts each survivor set by position with
    ``sort_array`` inside the per-document aggregate (no second window).
    Documents that lose every line come back with an empty string.
    """
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), line_delim)).alias("_pos", "_line"),
        )
        .filter(F.col("_line") != "")
    )
    firsts = lines.groupBy("_line").agg(
        F.min(F.struct("_id", "_pos")).alias("_first")
    )
    kept = (
        lines.join(firsts, "_line")
        .filter((F.col("_id") == F.col("_first._id")) & (F.col("_pos") == F.col("_first._pos")))
        .select("_id", "_pos", "_line")
    )
    rebuilt = kept.groupBy("_id").agg(
        F.expr(
            f"array_join(transform(sort_array(collect_list(struct(_pos, _line))), s -> s._line), '{line_delim}')"
        ).alias(out_col)
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .drop("_id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
    )


def host_boilerplate_lines(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 3,
    line_delim: str = "\n",
) -> DataFrame:
    """Per-host template lines: every line that appears in at least
    ``min_frac`` of a host's documents, for hosts with at least
    ``min_docs`` documents — the nav/footer/cookie-banner boilerplate a
    site template stamps onto every page. The corpus-wide first-wins rule
    (:func:`line_dedup_global`) keeps exactly one copy of such a line
    somewhere; this operator identifies the line itself so it can be
    stripped everywhere (the CCNet/RefinedWeb-style per-source template
    cleanup — boilerplate is a property of the HOST, reference-free text
    quality scores cannot see it).

    Returns ``(host, line, n_docs, host_docs, doc_frac)`` with ``n_docs``
    the distinct-document count (a line repeated inside one page counts
    once — template detection is about breadth, not volume).

    Scale shape: one posexplode + a distinct on ``(host, line, id)``
    (partial aggregation collapses a host's repeats map-side), one
    map-side-combined count to the (host, line)-sized table, and one
    broadcast-friendly join against the host-count-sized totals. The
    output is thresholded, so downstream joins see only true template
    lines, not the corpus's line vocabulary.
    """
    lines = (
        df.select(
            F.col(host_col).alias("_host"),
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), line_delim)).alias("_line"),
        )
        .filter(F.col("_line") != "")
        .distinct()
    )
    per_line = lines.groupBy("_host", "_line").agg(
        F.count("*").alias("n_docs")
    )
    host_docs = df.groupBy(F.col(host_col).alias("_host")).agg(
        F.countDistinct(id_col).alias("host_docs")
    )
    return (
        per_line.join(host_docs, "_host")
        .filter(
            (F.col("host_docs") >= int(min_docs))
            & (F.col("n_docs") / F.col("host_docs") >= float(min_frac))
        )
        .select(
            F.col("_host").alias(host_col),
            F.col("_line").alias("line"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("host_docs").cast("bigint").alias("host_docs"),
            F.round(F.col("n_docs") / F.col("host_docs"), 6).alias(
                "doc_frac"
            ),
        )
    )


def strip_host_boilerplate(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "stripped_text",
    min_frac: float = 0.5,
    min_docs: int = 3,
    line_delim: str = "\n",
    boilerplate: Optional[DataFrame] = None,
) -> DataFrame:
    """Remove every per-host boilerplate line (all occurrences) from each
    document and reassemble the survivors in original position order.
    Adds ``out_col`` plus ``n_boilerplate_removed`` (line occurrences
    dropped; empty lines are collapsed, matching
    :func:`line_dedup_global`'s convention). Pass a precomputed
    ``boilerplate`` frame (from :func:`host_boilerplate_lines`, possibly
    persisted across runs) to skip recomputation — the two-pass shape a
    production pipeline uses: mine templates once per crawl wave, strip on
    every read.

    The boilerplate join is an equi-join on ``(host, line)`` against the
    thresholded template table — template-lines-sized, broadcastable in
    practice, never the corpus line vocabulary.
    """
    bp = (
        boilerplate
        if boilerplate is not None
        else host_boilerplate_lines(
            df,
            host_col=host_col,
            id_col=id_col,
            text_col=text_col,
            min_frac=min_frac,
            min_docs=min_docs,
            line_delim=line_delim,
        )
    )
    bp_set = bp.select(
        F.col(host_col).alias("_host"), F.col("line").alias("_line")
    ).distinct()
    lines = (
        df.select(
            F.col(host_col).alias("_host"),
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), line_delim)).alias(
                "_pos", "_line"
            ),
        )
        .filter(F.col("_line") != "")
    )
    marked = lines.join(
        bp_set.withColumn("_bp", F.lit(1)), ["_host", "_line"], "left"
    )
    kept = marked.filter(F.col("_bp").isNull()).select("_id", "_pos", "_line")
    removed = (
        marked.filter(F.col("_bp").isNotNull())
        .groupBy("_id")
        .agg(F.count("*").alias("n_boilerplate_removed"))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(_pos, _line))),"
            f" s -> s._line), '{line_delim}')"
        ).alias(out_col)
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .drop("_id")
        .join(removed, df[id_col] == removed["_id"], "left")
        .drop("_id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn(
            "n_boilerplate_removed",
            F.coalesce(F.col("n_boilerplate_removed"), F.lit(0)).cast(
                "bigint"
            ),
        )
    )


def word_blocklist(
    df: DataFrame,
    words: Sequence[str],
    text_col: str = "text",
    max_literal_words: int = 1000,
) -> DataFrame:
    """C4's word-blocklist gate (the "bad words" filter): flag documents
    containing any blocklisted WORD — whole-token match on lowercased
    whitespace tokens, not substring (C4 drops on word membership;
    substring matching is the classic Scunthorpe false-positive).

    Adds ``n_bad_words`` (distinct blocklisted words present) and
    ``blocklist_keep`` (none present). Distinct-word counting is
    deliberate — the gate is membership, and distinct counts make the
    column identical whichever execution path runs.

    Two execution paths, same output:
    - blocklists up to ``max_literal_words`` (the real-world case: the
      canonical English list is ~400 entries) become a literal array and
      the check is ``size(array_intersect(tokens, lit))`` — pure
      per-row JVM codegen, ZERO shuffle, zero join;
    - larger lists explode distinct document tokens and broadcast-join
      the blocklist (blocklists are MBs at worst — the same stance as
      ``domain_blocklist``), then re-join counts back by a generated
      row key.
    """
    normalized = sorted({w.strip().lower() for w in words if w and w.strip()})
    toks = f"array_distinct(filter({tokens_expr(text_col)}, t -> t <> ''))"
    if len(normalized) <= int(max_literal_words):
        lit = "array(" + ", ".join(
            "'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for w in normalized
        ) + ")"
        return df.withColumn(
            "n_bad_words",
            F.expr(f"size(array_intersect({toks}, {lit}))").cast("bigint"),
        ).withColumn("blocklist_keep", F.expr("n_bad_words = 0"))

    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(w,) for w in normalized], "bad string"
    ).select(F.col("bad").alias("_bad"))
    keyed = df.withColumn("_wb_key", F.monotonically_increasing_id())
    hits = (
        keyed.select("_wb_key", F.explode(F.expr(toks)).alias("_tok"))
        .join(F.broadcast(bl), F.col("_tok") == F.col("_bad"))
        .groupBy("_wb_key")
        .agg(F.count("*").alias("n_bad_words"))
    )
    return (
        keyed.join(hits, "_wb_key", "left")
        .withColumn(
            "n_bad_words",
            F.coalesce("n_bad_words", F.lit(0)).cast("bigint"),
        )
        .withColumn("blocklist_keep", F.expr("n_bad_words = 0"))
        .drop("_wb_key")
    )


# Gopher's published line/symbol thresholds (Rae et al. 2021, Table A1):
_GOPHER_MAX_BULLET = 0.90
_GOPHER_MAX_ELLIPSIS = 0.30
_GOPHER_MIN_ALPHA = 0.80
_GOPHER_MAX_SYMBOL = 0.10


def gopher_line_flags(
    df: DataFrame, text_col: str = "text", line_delim: str = "\n"
) -> DataFrame:
    """The Gopher line/symbol heuristics `repetition_features` does not
    cover (Rae et al. 2021, App. A1.1) — all pure per-document column
    math, zero shuffle:

    - ``bullet_line_frac``: lines starting with a bullet (``-``, ``*``,
      ``•``); Gopher drops docs where > 90% of lines are bullets
    - ``ellipsis_line_frac``: lines ending in ``...`` / ``…``; drop > 30%
    - ``alpha_word_frac``: words containing at least one alphabetic
      character; drop < 80%
    - ``symbol_word_ratio``: (``#`` chars + ``...`` occurrences) / words;
      drop > 10%
    - ``mean_words_per_line`` (diagnostic, no Gopher threshold)
    - ``gopher_line_keep``: the conjunction at the published thresholds

    Fractions are ``round(int / int, 6)`` from exact integer counts (the
    repo-wide parity contract). Empty documents keep (no evidence)."""
    toks = _nonempty_tokens(text_col)
    lines = f"filter(split({text_col}, '{line_delim}'), l -> l <> '')"
    n_lines = f"size({lines})"
    n_words = f"size({toks})"
    bullet = f"size(filter({lines}, l -> l rlike '^\\\\s*[-*•]'))"
    ellipsis = f"size(filter({lines}, l -> l rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$'))"
    alpha = f"size(filter({toks}, t -> t rlike '[a-zA-Z]'))"
    hashes = f"(length({text_col}) - length(replace({text_col}, '#', '')))"
    dots = (
        f"((length({text_col}) - length(replace({text_col}, '...', ''))) div 3)"
    )

    def frac(num: str, den: str) -> Column:
        return F.expr(f"round({num} / greatest({den}, 1), 6)")

    return (
        df.withColumn("bullet_line_frac", frac(bullet, n_lines))
        .withColumn("ellipsis_line_frac", frac(ellipsis, n_lines))
        .withColumn("alpha_word_frac", frac(alpha, n_words))
        .withColumn("symbol_word_ratio", frac(f"({hashes} + {dots})", n_words))
        .withColumn("mean_words_per_line", frac(n_words, n_lines))
        .withColumn(
            "gopher_line_keep",
            F.expr(
                f"{n_words} = 0 OR ("
                f"bullet_line_frac <= {_GOPHER_MAX_BULLET} "
                f"AND ellipsis_line_frac <= {_GOPHER_MAX_ELLIPSIS} "
                f"AND alpha_word_frac >= {_GOPHER_MIN_ALPHA} "
                f"AND symbol_word_ratio <= {_GOPHER_MAX_SYMBOL})"
            ),
        )
    )


def doc_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "deduped_text",
    line_delim: str = "\n",
) -> DataFrame:
    """Within-document first-occurrence line dedup — the CCNet-style
    per-page cleanup that strips repeated nav/footer lines a template
    stamps several times into ONE page, before any corpus-level pass
    (``line_dedup_global`` / ``host_boilerplate_lines``) runs.

    Unlike those two, this needs no information outside the row, so it
    is a pure array rewrite: a line survives iff its index is the
    line's first occurrence in the document (``array_position`` is
    first-match by definition); blank lines are structural, not
    content, and are always kept (paragraph breaks survive). Zero
    shuffle, zero Python, whole-stage codegen — O(L²) string compares
    per document, bounded by lines-per-page (~10²), not corpus size.

    Adds ``n_lines`` / ``n_kept_lines`` counters and ``out_col`` (the
    rebuilt text; NULL text stays NULL).
    """
    lines = f"split({text_col}, '{line_delim}')"
    kept = (
        f"filter({lines}, (l, i) -> trim(l) = '' "
        f"OR array_position({lines}, l) = i + 1)"
    )
    return (
        df.withColumn("n_lines", F.expr(f"cast(size({lines}) as bigint)"))
        .withColumn("n_kept_lines", F.expr(f"cast(size({kept}) as bigint)"))
        .withColumn(
            out_col, F.expr(f"array_join({kept}, '{line_delim}')")
        )
    )


# ---------------------------------------------------------------------------
# URL word scoring (RefinedWeb, Penedo et al. 2023, Appendix G.1)
# ---------------------------------------------------------------------------

#: scheme prefix stripped before any URL word matching
_URL_SCHEME_RE = r"^[a-z][a-z0-9+.\-]*://"


def _url_norm_expr(url_col: str) -> str:
    return f"regexp_replace(lower({url_col}), '{_URL_SCHEME_RE}', '')"


def _url_tokens_expr(url_col: str) -> str:
    """Distinct lowercase alphanumeric tokens of the scheme-stripped URL."""
    return (
        f"array_distinct(filter(split({_url_norm_expr(url_col)}, "
        f"'[^a-z0-9]+'), t -> t <> ''))"
    )


def url_word_score(
    df: DataFrame,
    token_words,
    substr_words: Sequence = (),
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Soft URL word scoring — the RefinedWeb URL filter's scoring half
    (Penedo et al. 2023, App. G.1: beyond the hard domain blocklist,
    URLs are scored against weighted word lists and rejected above a
    threshold). Adds three columns: ``url_token_score`` (sum of weights
    of list words that equal a distinct URL token — token matching so
    'ass' never fires inside 'class'), ``url_substr_score`` (sum of
    weights of high-severity terms appearing ANYWHERE in the
    scheme-stripped lowercased URL), and their sum ``url_score``.

    Weights are INTEGERS and scores exact BIGINT sums — no float
    accumulation order anywhere, so partitioning cannot change a score.

    Scale shape: ``token_words`` may be corpus-scale-large (UT1-style
    category lists run to thousands); it is a DataFrame (or list) joined
    BROADCAST against the exploded distinct-token rows (~tens per URL),
    then one groupBy(id) sum — never a per-row scan of the whole list.
    ``substr_words`` is a driver-held literal folded row-locally (zero
    shuffle) and is meant to stay small (tens of severe terms); it is
    deliberately NOT a join because substring match cannot be
    equi-joined without an n-gram explosion.
    """
    spark = df.sparkSession
    if not isinstance(token_words, DataFrame):
        token_words = spark.createDataFrame(
            [(str(w), int(wt)) for w, wt in token_words],
            "word string, weight int",
        )
    words = (
        token_words.select(
            F.lower("word").alias("_uw_word"),
            F.col("weight").cast("bigint").alias("_uw_wt"),
        )
        .groupBy("_uw_word")
        .agg(F.max("_uw_wt").alias("_uw_wt"))
    )
    toks = df.select(
        F.col(id_col).alias("_uid"),
        F.explode(F.expr(_url_tokens_expr(url_col))).alias("_uw_word"),
    )
    tok_scores = (
        toks.join(F.broadcast(words), "_uw_word")
        .groupBy("_uid")
        .agg(F.sum("_uw_wt").alias("_uw_tok_score"))
    )
    sub = sorted((str(w).lower(), int(wt)) for w, wt in substr_words)
    if sub:
        lit = ", ".join(
            f"named_struct('w', {quote_sql(w)}, 'wt', {wt}L)" for w, wt in sub
        )
        sub_expr = (
            f"aggregate(array({lit}), 0L, (acc, s) -> acc + "
            f"IF(contains({_url_norm_expr(url_col)}, s.w), s.wt, 0L))"
        )
    else:
        sub_expr = "0L"
    out = (
        df.join(
            tok_scores, df[id_col] == tok_scores["_uid"], "left"
        )
        .drop("_uid")
        .withColumn(
            "url_token_score",
            F.coalesce(F.col("_uw_tok_score"), F.lit(0)).cast("bigint"),
        )
        .drop("_uw_tok_score")
        .withColumn("url_substr_score", F.expr(sub_expr).cast("bigint"))
        .withColumn(
            "url_score",
            (F.col("url_token_score") + F.col("url_substr_score")).cast(
                "bigint"
            ),
        )
    )
    return out


def quote_sql(s: str) -> str:
    """Single-quote a literal for an inline SQL expression."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def url_blocklist_filter(
    df: DataFrame,
    token_words,
    substr_words: Sequence = (),
    threshold: int = 2,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Reject rows whose :func:`url_word_score` total reaches
    ``threshold`` (RefinedWeb's rule); ``keep_blocked=True`` returns
    the rejects instead, for audit sampling. Original columns only."""
    scored = url_word_score(
        df, token_words, substr_words, id_col=id_col, url_col=url_col
    )
    cond = F.col("url_score") >= F.lit(int(threshold))
    kept = scored.where(cond if keep_blocked else ~cond)
    return kept.select(*df.columns)
