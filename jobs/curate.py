"""spark-submit entry point for the training-data curation pipeline.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/curate.py \
        --input s3://bucket/documents/ \
        --output s3://bucket/curated/ \
        --min-quality 0.5 --langs en es \
        [--text-col text --id-col doc_id] \
        [--partition-by lang_pred] \
        [--min-source-quality 0.5 --max-source-dup 0.5]  # reputation pre-gate
        [--strip-dup-spans 8]   # Lee-et-al. duplicate n-gram span strip
        [--max-nll 4.0]         # CCNet-style corpus-LM perplexity cut
        [--ppl-keep head middle [--ppl-by lang] [--ppl-bins 4096]]
                                # CCNet head/middle/tail bucket gate
        [--nb-seed s3://bucket/seed/ --nb-buckets 4096]  # hashed-NB gate
        [--dsir-target s3://bucket/wiki/ --dsir-keep 1000000]  # DSIR top-k
        [--mirror-dedup 0.8]    # drop non-canonical mirror sources first

Locally: ``python jobs/curate.py --input ... --output ...``.

Runs the composed quality -> language -> exact-dedup dataflow
(crawler_spark.operators.curation) in one job — a single scan, a single
content-hash shuffle — writes the surviving rows, and prints the per-stage
funnel counters as one JSON line (the monitoring signal).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# Python UDF workers import the package too: local runs from any cwd need
# the repo on the workers' PYTHONPATH (clusters ship it via --py-files)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    p = argparse.ArgumentParser(description="Quality/language/dedup curation")
    p.add_argument("--input", required=True, help="parquet path of documents(id, text, ...)")
    p.add_argument("--output", required=True, help="parquet path for curated rows")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--langs", nargs="+", default=["en"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--partition-by", default=None,
                   help="optional output partition column (e.g. lang_pred)")
    p.add_argument("--min-source-quality", type=float, default=None,
                   help="drop whole sources below this mean quality "
                        "(reputation pre-gate, operators/curation.py)")
    p.add_argument("--max-source-dup", type=float, default=None,
                   help="drop whole sources above this exact-dup fraction")
    p.add_argument("--source-col", default="source")
    p.add_argument("--max-nll", type=float, default=None,
                   help="CCNet-style cut: drop docs whose corpus-bigram-LM "
                        "mean NLL exceeds this (operators/lm.py)")
    p.add_argument("--ppl-keep", nargs="+", default=None,
                   metavar="BUCKET",
                   help="CCNet head/middle/tail bucketing: keep only these "
                        "ppl_bucket labels (e.g. --ppl-keep head middle); "
                        "docs with no bigrams keep the 'unscored' label")
    p.add_argument("--ppl-by", default=None, metavar="COL",
                   help="bucket per this group column (CCNet buckets per "
                        "language); default: one corpus-wide group")
    p.add_argument("--ppl-bins", type=int, default=None, metavar="N",
                   help="use the approx histogram path with N bins instead "
                        "of exact ntile (defaults to 4096 when --ppl-by is "
                        "omitted — one corpus-wide group must never sort in "
                        "a single window task; pass --ppl-by for the exact "
                        "per-group path)")
    p.add_argument("--strip-dup-spans", type=int, default=None, metavar="N",
                   help="strip tokens covered by corpus-duplicated N-grams "
                        "before curation (Lee et al.; operators/dedup.py). "
                        "Surviving text keeps its original case; the one "
                        "normalization applied is whitespace collapse to "
                        "single spaces (detection is case-insensitive)")
    p.add_argument("--nb-seed", default=None, metavar="PATH",
                   help="parquet of labeled seed docs (text + 0/1 label "
                        "column): train a hashed NB classifier and keep "
                        "only docs it scores positive (operators/classify.py)")
    p.add_argument("--nb-label-col", default="label")
    p.add_argument("--nb-buckets", type=int, default=4096)
    p.add_argument("--dsir-target", default=None, metavar="PATH",
                   help="parquet of target-distribution docs: keep the "
                        "--dsir-keep most target-like survivors by DSIR "
                        "importance weight (Xie et al. 2023)")
    p.add_argument("--dsir-keep", type=int, default=None,
                   help="top-k kept under --dsir-target (required with it)")
    p.add_argument("--dsir-buckets", type=int, default=8192)
    p.add_argument("--mirror-dedup", type=float, default=None, metavar="J",
                   help="drop all docs of non-canonical mirror sources: "
                        "sources whose content-set Jaccard overlap with a "
                        "lexicographically-smaller source is >= J "
                        "(frontier/mirrors.py; runs before everything else "
                        "so downstream stages never see the aliases)")
    p.add_argument("--mirror-max-df", type=int, default=1000,
                   help="content keys on more than this many sources are "
                        "ignored when pairing mirrors (boilerplate cap)")
    p.add_argument("--containment-dedup", type=float, default=None,
                   metavar="C",
                   help="drop subset duplicates: for every pair whose "
                        "n-gram containment (inter / min size) is >= C, "
                        "the higher-id doc is dropped (min-id survivor, "
                        "the engine-wide dedup convention; "
                        "operators/dedup.ngram_containment_pairs). Catches "
                        "quotes/boilerplate-wrapped copies Jaccard misses "
                        "on size-mismatched pairs")
    p.add_argument("--containment-ngram", type=int, default=8,
                   help="shingle width for --containment-dedup")
    p.add_argument("--containment-max-df", type=int, default=1000,
                   help="hot-shingle cap for --containment-dedup")
    p.add_argument("--strip-boilerplate", type=float, default=None,
                   metavar="FRAC",
                   help="strip per-host template lines appearing in >= FRAC "
                        "of a host's docs (operators/filters."
                        "strip_host_boilerplate) before any scoring — "
                        "boilerplate is host evidence the per-doc gates "
                        "cannot see")
    p.add_argument("--boilerplate-min-docs", type=int, default=3,
                   help="hosts with fewer docs never flag boilerplate")
    p.add_argument("--gopher-line", action="store_true",
                   help="drop docs failing the Gopher line/symbol "
                        "thresholds (operators/filters.gopher_line_flags)")
    p.add_argument("--word-blocklist", default=None, metavar="PATH",
                   help="drop docs containing any word from this file "
                        "(one word per line; whole-token match — "
                        "operators/filters.word_blocklist)")
    p.add_argument("--temperature-mix", type=float, default=None,
                   metavar="ALPHA",
                   help="after curation, resample to --mix-budget tokens "
                        "with per-source budgets proportional to "
                        "c_source^ALPHA (operators/sampling."
                        "sample_temperature; 0.5 flattens the head)")
    p.add_argument("--mix-budget", type=int, default=None,
                   help="total token budget for --temperature-mix")
    p.add_argument("--data-card", default=None, metavar="PATH",
                   help="also write a markdown data card of the CURATED "
                        "corpus (sinks/datacard.py: volume, length "
                        "percentiles, language/source tables, dup stats)")
    args = p.parse_args()
    if (args.dsir_target is None) != (args.dsir_keep is None):
        p.error("--dsir-target and --dsir-keep must be given together")
    if (args.temperature_mix is None) != (args.mix_budget is None):
        p.error("--temperature-mix and --mix-budget must be given together")

    from crawler_spark.operators.curation import curate, curation_stats
    from crawler_spark.session import build_session

    spark = build_session(app_name="crawler_spark_curate")
    docs = spark.read.parquet(args.input)
    n_mirror_dropped = None
    if args.mirror_dedup is not None:
        from pyspark.sql import functions as F

        from crawler_spark.frontier.mirrors import (
            host_profiles,
            mirror_groups,
            mirror_pairs,
            noncanonical_hosts,
        )

        prof = host_profiles(
            docs, host_col=args.source_col, text_col=args.text_col
        )
        drop = noncanonical_hosts(
            mirror_groups(
                mirror_pairs(
                    prof,
                    min_jaccard=args.mirror_dedup,
                    max_df=args.mirror_max_df,
                )
            )
        ).withColumnRenamed("host", args.source_col)
        n_mirror_dropped = drop.count()  # host-count-sized, cheap
        docs = docs.join(F.broadcast(drop), args.source_col, "left_anti")
    if args.strip_boilerplate is not None:
        from crawler_spark.operators.filters import strip_host_boilerplate

        docs = (
            strip_host_boilerplate(
                docs,
                host_col=args.source_col,
                id_col=args.id_col,
                text_col=args.text_col,
                min_frac=args.strip_boilerplate,
                min_docs=args.boilerplate_min_docs,
            )
            .drop(args.text_col, "n_boilerplate_removed")
            .withColumnRenamed("stripped_text", args.text_col)
        )
    if args.gopher_line:
        from crawler_spark.operators.filters import gopher_line_flags

        docs = (
            gopher_line_flags(docs, text_col=args.text_col)
            .filter("gopher_line_keep")
            .drop(
                "bullet_line_frac",
                "ellipsis_line_frac",
                "alpha_word_frac",
                "symbol_word_ratio",
                "mean_words_per_line",
                "gopher_line_keep",
            )
        )
    if args.word_blocklist:
        from crawler_spark.operators.filters import word_blocklist

        with open(args.word_blocklist, encoding="utf-8") as fh:
            bad = [w.strip() for w in fh if w.strip()]
        docs = (
            word_blocklist(docs, bad, text_col=args.text_col)
            .filter("blocklist_keep")
            .drop("n_bad_words", "blocklist_keep")
        )
    if args.min_source_quality is not None or args.max_source_dup is not None:
        from crawler_spark.operators.curation import source_reputation_filter

        docs = source_reputation_filter(
            docs,
            min_mean_quality=args.min_source_quality or 0.0,
            max_dup_frac=(
                args.max_source_dup if args.max_source_dup is not None else 1.0
            ),
            source_col=args.source_col,
            text_col=args.text_col,
            id_col=args.id_col,
        ).drop("mean_quality", "exact_dup_frac")
    if args.strip_dup_spans:
        from crawler_spark.operators.dedup import strip_duplicate_spans

        stripped = strip_duplicate_spans(
            docs, n=args.strip_dup_spans,
            text_col=args.text_col, id_col=args.id_col,
        ).select(args.id_col, "kept_text")
        docs = (
            docs.drop(args.text_col)
            .join(stripped, args.id_col)
            .withColumnRenamed("kept_text", args.text_col)
        )
    n_contained_dropped = None
    if args.containment_dedup is not None:
        from pyspark.sql import functions as F

        from crawler_spark.operators.dedup import ngram_containment_pairs

        pairs = ngram_containment_pairs(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            shingle_k=args.containment_ngram,
            threshold=args.containment_dedup,
            max_df=args.containment_max_df,
        )
        drop = pairs.select(
            F.col("id_b").alias(args.id_col)
        ).distinct()
        n_contained_dropped = drop.count()
        docs = docs.join(drop, args.id_col, "left_anti")
    if args.max_nll is not None:
        from crawler_spark.operators.lm import perplexity_filter

        docs = perplexity_filter(
            docs, args.max_nll, text_col=args.text_col, id_col=args.id_col
        ).drop("n_bigrams", "sum_logp_q", "avg_nll")
    n_ppl = None
    if args.ppl_keep:
        from pyspark.sql import functions as F

        from crawler_spark.operators.lm import perplexity_buckets

        by = args.ppl_by
        d = docs
        bins = args.ppl_bins
        if by is None:
            # one corpus-wide group: the exact path would sort EVERYTHING
            # in a single ntile window task — default to the bounded
            # histogram path unless the caller explicitly sized it
            d = d.withColumn("_ppl_g", F.lit("all"))
            by = "_ppl_g"
            if bins is None:
                bins = 4096
        b = perplexity_buckets(
            d, by=by, n_buckets=3, text_col=args.text_col,
            id_col=args.id_col, approx_bins=bins,
        )
        docs = (
            b.filter(F.col("ppl_bucket").isin(list(args.ppl_keep)))
            .drop("bucket", "ppl_bucket", "n_bigrams", "sum_logp_q",
                  "avg_nll", "_ppl_g")
        )
        n_ppl = docs.count()
    curated = curate(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        text_col=args.text_col,
        id_col=args.id_col,
    )
    n_nb = n_dsir = None
    if args.nb_seed:
        from pyspark.sql import functions as F

        from crawler_spark.operators.classify import nb_score, nb_train

        model = nb_train(
            spark.read.parquet(args.nb_seed),
            n_buckets=args.nb_buckets,
            text_col=args.text_col,
            label_col=args.nb_label_col,
        )
        curated = (
            nb_score(curated, model, text_col=args.text_col,
                     id_col=args.id_col)
            .filter(F.col("nb_pred") == 1)
            .drop("n_feats", "sum_llr_q", "nb_margin", "nb_pred")
        )
        n_nb = curated.count()
    if args.dsir_target:
        from crawler_spark.operators.classify import dsir_topk

        curated = dsir_topk(
            curated,
            spark.read.parquet(args.dsir_target),
            args.dsir_keep,
            n_buckets=args.dsir_buckets,
            text_col=args.text_col,
            id_col=args.id_col,
        ).drop("n_feats", "sum_lw_q", "log_w", "avg_lw")
        n_dsir = curated.count()
    n_mixed = None
    if args.temperature_mix is not None:
        from crawler_spark.operators.sampling import sample_temperature

        curated = sample_temperature(
            curated,
            alpha=args.temperature_mix,
            token_budget=args.mix_budget,
            source_col=args.source_col,
            id_col=args.id_col,
            text_col=args.text_col,
        )
        n_mixed = curated.count()
    writer = curated.write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(args.partition_by)
    writer.parquet(args.output)

    row = curation_stats(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        text_col=args.text_col,
        id_col=args.id_col,
    ).collect()[0]
    funnel = {
        "n_input": row["n_input"],
        "n_quality": row["n_quality"],
        "n_lang": row["n_lang"],
        "n_deduped": row["n_deduped"],
        "output": args.output,
    }
    if n_mirror_dropped is not None:
        funnel["n_mirror_sources_dropped"] = n_mirror_dropped
    if n_contained_dropped is not None:
        funnel["n_contained_dropped"] = n_contained_dropped
    if n_mixed is not None:
        funnel["n_mixed"] = n_mixed
    if n_ppl is not None:
        funnel["n_ppl_kept"] = n_ppl
    if n_nb is not None:
        funnel["n_nb_kept"] = n_nb
    if n_dsir is not None:
        funnel["n_dsir_kept"] = n_dsir
    if args.data_card:
        from crawler_spark.sinks.datacard import write_data_card

        write_data_card(
            spark.read.parquet(args.output),
            args.data_card,
            name=os.path.basename(args.output.rstrip("/")) or "corpus",
            text_col=args.text_col,
            source_col=args.source_col,
            lang_col="lang_pred",
        )
        funnel["data_card"] = args.data_card
    print(json.dumps(funnel))


if __name__ == "__main__":
    main()
