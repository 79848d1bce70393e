"""spark-submit entry point: extraction-quality comparison report.

Scores corpus B ("candidate": a new extractor build, a cleanup pass, a
re-crawl snapshot) against corpus A ("reference") with the whole eval
family — token P/R/F1, ROUGE-2, corpus BLEU, corpus chrF2 — per group
(default: per source) plus an overall rollup, and prints ONE JSON
report. The regression gate a pipeline runs before swapping in a new
extraction variant: a token-F1 drop localizes WHICH sources broke, the
BLEU brevity penalty says "the new pass truncates", chrF catching what
token scores miss says "partial-word damage" (mojibake, PII masking
seams).

    spark-submit --py-files engine.zip jobs/evalcmp.py \
        --ref extracted_old.parquet --cand extracted_new.parquet \
        [--id-col doc_id] [--text-col text] [--group-col source] \
        [--out report.json]

Scale shape: the inner join on the id column is the only corpus-sized
exchange shared by all four metrics (the per-doc PRF scorers ride one
side-tagged explode each — see operators/text_eval.py); the report
collects one row per GROUP (hosts/sources — bounded by contract, same
stance as `curation_funnel`), never per document.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def build_report(spark, args) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark.operators.text_eval import (
        bleu_corpus,
        chrf_corpus,
        ngram_prf,
        prf_summary,
        token_prf,
    )

    idc, txt, grp = args.id_col, args.text_col, args.group_col
    ref = spark.read.parquet(args.ref).select(
        F.col(idc), *([F.col(grp)] if grp else []),
        F.col(txt).alias("truth"),
    )
    cand = spark.read.parquet(args.cand).select(
        F.col(idc), F.col(txt).alias("pred")
    )
    # inner join: score only ids present on both sides; report the
    # coverage counts so a silent id mismatch can't masquerade as quality
    pairs = ref.join(cand, idc).localCheckpoint(eager=False)
    n_ref, n_cand, n_pairs = ref.count(), cand.count(), pairs.count()

    gc = [grp] if grp else []

    def rollup(metric_df, keep):
        rows = metric_df.collect()
        out = {}
        for r in rows:
            key = r[grp] if grp else "_overall"
            out[str(key)] = {k: r[k] for k in keep}
        return out

    def prf_rollup(n):
        scored = (ngram_prf if n > 1 else token_prf)(
            pairs, "pred", "truth", **({"n": n} if n > 1 else {}),
            id_col=idc,
        )
        if grp:
            scored = scored.join(pairs.select(idc, grp), idc)
        return rollup(
            prf_summary(scored, by=grp),
            ["n_rows", "micro_precision", "micro_recall", "micro_f1",
             "macro_f1"],
        )

    report = {
        "ref": args.ref,
        "cand": args.cand,
        "n_ref": n_ref,
        "n_cand": n_cand,
        "n_scored_pairs": n_pairs,
        "group_col": grp,
        "token_prf": prf_rollup(1),
        "rouge2": prf_rollup(2),
        "bleu": rollup(
            bleu_corpus(pairs, "pred", "truth", group_cols=gc, id_col=idc),
            ["r_len", "h1", "p1", "p4", "bp", "bleu"],
        ),
        "chrf": rollup(
            chrf_corpus(pairs, "pred", "truth", group_cols=gc, id_col=idc),
            ["chrp", "chrr", "chrf"],
        ),
    }
    return report


def main() -> None:
    p = argparse.ArgumentParser(
        description="extraction-quality comparison: candidate vs reference"
    )
    p.add_argument("--ref", required=True,
                   help="reference parquet (id, text[, group])")
    p.add_argument("--cand", required=True,
                   help="candidate parquet (id, text)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="source",
                   help="per-group breakdown column on the reference side; "
                        "'' disables grouping")
    p.add_argument("--out", default=None, help="also write the JSON here")
    args = p.parse_args()
    if args.group_col == "":
        args.group_col = None

    from crawler_spark.session import build_session

    spark = build_session(app_name="crawler_spark_evalcmp")
    try:
        report = build_report(spark, args)
        line = json.dumps(report, sort_keys=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        print(line)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
