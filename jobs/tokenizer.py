"""spark-submit entry point for BPE tokenizer training (and optional
corpus encoding) — the hand-off from curated corpus to trainer config.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/tokenizer.py \
        --input s3://bucket/curated/ \
        --output s3://bucket/tokenizer/ \
        --merges 32000 \
        [--sample-frac 0.01]      # deterministic hash-slice to train on
        [--min-pair-freq 2] [--text-col text --id-col doc_id] \
        [--encode s3://bucket/encoded/]  # also encode the full corpus

Locally: ``python jobs/tokenizer.py --input ... --output ... --merges 50``.

Writes ``{output}/merges/`` (rank, left, right — the tokenizer config)
and ``{output}/vocab/`` (subword, freq), optionally ``--encode``s the
whole input with the learned merges (adds ``bpe_tokens``/``n_bpe_tokens``),
and prints one JSON line of training stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    p = argparse.ArgumentParser(description="BPE tokenizer training")
    p.add_argument("--input", required=True, help="parquet of documents(id, text, ...)")
    p.add_argument("--output", required=True, help="directory for merges/ and vocab/")
    p.add_argument("--merges", type=int, required=True, help="max merge rules to learn")
    p.add_argument("--sample-frac", type=float, default=None,
                   help="train on a deterministic hash-slice of documents")
    p.add_argument("--min-pair-freq", type=int, default=2)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--encode", default=None, metavar="PATH",
                   help="also encode the FULL input corpus to this parquet")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.operators.bpe import bpe_encode, bpe_train, bpe_vocab
    from crawler_spark.session import build_session

    # NB: like the other jobs/ entry points, the session is NOT stopped
    # here — process exit handles standalone runs, and in-process tests
    # share one session across CLIs
    spark = build_session(app_name="crawler_spark_tokenizer")
    docs = spark.read.parquet(args.input)
    merges, syms = bpe_train(
        docs,
        n_merges=args.merges,
        text_col=args.text_col,
        id_col=args.id_col,
        sample_frac=args.sample_frac,
        min_pair_freq=args.min_pair_freq,
    )
    spark.createDataFrame(
        merges or [], "rank int, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "merges")
    )
    vocab = bpe_vocab(syms)
    vocab.write.mode("overwrite").parquet(os.path.join(args.output, "vocab"))
    stats = {
        "merges_learned": len(merges),
        "vocab_size": vocab.count(),
        "train_words": syms.count(),
    }
    if args.encode:
        enc = bpe_encode(
            docs, merges, text_col=args.text_col, id_col=args.id_col
        )
        enc.write.mode("overwrite").parquet(args.encode)
        stats["encoded_docs"], stats["encoded_tokens"] = (
            spark.read.parquet(args.encode)
            .agg(F.count("*"), F.sum("n_bpe_tokens"))
            .first()
        )
        stats["encoded_tokens"] = int(stats["encoded_tokens"] or 0)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
