"""Cross-wave incremental near-dup against a persisted signature store
(`dedup.incremental_near_dups`): per-wave probing must reconstruct exactly
the batch result over the union of waves."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    estimate_jaccard,
    incremental_near_dups,
    minhash_lsh_pairs,
    minhash_signatures,
)

N_HASHES, BANDS, K = 16, 4, 3


@pytest.fixture(scope="module")
def waves(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(30):
        if i % 5 == 0:
            text = base  # exact family: near-dups across waves
        elif i % 5 == 1:
            text = base + f" extra token{i}"  # near-dup of the family
        else:
            text = f"totally unrelated document number {i} " + " ".join(
                f"w{i}_{j}" for j in range(12)
            )
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id int, text string").cache()
    return df.filter("doc_id < 15").cache(), df.filter("doc_id >= 15").cache(), df


def _batch_pairs(df, threshold):
    """Batch comparator: full-corpus LSH candidates + the same
    signature-estimated Jaccard filter."""
    cand = minhash_lsh_pairs(
        df, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    sigs = minhash_signatures(df, num_hashes=N_HASHES, shingle_k=K)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sig_b"))
    return {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.expr(estimate_jaccard(N_HASHES)))
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_a", "id_b", "est_jaccard")
        .collect()
    }


def _pairs_map(pairs_df):
    return {
        (r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs_df.collect()
    }


def test_wave_union_equals_batch(waves):
    w1, w2, full = waves
    p1, store = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    p2, store2 = incremental_near_dups(
        w2, store, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    got = {**_pairs_map(p1), **_pairs_map(p2)}
    assert got == _batch_pairs(full, 0.5)
    assert store2.count() == 30  # merged store covers both waves
    # waves are disjoint, so the two incremental pair sets are too
    assert not set(_pairs_map(p1)) & set(_pairs_map(p2))


def test_second_wave_finds_cross_wave_pairs(waves):
    w1, w2, _ = waves
    _, store = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    p2, _ = incremental_near_dups(
        w2, store, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    got = set(_pairs_map(p2))
    # doc 0 (wave 1) and doc 15 (wave 2) are verbatim copies
    assert (0, 15) in got
    # every reported pair touches the new wave (the store never self-joins)
    assert all(b >= 15 for _, b in got)


def test_exact_copies_estimate_one(waves):
    w1, _, _ = waves
    p1, _ = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    m = _pairs_map(p1)
    assert m[(0, 5)] == 1.0 and m[(0, 10)] == 1.0  # identical texts
    assert all(a < b for a, b in m)


def test_partition_invariance(waves):
    w1, w2, _ = waves
    _, store = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    a, _ = incremental_near_dups(
        w2.repartition(1), store, num_hashes=N_HASHES, bands=BANDS, shingle_k=K
    )
    b, _ = incremental_near_dups(
        w2.repartition(7, "doc_id"),
        store.repartition(3, "doc_id"),
        num_hashes=N_HASHES,
        bands=BANDS,
        shingle_k=K,
    )
    assert _pairs_map(a) == _pairs_map(b)


def test_threshold_filters(waves):
    w1, _, _ = waves
    loose, _ = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K, threshold=0.0
    )
    tight, _ = incremental_near_dups(
        w1, None, num_hashes=N_HASHES, bands=BANDS, shingle_k=K, threshold=1.0
    )
    lm, tm = _pairs_map(loose), _pairs_map(tight)
    assert set(tm) <= set(lm)
    assert all(v == 1.0 for v in tm.values())
    assert set(tm) == {k for k, v in lm.items() if v == 1.0}


def test_streaming_incremental_dedup_matches_batch(spark, waves, tmp_path):
    """incremental_dedup_stream: per-micro-batch probing of the signature
    store reconstructs the batch pair set; the store accumulates one
    batch_id partition per micro-batch."""
    from crawler_spark.streaming import incremental_dedup_stream

    w1, w2, full = waves
    docs_dir = str(tmp_path / "docs")
    w1.coalesce(1).write.mode("append").parquet(docs_dir)

    kw = dict(
        store_dir=str(tmp_path / "store"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_hashes=N_HASHES,
        bands=BANDS,
        shingle_k=K,
        max_files_per_trigger=1,
    )
    q = incremental_dedup_stream(spark, docs_dir, **kw)
    q.awaitTermination()
    # second drop arrives; restart drains only the new file (exactly-once)
    w2.coalesce(1).write.mode("append").parquet(docs_dir)
    q = incremental_dedup_stream(spark, docs_dir, **kw)
    q.awaitTermination()

    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in spark.read.parquet(kw["pairs_dir"]).collect()
    }
    assert got == _batch_pairs(full, 0.5)
    store = spark.read.parquet(kw["store_dir"])
    assert store.count() == 30  # one signature per doc, no double-append
    assert store.select("batch_id").distinct().count() == 2
