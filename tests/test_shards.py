"""Token-balanced training-shard sink (`sinks/shards.py`): pure-Python
replay of the distributed prefix-sum assignment, balance bounds, partition
invariance, and the writer round-trip. DuckDB value-hash parity runs via
the gate entry (`shard_assign_docs`)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.sinks.shards import (
    shard_manifest,
    token_balanced_shards,
    write_shards,
)


def _pri(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _replay(rows, tokens_per_shard, groups):
    """rows: [(doc_id, n_tokens)] -> {doc_id: shard}, the documented rule."""
    order = sorted(rows, key=lambda r: (_pri(r[0]) % groups, _pri(r[0]), r[0]))
    out, cum = {}, 0
    for doc_id, n in order:
        out[doc_id] = cum // tokens_per_shard
        cum += n
    return out


@pytest.fixture(scope="module")
def tok_docs(spark):
    # 40 docs, 1..40 whitespace tokens each (token counts = doc_id)
    rows = [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 41)]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_shard_assignment_matches_replay(tok_docs):
    out = token_balanced_shards(
        tok_docs, tokens_per_shard=100, groups=8
    ).select("doc_id", "n_tokens", "shard")
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    toks = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert toks == {i: i for i in range(1, 41)}  # ws token count == doc_id
    expect = _replay([(i, i) for i in range(1, 41)], 100, 8)
    assert got == expect
    # shards are dense from 0
    assert set(got.values()) == set(range(max(got.values()) + 1))


def test_shard_balance_bound(tok_docs):
    tps = 100
    sharded = token_balanced_shards(tok_docs, tokens_per_shard=tps, groups=8)
    man = shard_manifest(sharded).collect()
    max_doc = 40
    last = max(r["shard"] for r in man)
    for r in man:
        if r["shard"] != last:
            # a contiguous block overshoots/undershoots by < one document
            assert abs(r["n_tokens"] - tps) < max_doc, r
        assert r["n_docs"] > 0


def test_shard_partition_invariant(tok_docs):
    a = sorted(
        token_balanced_shards(tok_docs, 100, groups=8)
        .select("doc_id", "shard").collect()
    )
    b = sorted(
        token_balanced_shards(tok_docs.repartition(7), 100, groups=8)
        .select("doc_id", "shard").collect()
    )
    assert a == b


def test_write_shards_round_trip(tok_docs, tmp_path, spark):
    sharded = token_balanced_shards(tok_docs, 150, groups=4)
    manifest = write_shards(
        sharded.select("doc_id", "text", "n_tokens", "shard"), str(tmp_path)
    ).collect()
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1, 41))
    # manifest written and re-derivable from what was read back
    stored = sorted(
        spark.read.parquet(str(tmp_path / "manifest")).collect()
    )
    assert stored == sorted(manifest)
    recount = {
        (r["shard"], r["n_docs"], r["n_tokens"])
        for r in shard_manifest(back).collect()
    }
    assert recount == {
        (r["shard"], r["n_docs"], r["n_tokens"]) for r in manifest
    }


def test_shard_plan_is_jvm_side(tok_docs):
    plan = (
        token_balanced_shards(tok_docs, 100, groups=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # offsets broadcast back; no Python in the assignment path
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_write_shards_jsonl(spark, tmp_path):
    from crawler_spark.sinks.shards import token_balanced_shards, write_shards

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + i % 4))) for i in range(40)],
        "doc_id int, text string",
    )
    sharded = token_balanced_shards(docs, tokens_per_shard=60, groups=8)
    manifest = write_shards(sharded, str(tmp_path / "out"), fmt="json")
    back = spark.read.json(str(tmp_path / "out" / "shards"))
    assert back.count() == 40
    # JSONL round-trips the assignment: same (doc_id -> shard) mapping
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    exp = {r["doc_id"]: r["shard"] for r in sharded.collect()}
    assert got == exp
    assert manifest.count() == len(set(exp.values()))
    import pytest

    with pytest.raises(ValueError):
        write_shards(sharded, str(tmp_path / "bad"), fmt="csvx")
