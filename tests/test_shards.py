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


# ---------------------------------------------------------------------------
# deterministic WebDataset-style tar shards (sinks/tar.py)
# ---------------------------------------------------------------------------


def test_tar_bytes_deterministic_and_stdlib_readable():
    import io
    import tarfile

    from crawler_spark.sinks.tar import tar_bytes_for

    members = [("000000000003.txt", b"hello"), ("000000000001.txt", b"")]
    blob = tar_bytes_for(members)
    assert blob == tar_bytes_for(members)  # bit-stable
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        infos = tf.getmembers()
        assert [i.name for i in infos] == [m[0] for m in members]
        assert all(i.mtime == 0 and i.uid == 0 and i.mode == 0o644 for i in infos)
        assert tf.extractfile(infos[0]).read() == b"hello"


def test_tar_shards_members_in_hash_order(tok_docs):
    import io
    import tarfile

    from crawler_spark.sinks.tar import tar_shards

    assigned = token_balanced_shards(tok_docs, tokens_per_shard=200, groups=8)
    blobs = {r.shard: r for r in tar_shards(assigned).collect()}
    # expected membership + order per shard from the collected assignment
    per_shard = {}
    for r in assigned.select("shard", "doc_id").collect():
        per_shard.setdefault(r.shard, []).append(r.doc_id)
    for shard, ids in per_shard.items():
        ids_sorted = sorted(ids, key=lambda i: (_pri(i), i))
        with tarfile.open(fileobj=io.BytesIO(bytes(blobs[shard].tar))) as tf:
            names = [i.name for i in tf.getmembers()]
        assert names == [f"{i:012d}.txt" for i in ids_sorted]
        assert blobs[shard].n_members == len(ids)


def test_tar_shards_partition_invariant_bytes(tok_docs):
    from crawler_spark.sinks.tar import tar_shards

    assigned = token_balanced_shards(tok_docs, tokens_per_shard=200, groups=8)
    a = {r.shard: r.md5 for r in tar_shards(assigned).collect()}
    b = {r.shard: r.md5 for r in tar_shards(assigned.repartition(7)).collect()}
    assert a == b and len(a) >= 2


def test_tar_null_text_is_empty_member(spark):
    import io
    import tarfile

    from crawler_spark.sinks.tar import tar_shards

    df = spark.createDataFrame(
        [(1, None), (2, "x")], "doc_id int, text string"
    ).withColumn("shard", F.lit(0))
    blob = bytes(tar_shards(df).collect()[0].tar)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        data = {i.name: tf.extractfile(i).read() for i in tf.getmembers()}
    assert data[f"{1:012d}.txt"] == b""
    assert data[f"{2:012d}.txt"] == b"x"


def test_write_tar_shards_roundtrip_and_manifest(tok_docs, tmp_path):
    import io
    import tarfile

    from crawler_spark.sinks.tar import write_tar_shards

    assigned = token_balanced_shards(tok_docs, tokens_per_shard=200, groups=8)
    man = write_tar_shards(assigned, str(tmp_path / "tars"))
    rows = man.orderBy("shard").collect()
    assert len(rows) >= 2
    seen_ids = []
    for r in rows:
        with open(r.path, "rb") as f:
            blob = f.read()
        assert len(blob) == r.n_bytes
        import hashlib as _h

        assert _h.md5(blob).hexdigest() == r.md5
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            seen_ids += [int(i.name.split(".")[0]) for i in tf.getmembers()]
    assert sorted(seen_ids) == list(range(1, 41))


def test_write_tar_shards_refuses_object_store_uri(tok_docs):
    import pytest as _pytest

    from crawler_spark.sinks.tar import write_tar_shards

    assigned = token_balanced_shards(tok_docs, tokens_per_shard=200, groups=8)
    with _pytest.raises(ValueError, match="POSIX"):
        write_tar_shards(assigned, "s3a://bucket/corpus")


def test_tar_shards_string_ids_and_bad_name_refusal(spark):
    import io
    import tarfile

    from crawler_spark.sinks.tar import tar_shards

    df = spark.createDataFrame(
        [("https://a.test/p1", "x"), ("https://a.test/p2", "y")],
        "doc_id string, text string",
    ).withColumn("shard", F.lit(0))
    import pytest as _pytest
    from pyspark.errors import PythonException

    with _pytest.raises(PythonException, match="unusable as tar member"):
        tar_shards(df).collect()

    ok = spark.createDataFrame(
        [("page-a", "x"), ("page-b", "y")], "doc_id string, text string"
    ).withColumn("shard", F.lit(0))
    blob = bytes(tar_shards(ok).collect()[0].tar)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        names = [i.name for i in tf.getmembers()]
    assert sorted(names) == ["page-a.txt", "page-b.txt"]
