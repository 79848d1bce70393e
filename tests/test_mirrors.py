"""Mirror-host detection vs pure-Python set arithmetic."""

from collections import defaultdict

import pytest

from crawler_spark.frontier.mirrors import (
    host_profiles,
    mirror_groups,
    mirror_pairs,
    noncanonical_hosts,
)


@pytest.fixture(scope="module")
def page_rows():
    rows = []
    for c in range(40):
        for h in ("m0", "m1", "m2"):  # full mirrors
            rows.append((h, f"content-{c}"))
    for c in range(40):
        rows.append(("u0", f"ua-{c}"))  # unique hosts
        rows.append(("u1", f"ub-{c}"))
    for c in range(20):
        rows.append(("p", f"content-{c}"))  # partial overlap with m*
    for c in range(20):
        rows.append(("p", f"pp-{c}"))
    # duplicate serving: same page many times must not inflate profiles
    for _ in range(5):
        rows.append(("m0", "content-0"))
    return rows


def _replay_pairs(rows, min_jaccard, max_df=None):
    sets = defaultdict(set)
    for h, t in rows:
        sets[h].add(t)
    if max_df is not None:
        df = defaultdict(int)
        for h in sets:
            for k in sets[h]:
                df[k] += 1
        hot = {k for k, n in df.items() if n > max_df}
        sets = {h: s - hot for h, s in sets.items()}
    out = {}
    hosts = sorted(sets)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= min_jaccard:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]), j)
    return out


@pytest.mark.parametrize("min_j,max_df", [(0.8, None), (0.2, None), (0.2, 3)])
def test_pairs_match_pure_python(spark, page_rows, min_j, max_df):
    pages = spark.createDataFrame(page_rows, "host string, text string")
    prof = host_profiles(pages)
    got = {
        (r["host_a"], r["host_b"]): (r["shared"], r["n_a"], r["n_b"], r["jaccard"])
        for r in mirror_pairs(prof, min_jaccard=min_j, max_df=max_df).collect()
    }
    assert got == _replay_pairs(page_rows, min_j, max_df)


def test_max_df_caps_hot_templates(spark):
    # one boilerplate page on every host must not make everyone mirrors
    rows = [(f"h{i}", "404-template") for i in range(20)]
    rows += [(f"h{i}", f"own-{i}") for i in range(20)]
    pages = spark.createDataFrame(rows, "host string, text string")
    pairs = mirror_pairs(host_profiles(pages), min_jaccard=0.1, max_df=5)
    assert pairs.count() == 0


def test_groups_and_canonical_election(spark, page_rows):
    pages = spark.createDataFrame(page_rows, "host string, text string")
    pairs = mirror_pairs(host_profiles(pages), min_jaccard=0.8)
    groups = {r["host"]: r["canonical_host"] for r in mirror_groups(pairs).collect()}
    assert groups == {"m0": "m0", "m1": "m0", "m2": "m0"}
    drop = sorted(r["host"] for r in noncanonical_hosts(mirror_groups(pairs)).collect())
    assert drop == ["m1", "m2"]


def test_partition_invariance(spark, page_rows):
    pages = spark.createDataFrame(page_rows, "host string, text string")
    a = sorted(
        map(tuple, mirror_pairs(host_profiles(pages.repartition(1)), 0.2).collect())
    )
    b = sorted(
        map(tuple, mirror_pairs(host_profiles(pages.repartition(13)), 0.2).collect())
    )
    assert a == b


def test_curate_cli_mirror_dedup(spark, tmp_path, monkeypatch):
    """jobs/curate.py --mirror-dedup: docs of non-canonical mirror sources
    are dropped before curation; the canonical source's docs survive."""
    import sys

    import jobs.curate as jc

    rows = []
    for i in range(12):
        text = f"the careful fox writes prose number {i} about science"
        rows.append((i, text, "src-a"))           # canonical (lexic. min)
        rows.append((100 + i, text, "src-b"))     # full mirror of src-a
    for i in range(12):
        rows.append((200 + i, f"unique document {i} from the quiet archive", "src-c"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    inp, outp = str(tmp_path / "in"), str(tmp_path / "out")
    docs.write.parquet(inp)

    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", inp, "--output", outp,
        "--min-quality", "0.0", "--langs", "en", "unknown",
        "--mirror-dedup", "0.8",
    ])
    jc.main()
    kept = spark.read.parquet(outp).collect()
    sources = {r["source"] for r in kept}
    assert "src-b" not in sources           # mirror alias dropped wholesale
    assert {"src-a", "src-c"} <= sources    # canonical + unique survive
    # curation's own exact dedup then keeps min-id per content, so src-a's
    # docs are all present exactly once
    assert sorted(r["doc_id"] for r in kept if r["source"] == "src-a") == list(range(12))


def test_plan_jvm_only_and_broadcast_hot_filter(spark, page_rows):
    pages = spark.createDataFrame(page_rows, "host string, text string")
    from crawler_spark.frontier.mirrors import capped_profiles

    df = mirror_pairs(host_profiles(pages), 0.5, max_df=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the hot-key cap is a broadcast anti-join (checked on the component —
    # the final plan hides it behind the localCheckpoint boundary)
    cp = capped_profiles(host_profiles(pages), max_df=10)
    cplan = cp._sc._jvm.PythonSQLUtils.explainString(
        cp._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in cplan and "LeftAnti" in cplan
