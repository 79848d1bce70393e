"""HyperLogLog sketch (`operators/sketch.py`) and gap sessionization
(`operators/sessions.py`). DuckDB value-hash parity runs in the driver
gate; these tests cover the algebraic properties the gate cannot see
(merge-associativity, estimate accuracy bands, plan shape)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.sessions import session_stats, sessionize
from crawler_spark.operators.sketch import (
    HLL_M,
    heavy_hitters,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
    mg_candidates,
)


def _vals(spark, lo, hi, key="k"):
    return spark.range(lo, hi).select(
        F.lit(key).alias("key"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


@pytest.mark.parametrize("n", [100, 2_000, 20_000])
def test_hll_estimate_accuracy(spark, n):
    est = (
        hll_distinct(_vals(spark, 0, n), ["key"], "v")
        .collect()[0]["hll_est"]
    )
    # standard error ~1.04/sqrt(512) = 4.6%; allow 3 sigma
    assert abs(est - n) / n < 0.14, (n, est)


def test_hll_merge_equals_build_of_union(spark):
    a = _vals(spark, 0, 3_000)
    b = _vals(spark, 2_000, 6_000)  # overlapping ranges
    merged = hll_merge(
        hll_registers(a, ["key"], "v"),
        hll_registers(b, ["key"], "v"),
        ["key"],
    )
    direct = hll_registers(a.unionByName(b), ["key"], "v")
    assert sorted(merged.collect()) == sorted(direct.collect())
    # and therefore identical estimates, not merely close ones
    assert (
        hll_estimate(merged, ["key"]).collect()
        == hll_estimate(direct, ["key"]).collect()
    )


def test_hll_partition_invariant_and_bounded(spark):
    v = _vals(spark, 0, 5_000)
    one = hll_registers(v, ["key"], "v")
    many = hll_registers(v.repartition(13), ["key"], "v")
    assert sorted(one.collect()) == sorted(many.collect())
    # the register table is the scale contract: never more than m rows/key
    assert one.count() <= HLL_M


def test_hll_overlap_known_jaccard(spark):
    from crawler_spark.operators.sketch import hll_overlap

    # |A|=6000, |B|=6000, |A ∩ B|=2000 -> J = 0.2
    a = hll_registers(_vals(spark, 0, 6_000), ["key"], "v")
    b = hll_registers(_vals(spark, 4_000, 10_000), ["key"], "v")
    r = hll_overlap(a, b, ["key"]).collect()[0]
    assert abs(r.est_union - 10_000) / 10_000 < 0.2
    # inclusion-exclusion error scales with (|A|+|B|)/|A ∩ B| times the
    # sketch error — the docstring's "signal, not a measurement" caveat;
    # these bands are what m=512 honestly delivers at J=0.2
    assert abs(r.est_intersect - 2_000) / 2_000 < 0.5
    assert abs(r.jaccard_est - 0.2) < 0.1
    # union anchor == merge anchor (exact, not approximate)
    direct = hll_estimate(hll_merge(a, b, ["key"]), ["key"]).collect()[0]
    assert r.hll_s_union == direct.hll_s
    assert r.est_union == direct.hll_est


def test_hll_overlap_disjoint_clamps_nonnegative(spark):
    from crawler_spark.operators.sketch import hll_overlap

    a = hll_registers(_vals(spark, 0, 5_000), ["key"], "v")
    b = hll_registers(_vals(spark, 50_000, 55_000), ["key"], "v")
    r = hll_overlap(a, b, ["key"]).collect()[0]
    assert r.est_intersect >= 0.0
    assert r.jaccard_est < 0.06  # sketch noise only


def test_hll_overlap_one_sided_keys_default_empty(spark):
    from crawler_spark.operators.sketch import hll_overlap

    a = hll_registers(_vals(spark, 0, 1_000, key="only_a"), ["key"], "v")
    b = hll_registers(_vals(spark, 0, 1_000, key="only_b"), ["key"], "v")
    rows = {r.key: r for r in hll_overlap(a, b, ["key"]).collect()}
    assert set(rows) == {"only_a", "only_b"}
    assert rows["only_a"].est_b == 0.0 and rows["only_b"].est_a == 0.0
    # a missing side is the empty sketch: intersection 0, union = the
    # present side's estimate
    assert rows["only_a"].est_intersect == 0.0
    assert rows["only_a"].est_union == rows["only_a"].est_a


def test_hll_overlap_rejects_p_that_overflows_anchor(spark):
    # the empty-sketch anchor m * 2^53 = 2^(p+53) must fit a signed
    # 64-bit value: p=10 is exactly 2^63 (> BIGINT max), so the guard
    # fires at p >= 10, not just p >= 11
    from crawler_spark.operators.sketch import hll_overlap

    a = hll_registers(_vals(spark, 0, 10, key="k"), ["key"], "v", p=4)
    for bad_p in (10, 11):
        with pytest.raises(ValueError, match="p <= 9"):
            hll_overlap(a, a, ["key"], p=bad_p)
    assert (1 << (10 + 53)) > (1 << 63) - 1  # the arithmetic the guard pins


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------


def _skewed(spark):
    # zipf-ish by construction: "h0" x 40, "h1" x 20, "h2" x 10, then 30
    # singletons; N = 100, exact top-3 = h0/h1/h2
    rows = (
        [("h0",)] * 40 + [("h1",)] * 20 + [("h2",)] * 10
        + [(f"u{i}",) for i in range(30)]
    )
    return spark.createDataFrame(rows, "src string")


def test_heavy_hitters_exact_and_certified(spark):
    out = heavy_hitters(_skewed(spark), "src", k=3, capacity=64).collect()
    assert [(r["k"], r["n_exact"], r["rank"]) for r in out] == [
        ("h0", 40, 1),
        ("h1", 20, 2),
        ("h2", 10, 3),
    ]
    # kth count 10 > 100/65: the MG superset guarantee certifies exactness
    assert all(r["certified"] for r in out)


def test_heavy_hitters_partition_invariant_when_certified(spark):
    df = _skewed(spark)
    one = heavy_hitters(df, "src", k=3, capacity=64).collect()
    many = heavy_hitters(df.repartition(7), "src", k=3, capacity=64).collect()
    assert sorted(one) == sorted(many)


def test_heavy_hitters_uncertified_under_tiny_capacity(spark):
    # capacity 2 against 30 singletons per partition: the guarantee bound
    # N/(m+1) = 100/3 = 33.3 exceeds the kth count, so the result must
    # declare itself best-effort — and the truly dominant key still leads
    out = heavy_hitters(_skewed(spark).coalesce(1), "src", k=3, capacity=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert not any(r["certified"] for r in rows)
    assert rows[0]["k"] == "h0"  # count 40 > N/3: MG cannot lose it


def test_heavy_hitters_ties_break_by_key(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "src string"
    )
    out = heavy_hitters(df, "src", k=2, capacity=16).collect()
    assert [(r["k"], r["rank"]) for r in out] == [("a", 1), ("b", 2)]


def test_mg_candidates_bounded_and_superset(spark):
    df = _skewed(spark).repartition(5)
    cand = mg_candidates(df, "src", capacity=8).distinct().collect()
    keys = {r["k"] for r in cand}
    # bounded: at most partitions * capacity rows survive the summaries
    assert len(cand) <= 5 * 8
    # superset guarantee: every key with count > N/(capacity+1) is present
    assert {"h0", "h1"} <= keys  # counts 40, 20 > 100/9


def test_heavy_hitters_broadcasts_candidates(spark):
    plan = heavy_hitters(_skewed(spark), "src", k=3, capacity=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: t=0,100 (one session), t=3000 (gap 2900 > 1800 -> new)
        (10, "2024-01-01 00:00:00", 1),
        (11, "2024-01-01 00:01:40", 1),
        (12, "2024-01-01 00:50:00", 1),
        # user 2: two events at the SAME timestamp — id breaks the tie
        (21, "2024-01-01 05:00:00", 2),
        (20, "2024-01-01 05:00:00", 2),
    ]
    return spark.createDataFrame(
        rows, "event_id int, ts_s string, user_id int"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_sessionize_hand_checked(tiny_events):
    out = {
        r["event_id"]: (r["session_idx"], r["session_start"])
        for r in sessionize(tiny_events, gap_sec=1800).collect()
    }
    assert out[10] == (1, 1)
    assert out[11] == (1, 0)   # 100 s gap stays in session 1
    assert out[12] == (2, 1)   # 2900 s gap opens session 2
    assert out[20] == (1, 1)   # same-ts tie: lower id is the session opener
    assert out[21] == (1, 0)


def test_session_stats_hand_checked(tiny_events):
    st = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(tiny_events, gap_sec=1800).collect()
    }
    assert st[(1, 1)]["n_events"] == 2 and st[(1, 1)]["duration_sec"] == 100
    assert st[(1, 2)]["n_events"] == 1 and st[(1, 2)]["duration_sec"] == 0
    assert st[(2, 1)]["n_events"] == 2 and st[(2, 1)]["duration_sec"] == 0
    assert st[(2, 1)]["min_event_id"] == 20 and st[(2, 1)]["max_event_id"] == 21


def test_session_stats_single_shuffle(tiny_events):
    """groupBy(user, session_idx) must reuse the window's hash(user)
    partitioning — exactly one Exchange in the whole plan."""
    plan = (
        session_stats(tiny_events, gap_sec=1800)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_partition_invariant(spark, tiny_events):
    one = sorted(sessionize(tiny_events, gap_sec=1800).collect())
    many = sorted(
        sessionize(tiny_events.repartition(5), gap_sec=1800).collect()
    )
    assert one == many


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_tables(spark):
    left = spark.createDataFrame(
        [
            (100, "2024-01-01 10:00:00", 1),  # after r1, r2 -> r2
            (101, "2024-01-01 08:00:00", 1),  # exactly at r1 -> r1 (<=)
            (102, "2024-01-01 07:00:00", 1),  # before everything -> null
            (103, "2024-01-01 12:00:00", 2),  # other key, no right rows
        ],
        "event_id int, ts_s string, user_id int",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", 1, 10.0),
            (2, "2024-01-01 09:00:00", 1, 20.0),
            (3, "2024-01-01 09:00:00", 1, 30.0),  # same ts as 2: max id wins
        ],
        "event_id int, ts_s string, user_id int, value double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    return left, right


def test_asof_join_hand_checked(asof_tables):
    from crawler_spark.operators.asof import asof_join

    left, right = asof_tables
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(left, right, value_cols=["event_id", "value"]).collect()
    }
    assert out[100] == (3, 30.0)      # latest tie (id 3) at 09:00 wins
    assert out[101] == (1, 10.0)      # equal timestamp matches (<=)
    assert out[102] == (None, None)   # nothing precedes
    assert out[103] == (None, None)   # key has no right rows at all
    # left columns survive untouched
    cols = asof_join(left, right, value_cols=["value"]).columns
    assert cols == ["event_id", "user_id", "ts", "asof_value"]


def test_asof_join_partition_invariant_and_single_shuffle(asof_tables):
    from crawler_spark.operators.asof import asof_join

    left, right = asof_tables
    one = sorted(asof_join(left, right, value_cols=["value"]).collect())
    many = sorted(
        asof_join(
            left.repartition(7), right.repartition(3), value_cols=["value"]
        ).collect()
    )
    assert one == many
    # union-merge shape: ONE exchange on the key, no join operator at all
    plan = (
        asof_join(left, right, value_cols=["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_join_matches_bruteforce_on_random_streams(spark):
    """Property test: the union-merge as-of join equals the obvious
    per-row brute force on randomized inputs (hypothesis, derandomized
    for reproducibility)."""
    from hypothesis import given, settings, strategies as st

    from crawler_spark.operators.asof import asof_join

    ev = st.lists(
        st.tuples(
            st.integers(0, 2),      # user
            st.integers(0, 50),     # seconds offset
        ),
        min_size=0, max_size=12,
    )

    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(left_raw=ev, right_raw=ev)
    def check(left_raw, right_raw):
        mk = lambda raw, base: [
            (base + i, f"2024-01-01 00:00:{s:02d}", u, float(base + i))
            for i, (u, s) in enumerate(raw)
        ]
        lrows, rrows = mk(left_raw, 100), mk(right_raw, 500)
        schema = "event_id int, ts_s string, user_id int, value double"
        to_df = lambda rows: (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        )
        if not lrows:
            return
        out = {
            r["event_id"]: r["asof_event_id"]
            for r in asof_join(
                to_df(lrows), to_df(rrows or [(0, "1970-01-01 00:00:00", -1, 0.0)]),
                value_cols=["event_id", "value"],
            ).collect()
        }
        for lid, lts, lu, _ in lrows:
            cands = [
                (rts, rid) for rid, rts, ru, _ in rrows
                if ru == lu and rts <= lts
            ]
            want = max(cands)[1] if cands else None
            assert out[lid] == want, (lid, out[lid], want)

    check()


# --------------------------------------------------------------------------
# ordered-step funnel
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1 completes view->click->purchase in order; u2 clicks BEFORE its
    # first view (strict order: click must not count); u3 views only;
    # u4 has two views then a click (earliest valid times win)
    rows = [
        (1, "2024-01-01 00:00:01", "view"),
        (1, "2024-01-01 00:00:05", "click"),
        (1, "2024-01-01 00:00:09", "purchase"),
        (2, "2024-01-01 00:00:02", "click"),
        (2, "2024-01-01 00:00:04", "view"),
        (3, "2024-01-01 00:00:03", "view"),
        (4, "2024-01-01 00:00:01", "view"),
        (4, "2024-01-01 00:00:02", "view"),
        (4, "2024-01-01 00:00:06", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, event_type string")
    return df.withColumn("ts", F.col("ts").cast("timestamp")).cache()


def test_funnel_strict_order(funnel_events):
    from crawler_spark.operators.sessions import funnel

    out = {
        r["user_id"]: r
        for r in funnel(funnel_events, ["view", "click", "purchase"]).collect()
    }
    assert out[1]["steps_completed"] == 3
    assert out[1]["t1"] < out[1]["t2"] < out[1]["t3"]
    # u2's click precedes its view: only step 1 counts
    assert out[2]["steps_completed"] == 1
    assert out[2]["t2"] is None and out[2]["t3"] is None
    assert out[3]["steps_completed"] == 1
    # u4: earliest view counts as t1, click converts
    assert out[4]["steps_completed"] == 2
    assert out[4]["t1"] < out[4]["t2"]


def test_funnel_counts_and_validation(funnel_events):
    from crawler_spark.operators.sessions import funnel, funnel_counts

    got = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel_counts(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {(1, "view"): 4, (2, "click"): 2, (3, "purchase"): 1}
    with pytest.raises(ValueError):
        funnel(funnel_events, [])


def test_funnel_partition_invariant(funnel_events):
    from crawler_spark.operators.sessions import funnel

    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(
        funnel(funnel_events.repartition(1), ["view", "click"])
    ) == key(funnel(funnel_events.repartition(7, "event_type"), ["view", "click"]))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

import hashlib

from crawler_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cms(values, depth=CMS_DEPTH, width=CMS_WIDTH):
    table = {}
    for v in values:
        for r in range(depth):
            b = _py_hash60(f"cms{r}|{v}") % width
            table[(r, b)] = table.get((r, b), 0) + 1
    return table


def _py_cms_est(table, key, depth=CMS_DEPTH, width=CMS_WIDTH):
    return min(
        table.get((r, _py_hash60(f"cms{r}|{key}") % width), 0)
        for r in range(depth)
    )


@pytest.fixture(scope="module")
def zipf_words(spark):
    # word_i appears i+1 times: heavy and light keys in one frame
    rows = [(f"w{i}",) for i in range(60) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "word string")


def test_cms_matches_python_replay(spark, zipf_words):
    sketch = cms_build(zipf_words, "word")
    got = {(r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    assert got == _py_cms([f"w{i}" for i in range(60) for _ in range(i + 1)])


def test_cms_never_undercounts_and_zero_for_unseen(spark, zipf_words):
    sketch = cms_build(zipf_words, "word")
    keys = spark.createDataFrame(
        [(f"w{i}",) for i in range(60)] + [("never-seen",)], "k string"
    )
    est = {r["k"]: r["cms_count"] for r in cms_estimate(sketch, keys).collect()}
    for i in range(60):
        assert est[f"w{i}"] >= i + 1, (i, est[f"w{i}"])
    assert est["never-seen"] >= 0  # may collide, never negative
    # python-replay exact agreement (same hash, same min)
    table = _py_cms([f"w{i}" for i in range(60) for _ in range(i + 1)])
    for k, v in est.items():
        assert v == _py_cms_est(table, k), k


def test_cms_merge_equals_build_of_union(spark, zipf_words):
    a = zipf_words.filter(F.col("word") < "w3")
    b = zipf_words.filter(F.col("word") >= "w3")
    merged = cms_merge(cms_build(a, "word"), cms_build(b, "word"))
    direct = cms_build(zipf_words, "word")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_partition_invariant_and_bounded(spark, zipf_words):
    runs = [
        sorted(map(tuple, cms_build(zipf_words.repartition(n), "word").collect()))
        for n in (1, 7)
    ]
    assert runs[0] == runs[1]
    assert len(runs[0]) <= CMS_DEPTH * CMS_WIDTH


def test_cms_plan_jvm_only_and_broadcast_probe(spark, zipf_words):
    sketch = cms_build(zipf_words, "word")
    keys = spark.createDataFrame([("w1",), ("w2",)], "k string")
    df = cms_estimate(sketch, keys)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# point-in-interval join (chunked equi-join, never a nested loop)
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from crawler_spark.operators.asof import interval_join

_T = datetime(2025, 3, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def pts_and_ivs(spark):
    pts = spark.createDataFrame(
        [(j, j % 3, _T + timedelta(minutes=17 * j)) for j in range(40)],
        "pid long, k long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            # short, long (spans many 10-min chunks), point-sized, inverted
            (100, 0, _T + timedelta(minutes=5), _T + timedelta(minutes=45)),
            (101, 1, _T, _T + timedelta(hours=8)),
            (102, 2, _T + timedelta(minutes=34), _T + timedelta(minutes=34)),
            (103, 0, _T + timedelta(hours=2), _T + timedelta(hours=1)),
        ],
        "iid long, k long, start_ts timestamp, end_ts timestamp",
    )
    return pts.cache(), ivs.cache()


def _brute(pts, ivs, keyed):
    out = set()
    for p in pts:
        for i in ivs:
            if keyed and p["k"] != i["k"]:
                continue
            if i["start_ts"] <= p["ts"] <= i["end_ts"]:
                out.add((p["pid"], i["iid"]))
    return out


def test_interval_join_matches_bruteforce(spark, pts_and_ivs):
    pts, ivs = pts_and_ivs
    for chunk in (60, 600, 86400):  # chunk far smaller / near / far larger
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(
                pts, ivs.drop("k"), chunk_sec=chunk
            ).collect()
        }
        assert got == _brute(pts.collect(), ivs.collect(), keyed=False), chunk


def test_interval_join_with_equi_key(spark, pts_and_ivs):
    pts, ivs = pts_and_ivs
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, on=["k"], chunk_sec=600).collect()
    }
    assert got == _brute(pts.collect(), ivs.collect(), keyed=True)


def test_interval_join_bounds_inclusive_and_inverted_dropped(spark):
    pts = spark.createDataFrame(
        [(0, _T), (1, _T + timedelta(seconds=60))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(10, _T, _T + timedelta(seconds=60)),
         (11, _T + timedelta(seconds=60), _T)],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, chunk_sec=30).collect()
    )
    # both endpoints match interval 10; inverted interval 11 matches nothing
    assert got == [(0, 10), (1, 10)]


def test_interval_join_column_collision_raises(spark, pts_and_ivs):
    pts, ivs = pts_and_ivs
    with pytest.raises(ValueError):
        interval_join(pts, ivs)  # 'k' collides without on=["k"]


def test_interval_join_partition_invariant(spark, pts_and_ivs):
    pts, ivs = pts_and_ivs
    runs = [
        sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pts.repartition(n), ivs.drop("k"), chunk_sec=600
            ).collect()
        )
        for n in (1, 7)
    ]
    assert runs[0] == runs[1]


def test_interval_join_is_hash_join_not_nested_loop(spark, pts_and_ivs):
    pts, ivs = pts_and_ivs
    plan = (
        interval_join(pts, ivs, on=["k"], chunk_sec=600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# log-histogram quantile sketch
# ---------------------------------------------------------------------------

from crawler_spark.operators.sketch import (  # noqa: E402
    QSK_SUBBUCKETS,
    qsk_build,
    qsk_merge,
    qsk_quantiles,
    qsk_threshold_filter,
)


def _qsk_bucket_py(v: int, k: int = QSK_SUBBUCKETS) -> int:
    v = min(max(v, 0), (1 << 53) - 1)
    if v <= 0:
        return 0
    L = v.bit_length()
    return (L - 1) * k + ((v * k) >> (L - 1)) - k + 1


def _qsk_corpus(spark, seed=11):
    import random

    rng = random.Random(seed)
    rows = (
        [("a", rng.randint(0, 100_000)) for _ in range(4000)]
        + [("b", rng.randint(1, 60)) for _ in range(800)]
        + [("b", 0), ("b", 0), ("c", 1)]
    )
    return rows, spark.createDataFrame(rows, "key string, v long")


def test_qsk_bucket_matches_python_replay(spark):
    probe = [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 100, 1000, (1 << 53) - 1,
             (1 << 53), -5]
    df = spark.createDataFrame([(v,) for v in probe], "v long")
    got = dict(
        qsk_build(df, [], "v")
        .select("qbucket", "cnt")
        .collect()
    )
    import collections

    want = collections.Counter(_qsk_bucket_py(v) for v in probe)
    assert got == dict(want)


def test_qsk_quantile_one_sided_band(spark):
    rows, df = _qsk_corpus(spark)
    q = {
        r["key"]: r
        for r in qsk_quantiles(qsk_build(df, ["key"], "v"), ["key"]).collect()
    }
    for key in ("a", "b", "c"):
        vs = sorted(v for kk, v in rows if kk == key)
        n = len(vs)
        assert q[key]["n"] == n
        for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            target = -(-n * num // den)  # ceil
            exact = vs[target - 1]
            est = q[key][lbl]
            # lower bound of the bucket holding the target rank:
            # est <= exact < est * (1 + 1/k), with bucket 0 exact at 0
            assert est <= exact, (key, lbl, est, exact)
            if exact > 0:
                assert exact < est * (1.0 + 1.0 / QSK_SUBBUCKETS), (
                    key, lbl, est, exact,
                )
            else:
                assert est == 0.0


def test_qsk_merge_equals_build_of_union_and_partition_invariance(spark):
    _, df = _qsk_corpus(spark)
    a = df.where("v % 2 = 0")
    b = df.where("v % 2 = 1")
    merged = qsk_merge(
        qsk_build(a, ["key"], "v"), qsk_build(b, ["key"], "v"), ["key"]
    )
    direct = qsk_build(df, ["key"], "v")
    assert sorted(merged.collect()) == sorted(direct.collect())
    repart = qsk_build(df.repartition(7, "v"), ["key"], "v")
    assert sorted(repart.collect()) == sorted(direct.collect())


def test_qsk_null_and_negative_contract(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", -3), ("a", 0), ("a", 5)], "key string, v long"
    )
    sk = {r["qbucket"]: r["cnt"] for r in qsk_build(df, ["key"], "v").collect()}
    # NULL dropped; -3 and 0 both clamp into bucket 0; 5 in its own bucket
    assert sk == {0: 2, _qsk_bucket_py(5): 1}
    q = qsk_quantiles(qsk_build(df, ["key"], "v"), ["key"]).collect()[0]
    assert q["n"] == 3 and q["p50"] == 0.0


def test_qsk_threshold_filter_superset_of_exact_cut(spark):
    rows, df = _qsk_corpus(spark)
    kept = qsk_threshold_filter(df, ["key"], "v", 1, 2)
    got = sorted((r["key"], r["v"]) for r in kept.collect())
    # deterministic under repartitioning
    got2 = sorted(
        (r["key"], r["v"])
        for r in qsk_threshold_filter(
            df.repartition(5, "v"), ["key"], "v", 1, 2
        ).collect()
    )
    assert got == got2
    # per key: every row >= the exact p50 survives (threshold is a lower
    # bound of the bucket holding the true p50), and every survivor is
    # >= threshold > exact_p50 / (1 + 1/k)
    import collections

    by_key = collections.defaultdict(list)
    for kk, v in rows:
        by_key[kk].append(v)
    kept_by_key = collections.defaultdict(list)
    for kk, v in got:
        kept_by_key[kk].append(v)
    for kk, vs in by_key.items():
        vs = sorted(vs)
        n = len(vs)
        exact_p50 = vs[-(-n // 2) - 1]
        for v in vs:
            if v >= exact_p50:
                assert v in kept_by_key[kk]
        lo = exact_p50 / (1.0 + 1.0 / QSK_SUBBUCKETS)
        assert all(v >= lo or v == 0 for v in kept_by_key[kk]), kk
