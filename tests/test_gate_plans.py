"""CI-grade plan-lint sweep over the WHOLE gate contract (VERDICT_r03
item 8): every ``queries()`` and ``queries_extended()`` frame is planned
at sf0.001 and run through ``plans.lint.assert_clean`` — a future gate
that ships a cartesian product, a row-at-a-time Python UDF, an
unbounded one-task stage, or an unpartitioned window becomes a test
failure, not a code-review hope.

``lint_plan`` only plans (it never executes the returned frame), though
a handful of gates run bounded driver-side work while CONSTRUCTING the
frame (iterative loops, centroid picks) — that is their documented
design, not a lint finding.

Allowance policy (every allowance names its bounded shape):

- ``unpushed_filter`` is allowed SWEEP-WIDE: gate frames filter almost
  exclusively on DERIVED columns (quality scores, hashes, synthesized
  urls, language predictions), which no scan can absorb — the rule's
  real target (a pushable literal predicate that failed to reach the
  scan) is pinned by the dedicated plan tests (test_layout,
  test_planlint) where pushable predicates actually exist.
- ``cartesian`` allowances are all the 1-row-broadcast-total pattern
  (corpus-constant joined onto every row: a normalizer, a budget total,
  an envelope bound) — BroadcastNestedLoopJoin over exactly one row by
  construction; re-audited in VERDICT_r03's collect/cartesian sweep.
- ``single_partition_funnel`` allowances move provably bounded rows
  (k centroids, <=2^bits sketch counters, shard/partition counts, one
  total row).
- ``global_window`` allowances rank bounded rows (top-K candidate
  lists, per-shard boundaries, sketch buckets), never corpus-sized
  frames.
"""

import pytest

import __spark_entry__ as E
from crawler_spark.plans.lint import assert_clean

SF = "/root/testdata/sf0.001"

# the 1-row broadcast-total / constant-join gates
_ONE_ROW_TOTAL = {
    "apportion_budget_docs",   # wave-budget total + remainder base
    "bm25_search_docs",        # corpus doc-count / avg-len constants
    "curation_funnel",         # funnel stage totals
    "dsir_sample_docs",        # importance-weight normalizer
    "dust_rewrite_docs",       # rule-support envelope bound
    "dust_rules_docs",         # same miner constants
    "emb_divergence_docs",     # per-corpus histogram totals
    "heavy_hitters_docs",      # MG guarantee threshold (n/k)
    "hybrid_search_docs",      # embeds both ranker oracles' constants
    "kn_score_docs",           # KN discount/continuation normalizers
    "lm_score_docs",           # bigram log-prob normalizer
    "nb_quality_docs",         # class-prior row
    "pmi_collocations_docs",   # corpus token total
    "ppl_bucket_docs",         # LM normalizer (lm_score's constants)
    "sb_score_docs",           # Stupid-Backoff normalizer
    "temperature_sample_docs", # temperature-scaled budget total
}

# provably bounded one-task stages (k / 2^bits / shard-count rows)
_BOUNDED_FUNNEL = _ONE_ROW_TOTAL | {
    "compact_plan_docs",       # file-metadata prefix-sum (file count rows)
    "layout_health_docs",      # per-dim span aggregate (dims x files)
    "shard_assign_docs",       # two-level prefix sum (shard-count rows)
    "release_stats_docs",      # composes the same shard prefix sum over
                               # the assembled (budget-bounded) set
}

# windows ranking bounded rows
_BOUNDED_WINDOW = {
    "anchor_stats_docs",       # top-K anchor texts per target
    "apportion_budget_docs",   # remainder rank over host rows in budget
    "compact_plan_docs",       # bin window over file-metadata rows
    "heavy_hitters_docs",      # rank over <=k MG candidates
    "hybrid_search_docs",      # rank over two bounded top-K lists
    "lm_score_docs",           # tie-rank over vocab-sized table
    "ppl_bucket_docs",         # ntile over per-lang doc scores (CCNet)
    "quantile_filter_docs",    # cumsum over <=2^bits sketch buckets
    "quantile_sketch_docs",    # same bucket cumsum
    "shard_assign_docs",       # shard-boundary rank
    "release_stats_docs",      # same shard-boundary rank + the assemble
                               # stage's per-source budget window
    "stratified_split_docs",   # per-stratum quota rank (strata-sized)
}


def _allow(name: str) -> set:
    allow = {"unpushed_filter"}
    if name in _ONE_ROW_TOTAL:
        allow.add("cartesian")
    if name in _BOUNDED_FUNNEL:
        allow.add("single_partition_funnel")
    if name in _BOUNDED_WINDOW:
        allow.add("global_window")
    return allow


GATES = sorted(set(E._all_queries()))


@pytest.fixture(scope="module")
def frames(spark):
    return E._all_queries()


@pytest.mark.parametrize("name", GATES)
def test_gate_plan_clean(spark, frames, name):
    df = frames[name](spark, SF)
    assert_clean(df, allow=_allow(name))
