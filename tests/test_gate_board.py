"""Gate-board invariants (no Spark session needed).

Round 2 regression: ``queries()`` grew to 66 entries but the driver's
correctness harness records at most 50 per run, so the 16 newest operators
silently got no driver check at all. These tests pin the cap, the
never-checked-first ordering, and the rule that rotating an entry off the
driver board never deletes it from the contract.

Round 4 rotation: the 20 never-driver-checked layout / eval / retrieval /
graph / sketch gates (VERDICT_r03 item 2) lead the board; displaced
entries are either two-rounds-driver-green (r2 AND r3) or analogs whose
semantics a staying/incoming board gate replays — each retired entry must
still exist on the extended board, where ``tools/check_entry.py
--extended`` holds it green.
"""

import __spark_entry__ as E

DRIVER_CAP = 50

# round-4 promotions: operators that had NEVER received a driver
# CORRECTNESS row before this round — they must lead the board
NEVER_CHECKED_R3 = [
    "zorder_key_docs",
    "zorder_prune_docs",
    "hilbert_key_docs",
    "compact_plan_docs",
    "data_card_docs",
    "bleu_docs",
    "chrf_docs",
    "token_prf_docs",
    "bm25_search_docs",
    "hybrid_search_docs",
    "bowtie_docs",
    "hits_docs",
    "harmonic_docs",
    "opic_docs",
    "cms_estimate_docs",
    "quantile_sketch_docs",
    "hll_overlap_docs",
    "main_content_docs",
    "dust_rewrite_docs",
    "sq_topk_docs",
]

# gates retired from the driver board after going driver-green in BOTH
# round 2 and round 3 (banked two-round history; still held green by the
# extended check + pytest)
RETIRED_TWO_GREEN = [
    "crawl_priority_order",
    "near_dup_docs",
    "embedding_near_dups",
    "blocklist_docs",
    "ivf_topk_docs",
    "fingerprint_docs",
    "curate_docs",
    "media_features",
    "pii_redact_docs",
    "simhash_near_dups",
]

# one on-board gate per operator family — if a rotation drops a family's
# last driver-checked entry (without the two-green retirement above or an
# on-board analog), this fails before the driver run does
FAMILY_REPRESENTATIVES = {
    "frontier/bfs crawl": "crawl_bfs_order",
    "extract kernel": "extract_pages_flagship",
    "llm-path extract": "extract_llm_path",
    "rag assembly": "rag_chunks",
    # chunk_documents rotated to extended in round 3: rag_chunks replays
    # the identical chunker recursion inside its RAG-assembly CTE
    "chunker": "rag_chunks",
    "crawl traps": "trap_flags_docs",
    "markdown sink": "export_markdown_report",
    "relevance": "extract_pages_flagship",
    "exact dedup": "assemble_training_docs",
    "anchor text": "anchor_stats_docs",
    "redirect resolution": "redirect_resolve_docs",
    "mirror hosts": "mirror_pairs_docs",
    # phrase_search_docs rotated in round 4: the BM25 + RRF-hybrid gates
    # build on the same positional postings
    "inverted index / retrieval": "bm25_search_docs",
    "hybrid retrieval": "hybrid_search_docs",
    # near_dup_docs rotated in round 4 (r2+r3 green): the CC gate
    # composes the same signature + banded join + exact-Jaccard verify
    "minhash/lsh": "near_dup_clusters",
    "two-stage near-dup": "near_dup_clusters",
    "ngram jaccard": "near_dup_clusters",
    "crawl recrawl": "recrawl_schedule_docs",
    # ANN family after the round-4 rotation: PQ + SQ8 carry the
    # centroid-assignment + candidate-only exact-rerank machinery
    # (ivf_topk_docs retired r2+r3 green; ivf_assign_docs extended)
    "pq ann": "pq_topk_docs",
    "sq ann": "sq_topk_docs",
    "semantic dedup": "semantic_dedup_docs",
    "incremental near-dup": "incr_near_dup_docs",
    "quality": "source_reputation_docs",
    "token count": "pack_sequences_docs",
    "nb classifier": "nb_quality_docs",
    "dsir resampling": "dsir_sample_docs",
    # hashed_vector_docs rotated in round 4: nb_quality + dsir drive the
    # same hashed-feature machinery
    "hashed features": "nb_quality_docs",
    "gopher filters": "gopher_line_docs",
    "c4 filters": "word_blocklist_docs",
    # blocklist_docs retired r2+r3 green: the word-blocklist gate drives
    # the same broadcast anti-join machinery
    "blocklist": "word_blocklist_docs",
    "line dedup": "host_boilerplate_docs",
    "decontamination": "contamination_pruned_docs",
    "budget mixing exact": "assemble_training_docs",
    # dust_rules_docs rotated in round 4: the rewrite gate's oracle
    # replays the full miner before the apply pass
    "dust rules": "dust_rewrite_docs",
    "budget mixing approx": "sample_budget_approx_docs",
    "connected components": "near_dup_clusters",
    "training-set assembly": "assemble_training_docs",
    "bigram lm": "lm_score_docs",
    # dup_span_docs rotated in round 4: strip_spans replays the same
    # span detection before stripping
    "dup spans / span strip": "strip_spans_docs",
    "source reputation": "source_reputation_docs",
    # hll_distinct_docs rotated in round 4: the overlap gate's oracle
    # embeds the same register tables + estimate formula
    "hll sketch": "hll_overlap_docs",
    "cms sketch": "cms_estimate_docs",
    "quantile sketch": "quantile_sketch_docs",
    "sessionization": "session_stats_events",
    "as-of join": "asof_join_events",
    # vocab_topk_docs rotated in round 4: tfidf shares the tokenizer +
    # exact count aggregation
    "vocab / tfidf": "tfidf_keywords_docs",
    "split": "split_assign_docs",
    # pack_firstfit_docs rotated in round 4: block packing keeps the
    # family's driver row
    "packing": "pack_sequences_docs",
    # pagerank_docs rotated in round 4: the graph family gains four
    # first-time driver rows this round
    "link graph": "hits_docs",
    "graph centrality": "harmonic_docs",
    "graph structure": "bowtie_docs",
    "crawl importance": "opic_docs",
    # round-4 first-time families
    "zorder layout": "zorder_key_docs",
    "layout pruning": "zorder_prune_docs",
    "hilbert layout": "hilbert_key_docs",
    "compaction": "compact_plan_docs",
    "data card": "data_card_docs",
    "eval bleu": "bleu_docs",
    "eval chrf": "chrf_docs",
    "eval token-prf": "token_prf_docs",
    "main content": "main_content_docs",
}


def test_driver_board_fits_cap():
    assert len(E.queries()) <= DRIVER_CAP


def test_never_checked_entries_lead_the_board():
    head = list(E.queries())[: len(NEVER_CHECKED_R3)]
    assert head == NEVER_CHECKED_R3


def test_boards_partition_the_full_query_set():
    q, qe = set(E.queries()), set(E.queries_extended())
    assert not q & qe
    assert q | qe == set(E._all_queries())


def test_every_oracle_has_a_query():
    assert set(E.oracle_sql()) <= set(E.queries())
    assert set(E.oracle_sql_extended()) <= set(E.queries_extended())


def test_driver_board_is_fully_oracled():
    """Every driver-checked entry carries a DuckDB value-hash oracle —
    rows-only twins live on the extended board where the weaker check is
    pytest's job, not the driver's."""
    assert set(E.oracle_sql()) == set(E.queries())


def test_every_operator_family_on_driver_board():
    board = set(E.queries())
    missing = {
        fam: g for fam, g in FAMILY_REPRESENTATIVES.items() if g not in board
    }
    assert not missing, f"families without a driver-checked gate: {missing}"


def test_retired_gates_stay_in_the_contract():
    """A rotation never deletes a gate: every two-green retiree must still
    be runnable (and oracled) on the extended board."""
    ext_q, ext_o = set(E.queries_extended()), set(E.oracle_sql_extended())
    for g in RETIRED_TWO_GREEN:
        assert g in ext_q, f"{g} fell out of the contract"
        assert g in ext_o, f"{g} lost its oracle"
