"""Gate-board invariants (no Spark session needed).

Round 2 regression: ``queries()`` grew to 66 entries but the driver's
correctness harness records at most 50 per run, so the 16 newest operators
silently got no driver check at all. These tests pin the cap, the
never-checked-first ordering, and the rule that rotating an entry off the
driver board never deletes it from the contract.

Round 5 rotation: the ENTIRE 47-gate never-driver-checked backlog
(VERDICT_r04 item 1, judge-computed list, verbatim) leads the board —
after this round every gate in the contract has at least one driver
CORRECTNESS row. The three multi-round flagship parity gates keep their
seats; all 47 displaced entries banked one or more driver-green rounds
(20 in r4; 24 in r3 AND r4; 3 flagship variants r2–r4) and stay pinned by
``tools/check_entry.py --extended`` + family pytest.
"""

import __spark_entry__ as E

DRIVER_CAP = 50

# round-5 promotions: the full never-driver-checked backlog — operators
# that had NEVER received a driver CORRECTNESS row in rounds 1-4 — must
# lead the board (order matches _DRIVER_GATE; grouping is by family)
NEVER_CHECKED_R4 = [
    "adaptive_delay_hosts",
    "apportion_budget_docs",
    "cluster_sample_docs",
    "sample_repeats_docs",
    "temperature_sample_docs",
    "weighted_sample_docs",
    "stratified_split_docs",
    "corpus_diff_docs",
    "corpus_report_docs",
    "quantile_filter_docs",
    "url_score_docs",
    "dedup_counts_docs",
    "doc_line_dedup_docs",
    "ngram_containment_docs",
    "sa_rank_docs",
    "sa_repeat_spans_docs",
    "semantic_decon_docs",
    "emb_divergence_docs",
    "kmeans_step_docs",
    "srp_project_docs",
    "fix_mojibake_docs",
    "nfc_normalize_docs",
    "para_lang_docs",
    "pmi_collocations_docs",
    "rake_keywords_docs",
    "readability_docs",
    "script_profile_docs",
    "token_entropy_docs",
    "html_lang_docs",
    "kn_score_docs",
    "sb_score_docs",
    "ppl_bucket_docs",
    "ngram_prf_docs",
    "rouge_l_docs",
    "funnel_steps_events",
    "interval_join_events",
    "heavy_hitters_docs",
    "label_prop_docs",
    "reciprocity_docs",
    "trustrank_docs",
    "latest_snapshot_docs",
    "snapshot_diff_docs",
    "revisit_resolve_docs",
    "registrable_domain_docs",
    "surt_key_docs",
    "layout_health_docs",
    "shard_assign_docs",
]

# the driver board's ONE rows-only entry: the ROUGE-L token-LCS DP is
# genuinely non-SQL (SURVEY §4) — values are pinned by an exponential-
# reference replay pytest in test_keywords_eval; the driver records the
# weaker rows+schema check and the judge sees which
ROWS_ONLY_ON_BOARD = {"rouge_l_docs"}

# flagship reference-parity gates that keep a driver row every round
FLAGSHIP = [
    "crawl_bfs_order",
    "extract_pages_flagship",
    "rag_chunks",
]

# gates retired from the driver board this round. Every one banked at
# least one driver-green CORRECTNESS row (rounds listed in the rotation
# rationales in __spark_entry__._EXTENDED_GATE) and is still held green
# by the extended check + pytest.
RETIRED_R5 = [
    # two-rounds-green (r3 AND r4)
    "sample_budget_approx_docs",
    "near_dup_clusters",
    "assemble_training_docs",
    "lm_score_docs",
    "strip_spans_docs",
    "source_reputation_docs",
    "session_stats_events",
    "asof_join_events",
    "tfidf_keywords_docs",
    "split_assign_docs",
    "pack_sequences_docs",
    "semantic_dedup_docs",
    "nb_quality_docs",
    "dsir_sample_docs",
    "anchor_stats_docs",
    "redirect_resolve_docs",
    "mirror_pairs_docs",
    "recrawl_schedule_docs",
    "pq_topk_docs",
    "incr_near_dup_docs",
    "gopher_line_docs",
    "word_blocklist_docs",
    "host_boilerplate_docs",
    "contamination_pruned_docs",
    # flagship variants with three+ green rounds
    "extract_llm_path",
    "export_markdown_report",
    "trap_flags_docs",
    # round-4 first-green (one banked row; final-round backlog clear)
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

# one on-board gate per operator family — if a rotation drops a family's
# last driver-checked entry without an on-board analog, this fails before
# the driver run does. Families whose every member is driver-green in two
# or more banked rounds live in FAMILIES_BANKED below instead.
FAMILY_REPRESENTATIVES = {
    "frontier/bfs crawl": "crawl_bfs_order",
    "extract kernel": "extract_pages_flagship",
    "rag assembly": "rag_chunks",
    "chunker": "rag_chunks",  # rag_chunks replays the chunker recursion
    "relevance": "extract_pages_flagship",
    "politeness adaptation": "adaptive_delay_hosts",
    "budget apportionment": "apportion_budget_docs",
    "sampling (weighted)": "weighted_sample_docs",
    "sampling (cluster-balanced)": "cluster_sample_docs",
    "mixing (temperature)": "temperature_sample_docs",
    "mixing (epoch repeats)": "sample_repeats_docs",
    "split": "stratified_split_docs",
    "curation diff": "corpus_diff_docs",
    "corpus health": "corpus_report_docs",
    "sketch-thresholded filter": "quantile_filter_docs",
    "url filters": "url_score_docs",
    "exact dedup": "dedup_counts_docs",
    "line dedup": "doc_line_dedup_docs",
    "ngram containment / jaccard index": "ngram_containment_docs",
    "suffix array": "sa_rank_docs",
    "suffix dup spans": "sa_repeat_spans_docs",
    "decontamination": "semantic_decon_docs",
    "embedding drift": "emb_divergence_docs",
    "kmeans / ivf core": "kmeans_step_docs",
    "ann projection": "srp_project_docs",
    "mojibake repair": "fix_mojibake_docs",
    "unicode normalize": "nfc_normalize_docs",
    "paragraph lang": "para_lang_docs",
    "collocations": "pmi_collocations_docs",
    "keywords": "rake_keywords_docs",
    "readability / quality": "readability_docs",
    "script profile": "script_profile_docs",
    "token entropy": "token_entropy_docs",
    "html lang extract": "html_lang_docs",
    "lm kneser-ney": "kn_score_docs",
    "lm stupid-backoff": "sb_score_docs",
    "ppl buckets": "ppl_bucket_docs",
    "eval ngram-prf": "ngram_prf_docs",
    "eval rouge-l": "rouge_l_docs",
    "event funnels": "funnel_steps_events",
    "interval join": "interval_join_events",
    "heavy hitters": "heavy_hitters_docs",
    "graph communities": "label_prop_docs",
    "graph reciprocity": "reciprocity_docs",
    "graph trustrank": "trustrank_docs",
    "recrawl snapshots": "latest_snapshot_docs",
    "snapshot diff": "snapshot_diff_docs",
    "warc revisits": "revisit_resolve_docs",
    "registrable domain": "registrable_domain_docs",
    "surt keys": "surt_key_docs",
    "layout health": "layout_health_docs",
    "shard assignment": "shard_assign_docs",
}

# families whose on-board representative rotated out this round on banked
# multi-round (or final-round single-round) driver-green history: the
# named gate must stay oracled on the extended board
FAMILIES_BANKED = {
    "llm-path extract": "extract_llm_path",
    "markdown sink": "export_markdown_report",
    "crawl traps": "trap_flags_docs",
    "minhash/lsh near-dup": "near_dup_clusters",
    "incremental near-dup": "incr_near_dup_docs",
    "semantic dedup": "semantic_dedup_docs",
    "pq ann": "pq_topk_docs",
    "sq ann": "sq_topk_docs",
    "gopher filters": "gopher_line_docs",
    "c4 filters": "word_blocklist_docs",
    "host boilerplate": "host_boilerplate_docs",
    "budget mixing exact": "assemble_training_docs",
    "budget mixing approx": "sample_budget_approx_docs",
    "bigram lm": "lm_score_docs",
    "span strip": "strip_spans_docs",
    "source reputation": "source_reputation_docs",
    "sessionization": "session_stats_events",
    "as-of join": "asof_join_events",
    "vocab / tfidf": "tfidf_keywords_docs",
    "hash-interval split": "split_assign_docs",
    "packing": "pack_sequences_docs",
    "nb classifier": "nb_quality_docs",
    "dsir resampling": "dsir_sample_docs",
    "anchor text": "anchor_stats_docs",
    "redirect resolution": "redirect_resolve_docs",
    "mirror hosts": "mirror_pairs_docs",
    "crawl recrawl": "recrawl_schedule_docs",
    "exact decontamination": "contamination_pruned_docs",
    "zorder layout": "zorder_key_docs",
    "layout pruning": "zorder_prune_docs",
    "hilbert layout": "hilbert_key_docs",
    "compaction": "compact_plan_docs",
    "data card": "data_card_docs",
    "eval bleu": "bleu_docs",
    "eval chrf": "chrf_docs",
    "eval token-prf": "token_prf_docs",
    "inverted index / retrieval": "bm25_search_docs",
    "hybrid retrieval": "hybrid_search_docs",
    "graph bowtie": "bowtie_docs",
    "graph hits": "hits_docs",
    "graph harmonic": "harmonic_docs",
    "crawl importance": "opic_docs",
    "cms sketch": "cms_estimate_docs",
    "quantile sketch": "quantile_sketch_docs",
    "hll sketch": "hll_overlap_docs",
    "main content": "main_content_docs",
    "dust rules": "dust_rewrite_docs",
}


def test_driver_board_fits_cap():
    assert len(E.queries()) <= DRIVER_CAP


def test_never_checked_entries_lead_the_board():
    head = list(E.queries())[: len(NEVER_CHECKED_R4)]
    assert head == NEVER_CHECKED_R4


def test_flagship_gates_keep_their_seats():
    board = list(E.queries())
    assert board[len(NEVER_CHECKED_R4):] == FLAGSHIP


def test_boards_partition_the_full_query_set():
    q, qe = set(E.queries()), set(E.queries_extended())
    assert not q & qe
    assert q | qe == set(E._all_queries())


def test_every_oracle_has_a_query():
    assert set(E.oracle_sql()) <= set(E.queries())
    assert set(E.oracle_sql_extended()) <= set(E.queries_extended())


def test_driver_board_is_fully_oracled():
    """Every driver-checked entry carries a DuckDB value-hash oracle,
    except the pinned rows-only allowlist (non-SQL by design, each with a
    replay pytest pinning its values)."""
    assert set(E.queries()) - set(E.oracle_sql()) == ROWS_ONLY_ON_BOARD


def test_every_operator_family_on_driver_board():
    board = set(E.queries())
    missing = {
        fam: g for fam, g in FAMILY_REPRESENTATIVES.items() if g not in board
    }
    assert not missing, f"families without a driver-checked gate: {missing}"


def test_banked_families_stay_oracled_on_extended():
    ext_q, ext_o = set(E.queries_extended()), set(E.oracle_sql_extended())
    for fam, g in FAMILIES_BANKED.items():
        assert g in ext_q, f"{fam}: {g} fell out of the contract"
        assert g in ext_o, f"{fam}: {g} lost its oracle"


def test_retired_gates_stay_in_the_contract():
    """A rotation never deletes a gate: every round-5 retiree must still
    be runnable (and oracled) on the extended board."""
    ext_q, ext_o = set(E.queries_extended()), set(E.oracle_sql_extended())
    for g in RETIRED_R5:
        assert g in ext_q, f"{g} fell out of the contract"
        assert g in ext_o, f"{g} lost its oracle"
