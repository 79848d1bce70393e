"""Gate-board invariants (no Spark session needed).

Round 2 regression: ``queries()`` grew to 66 entries but the driver's
correctness harness records at most 50 per run, so the 16 newest operators
silently got no driver check at all. These tests pin the cap, the
never-checked-first ordering, and the rule that rotating an entry off the
driver board never deletes it from the contract.
"""

import __spark_entry__ as E

DRIVER_CAP = 50

# operators whose round-2 gate entries sat past the driver's 50-entry cap
# and therefore never received a CORRECTNESS row — they must lead the board
NEVER_CHECKED_R2 = [
    "sample_budget_approx_docs",
    "near_dup_clusters",
    "near_dup_survivors",
    "assemble_training_docs",
    "lm_score_docs",
    "dup_span_docs",
    "strip_spans_docs",
    "source_reputation_docs",
    "hll_distinct_docs",
    "session_stats_events",
    "asof_join_events",
    "vocab_topk_docs",
    "tfidf_keywords_docs",
    "split_assign_docs",
    "pack_sequences_docs",
    "canonical_url_docs",
]

# one on-board gate per operator family — if a rotation drops a family's
# last driver-checked entry, this fails before the driver run does
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
    # keyword_relevance rotated to extended in round 3: the flagship
    # extract gates value-hash the same relevance_score/reason columns
    "relevance": "extract_pages_flagship",
    # exact_dedup_docs rotated to extended in round 3: assemble_training_docs
    # replays the same min-id-per-content-hash stage inside its pipeline CTE
    "exact dedup": "assemble_training_docs",
    "anchor text": "anchor_stats_docs",
    "redirect resolution": "redirect_resolve_docs",
    "mirror hosts": "mirror_pairs_docs",
    "inverted index / phrase search": "phrase_search_docs",
    # minhash_lsh rotated to extended in round 3: near_dup_docs composes
    # the same signature + banded-bucket join before its Jaccard verify
    "minhash/lsh": "near_dup_docs",
    "two-stage near-dup": "near_dup_docs",
    # ngram_jaccard rotated to extended in round 3: near_dup_docs
    # value-hashes the same capped-Jaccard kernel in its verify stage
    "ngram jaccard": "near_dup_docs",
    "crawl recrawl": "recrawl_schedule_docs",
    "simhash": "simhash_near_dups",
    # brute-force cosine's driver evidence is the exact rerank inside the
    # ivf/lsh gates (cosine_topk itself rotated to extended in round 3)
    "cosine ann": "ivf_topk_docs",
    "pq ann": "pq_topk_docs",
    # lsh_topk_docs rotated to extended in round 3: embedding_near_dups
    # (on board) drives the same hyperplane-signature + bucket-join path
    "lsh ann": "embedding_near_dups",
    "ivf ann": "ivf_topk_docs",
    "embedding near-dup": "embedding_near_dups",
    "semantic dedup": "semantic_dedup_docs",
    # lang_id_docs rotated to extended in round 3 (driver-green rounds 1
    # and 2): lang_pred decides curate_docs survivorship on the board
    "lang id": "curate_docs",
    "incremental near-dup": "incr_near_dup_docs",
    # quality_score_docs rotated to extended in round 3: the quality
    # formula is value-hashed inside source_reputation_docs and gates
    # curate_docs survivorship
    "quality": "source_reputation_docs",
    # token_count_docs rotated to extended in round 3: pack_sequences_docs
    # value-hashes the same n_tokens column per doc
    "token count": "pack_sequences_docs",
    "fingerprint": "fingerprint_docs",
    "nb classifier": "nb_quality_docs",
    "dsir resampling": "dsir_sample_docs",
    "hashed vector": "hashed_vector_docs",
    "curation": "curate_docs",
    "multimodal": "media_features",
    # repetition_docs rotated to extended in the round-3 third wave
    # (driver-green round 2): the Gopher family's driver row is now the
    # line/symbol flags gate
    "gopher filters": "gopher_line_docs",
    # c4_flags_docs rotated likewise: the C4 family's driver row is the
    # word-blocklist gate
    "c4 filters": "word_blocklist_docs",
    "pii": "pii_redact_docs",
    "blocklist": "blocklist_docs",
    # line_dedup_docs rotated likewise: the line-level cleanup family's
    # driver row is the per-host boilerplate mine+strip gate (same
    # explode / threshold / position-ordered rebuild machinery)
    "line dedup": "host_boilerplate_docs",
    # contamination_docs swapped for its Bloom-pruned twin in round 3 —
    # same oracle SQL, so the same semantics stay driver-checked
    "decontamination": "contamination_pruned_docs",
    # sample_budget_docs rotated to extended in the round-3 fourth wave
    # (driver-green round 2): assemble_training_docs replays the same
    # exact per-source-window budget sampler stage-for-stage in its
    # pipeline CTE, so exact-mixing semantics stay driver-checked
    "budget mixing exact": "assemble_training_docs",
    "dust rule mining": "dust_rules_docs",
    "budget mixing approx": "sample_budget_approx_docs",
    "connected components": "near_dup_clusters",
    "training-set assembly": "assemble_training_docs",
    "bigram lm": "lm_score_docs",
    "dup spans": "dup_span_docs",
    "span strip": "strip_spans_docs",
    "source reputation": "source_reputation_docs",
    "hll sketch": "hll_distinct_docs",
    "sessionization": "session_stats_events",
    "as-of join": "asof_join_events",
    "vocab": "vocab_topk_docs",
    "tfidf": "tfidf_keywords_docs",
    "split": "split_assign_docs",
    "packing": "pack_sequences_docs",
    "packing firstfit": "pack_firstfit_docs",
    "canonical url": "canonical_url_docs",
    "link-graph pagerank": "pagerank_docs",
}


def test_driver_board_fits_cap():
    assert len(E.queries()) <= DRIVER_CAP


def test_never_checked_entries_lead_the_board():
    head = list(E.queries())[: len(NEVER_CHECKED_R2)]
    assert head == NEVER_CHECKED_R2


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
