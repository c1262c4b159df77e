package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.window.WindowExec

/** ENFORCING physical-plan audit over every contract query: flags the
  * plan shapes that do not survive a 100× scale-up and reports
  * join/exchange/codegen composition.
  *
  * Since r10 the audit is a GATE, not a report; r11 widened its
  * detector surface from {BNLJ, CART} to the full set of
  * single-task / quadratic collapses (r10 verdict #1):
  *
  *  1. BroadcastNestedLoopJoin / CartesianProduct counts must equal
  *     the attributed [[allowlist]] — any new, changed, or stale flag
  *     is a violation (as in r10);
  *  2. UNPARTITIONED WindowExec counts must equal [[windowAllow]] —
  *     an empty partition spec serializes the window's whole input
  *     into one task, the q_asof_join_bucketed mega-key regression
  *     generalized to every query (the allowlisted ones all run over
  *     bounded, histogram/percentile-sized relations, attributed
  *     below); this is also the enforcing replacement for the
  *     WindowExec WARN that Bench silences (r10 advice #5);
  *  3. GLOBAL SortExec counts must equal [[sortAllow]] — a global
  *     sort is a range-exchange over its whole input; outside a
  *     TakeOrdered (which never plans a SortExec) it only belongs on
  *     bounded outputs (final presentation orderBy of top-k /
  *     per-group-bounded results — every allowlisted entry);
  *  4. (shuffle, broadcast) Exchange counts must equal the
  *     [[exchangePins]] map for EVERY contract query — exchange-count
  *     drift is how a broadcast→shuffle flip, a lost bucketed read,
  *     or an accidental extra repartition shows up; plans are pinned
  *     UNEXECUTED (AdaptiveSparkPlan initial plans, so AQE runtime
  *     re-planning cannot make the pin flap) at the default audit
  *     scale. A query with no pin is itself a violation: adding a
  *     contract query forces a conscious pin (refresh with --pin).
  *  5. the exchange-pin check runs at TWO scales in one invocation
  *     (r11 verdict #3, landed r13): detectors 1-3 flag plan
  *     STRUCTURE, which size estimates never change, but join
  *     strategy IS size-estimated — a plan that broadcasts a side at
  *     sf0.001 silently flips to a shuffle join once that side's
  *     estimate crosses `spark.sql.autoBroadcastJoinThreshold`
  *     (10 MB) on grown inputs, and a single-scale pin is blind to
  *     it. [[exchangePins01]] pins the same queries at sf0.1 (the
  *     bench scale, where lineitem is 11 MB — already past the
  *     threshold sf0.001's 116 KB is far under), and --selftest
  *     proves the second scale catches a real flip with a
  *     lineitem⋈lineitem specimen that is genuinely broadcast at
  *     sf0.001 and genuinely shuffle-merge at sf0.1: pinned with its
  *     sf0.001 shape, it must audit CLEAN at the primary scale and
  *     be REJECTED at the second — the exact blindness the two-scale
  *     gate exists to remove. Structural detectors are not re-run at
  *     the second scale (structure does not move with size; exchange
  *     counts do).
  *
  * The BNLJ/CART allowlist entries are attributed one-for-one to
  * their sources (audited 2026-08-12, re-pinned 2026-08-14):
  *  - `Apply.regrid`'s unmapped-destination padding crossJoins a
  *    ONE-ROW broadcast (the zero-weight anchor cell) — constant cost
  *    at any scale (appears in every apply-family query);
  *  - `Weights.bilinear` periodic pole caps crossJoin the broadcast
  *    lon-index range — the output IS that size (ALLAVG pole spreads
  *    weight over the whole extreme row);
  *  - `q_ann_topk` / `bruteTopK` probes × corpus — the documented
  *    exact baseline, probe side filtered small and broadcast;
  *  - test-fixture field expansion (crossJoin of tiny time/lev ranges);
  *  - `Sampling.exactPercentiles` (q_length_quantiles, r8): the
  *    UNGROUPED call's |pcts|-row × tiny-histogram rank-location
  *    cross (×2 — the locating branch is referenced twice); both
  *    sides bounded by |pcts| / histogram size, never the corpus.
  *    The grouped variant (q_length_quantiles_by_source) equi-joins
  *    on the group key — zero BNLJs;
  *  - `Sketches.hllPairOverlap` (q_hll_overlap, r9): the `ga < gb`
  *    pair enumeration over the one-row-per-group estimate relation
  *    (×2 — referenced by both register-replication branches) — the
  *    same |sources|²-bounded shape as q_kmv_jaccard's pair join,
  *    never the corpus or the register file itself.
  *
  * Counts are pinned at the DEFAULT audit scale (sf0.001, 8 threads);
  * BNLJ/CART/window/sort arise from plan STRUCTURE, not size
  * estimates, and the exchange pins are taken on the initial
  * (pre-AQE) plans — all stable across runs at the default scale. If
  * you audit a different sfDir and a count moves, re-pin at the
  * default before concluding regression.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir [sfDir2]] [--selftest | --pin | --single]
  *   sfDir defaults to sf0.001 (primary: all detectors), sfDir2 to
  *   sf0.1 (second scale: exchange pins only, vs [[exchangePins01]]);
  *   --single skips the second scale (fast iteration on structural
  *   detectors — NOT the enforcing configuration);
  *   --selftest additionally injects one specimen of EVERY flagged
  *   class — a corpus×corpus cross join, an unpartitioned corpus
  *   window, a global corpus sort, an exchange-count drift, and the
  *   size-driven broadcast→shuffle threshold flip (clean at the
  *   primary scale, caught at the second) — and asserts the gate
  *   rejects each (exit 0 iff all five violations are detected and
  *   the real surface stays clean at both scales);
  *   --pin prints the current measured pin maps for BOTH scales as
  *   Scala source (no gating) for pasting here after an intentional
  *   plan change.
  */
object PlanAudit {

  /** query → expected (BNLJ, CART). Queries absent here must audit
    * clean (0, 0). Every entry is attributed in the scaladoc above. */
  val allowlist: Map[String, (Int, Int)] = Map(
    "q_ann_topk"                       -> (1, 0), // bruteTopK exact baseline: broadcast probes × corpus
    "q_attach_coords"                  -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_bigram_lm"                      -> (1, 0), // bounded vocab self-pair enumeration
    "q_broadcast_dims"                 -> (11, 0), // fixture time/lev expansion + per-slab one-row pads
    "q_dataset_map"                    -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_hll_overlap"                    -> (2, 0), // |sources|² pair enumeration, ×2 branches
    "q_kmv_jaccard"                    -> (1, 0), // |sources|² pair enumeration over k-row sketches
    "q_length_quantiles"               -> (2, 0), // |pcts| × tiny-histogram rank location, ×2 branches
    "q_locstream_nearest"              -> (4, 0), // apply-family: one-row zero-anchor pad + 3× the r16 tiny-probes broadcast argmin (crossJoin(broadcast(≤64 probes)) — bounded by NearestJoin.smallPtsMax; the W subtree is re-referenced by the apply)
    "q_regrid_conservative_curv"       -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_conservative_curv_exact" -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_curv"                    -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_regrid_locstream"               -> (10, 0), // both-direction locstream chain: per-leg one-row pads + fixture expansion + 3× the r16 tiny-probes broadcast argmin (≤64-row broadcast side, NearestJoin.smallPtsMax-bounded)
    "q_regrid_locstream_in"            -> (8, 0), // locstream-in chain: per-leg one-row pads + 3× the r16 tiny-probes broadcast argmin (≤64-row broadcast side, NearestJoin.smallPtsMax-bounded)
    "q_spmm_apply"                     -> (1, 0), // apply-family: one-row zero-anchor pad
    "q_unmapped_zero"                  -> (1, 0), // the pad IS the query under test
    "q_w_bilinear_peri"                -> (2, 0), // periodic pole caps × broadcast lon range (N+S)
  )

  /** query → expected UNPARTITIONED WindowExec count (absent = 0).
    * Populated by --pin and attributed: every entry below is a
    * prefix-sum / rank window over a BOUNDED relation (per-bucket
    * histograms, |pcts|-row rank sets, per-threshold sweeps), never
    * the corpus. */
  val windowAllow: Map[String, Int] = Map(
    // all attributed bounded relations: rank/prefix-sum windows over
    // nBuckets-row offsets (shuffle_order), per-partition winner sets
    // (weighted_sample), #sources-row mix recipes (mix_*), per-term
    // top-k candidate sets (bm25/vocab), |pcts|/histogram rank rows
    // (length_quantiles) — never the corpus
    "q_bm25_topk" -> 3,
    "q_length_quantiles" -> 2,
    "q_mix_apply" -> 1,
    "q_mix_weights" -> 1,
    "q_mix_weights_tau" -> 3,
    "q_shuffle_order" -> 1,
    "q_vocab_topk" -> 1,
    "q_weighted_sample" -> 1,
  )

  /** query → expected GLOBAL SortExec count (absent = 0). Every entry
    * is a final presentation orderBy over a bounded output (top-k
    * serving results, per-group-bounded reports, percentile rows). */
  val sortAllow: Map[String, Int] = Map(
    // one final presentation orderBy per query over its bounded
    // output (top-k serving results, per-group reports, percentile
    // rows — the deterministic-dump discipline Verify relies on);
    // queries absent here plan ZERO global sorts
    "q_ann_filtered" -> 1,
    "q_ann_filtered_persisted" -> 1,
    "q_ann_ivf" -> 1,
    "q_ann_ivf_learned" -> 1,
    "q_ann_ivf_learned_mp" -> 1,
    "q_ann_ivf_mp" -> 1,
    "q_ann_ivf_persisted" -> 1,
    "q_ann_pq" -> 1,
    "q_ann_pq_mp" -> 1,
    "q_ann_pq_persisted" -> 1,
    "q_ann_pq_rerank" -> 1,
    "q_ann_refresh_serve" -> 1,
    "q_ann_topk" -> 1,
    "q_asof_join" -> 1,
    "q_asof_join_bucketed" -> 1,
    "q_attach_coords" -> 1,
    "q_auc_merged" -> 1,
    "q_auc_weighted" -> 1,
    "q_audio_decode" -> 1,
    "q_audio_resample" -> 1,
    "q_bigram_lm" -> 1,
    "q_bloom_merge" -> 1,
    "q_bpe_apply" -> 1,
    "q_bpe_train" -> 1,
    "q_broadcast_dims" -> 1,
    "q_calibration" -> 1,
    "q_calibration_hist" -> 1,
    "q_centroid_refresh" -> 1,
    "q_chunk_docs" -> 1,
    "q_classifier_auc" -> 1,
    "q_cm_frequency" -> 1,
    "q_cm_merge" -> 1,
    "q_corpus_append" -> 1,
    "q_corpus_diff" -> 1,
    "q_corpus_layout" -> 1,
    "q_corpus_report" -> 1,
    "q_corpus_rollup" -> 1,
    "q_corpus_zorder" -> 1,
    "q_dataset_map" -> 1,
    "q_decontam" -> 1,
    "q_decontam_bloom" -> 1,
    "q_decontam_fuzzy" -> 1,
    "q_decontam_keep" -> 1,
    "q_decontam_semantic" -> 1,
    "q_dedup_clusters" -> 1,
    "q_dedup_exact" -> 1,
    "q_dedup_incremental" -> 1,
    "q_dedup_keep_best" -> 1,
    "q_dedup_minhash" -> 1,
    "q_doc_fingerprint" -> 1,
    "q_dupspan" -> 1,
    "q_dupspan_scrub" -> 1,
    "q_embedding_cosine" -> 1,
    "q_embedding_cosine_lsh" -> 1,
    "q_embedding_cosine_lsh_recall" -> 1,
    "q_embedding_robust_stats" -> 1,
    "q_embedding_stats" -> 1,
    "q_events_funnel" -> 1,
    "q_events_funnel_steps" -> 1,
    "q_events_retention" -> 1,
    "q_events_sessions" -> 1,
    "q_events_window" -> 1,
    "q_graph_pagerank" -> 1,
    "q_graph_triangles" -> 1,
    "q_hll_distinct" -> 1,
    "q_hll_merge" -> 1,
    "q_hll_overlap" -> 1,
    "q_image_neardup" -> 1,
    "q_item_cooccurrence" -> 1,
    "q_kmeans" -> 1,
    "q_kmeans_twolevel" -> 1,
    "q_kmv_distinct" -> 1,
    "q_kmv_jaccard" -> 1,
    "q_lang_id" -> 1,
    "q_length_quantiles" -> 1,
    "q_length_quantiles_by_source" -> 1,
    "q_lineitem_pricing" -> 1,
    "q_local_supplier_volume" -> 1,
    "q_locstream_nearest" -> 1,
    "q_minhash_bands_stateless" -> 1,
    "q_minhash_sig" -> 1,
    "q_mix_apply" -> 1,
    "q_mix_weights" -> 1,
    "q_mix_weights_tau" -> 1,
    "q_multimodal_decode" -> 1,
    "q_multimodal_frames" -> 1,
    "q_multimodal_gradient" -> 1,
    "q_multimodal_gradient_resize" -> 1,
    "q_multimodal_meta" -> 1,
    "q_multimodal_resize" -> 1,
    "q_ngram_jaccard" -> 1,
    "q_ngram_jaccard_capped" -> 1,
    "q_oov_rate" -> 1,
    "q_orders_revenue" -> 1,
    "q_pack_greedy" -> 1,
    "q_pack_stats" -> 1,
    "q_phrase_search" -> 1,
    "q_pii_redact" -> 1,
    "q_pipeline_e2e" -> 1,
    "q_pr_curve" -> 1,
    "q_quality_classifier" -> 1,
    "q_quality_score" -> 1,
    "q_quantiles_merged" -> 1,
    "q_range_join" -> 1,
    "q_regrid_conservative_curv" -> 1,
    "q_regrid_conservative_curv_exact" -> 1,
    "q_regrid_curv" -> 1,
    "q_regrid_locstream" -> 1,
    "q_regrid_locstream_in" -> 1,
    "q_repetition" -> 1,
    "q_rolling_anomaly" -> 1,
    "q_sample_stratified" -> 1,
    "q_sample_stratum_topk" -> 1,
    "q_semantic_dedup" -> 1,
    "q_shuffle_order" -> 1,
    "q_simhash" -> 1,
    "q_simhash_neardup" -> 1,
    "q_skew_report" -> 1,
    "q_split_assign" -> 1,
    "q_spmm_apply" -> 1,
    "q_strip_markup" -> 1,
    "q_text_tokens" -> 1,
    "q_tokens_bpe" -> 1,
    "q_unmapped_zero" -> 1,
    "q_vocab_topk" -> 1,
    "q_w_bilinear" -> 1,
    "q_w_bilinear_curv" -> 1,
    "q_w_bilinear_curv_peri" -> 1,
    "q_w_bilinear_nonuniform" -> 1,
    "q_w_bilinear_nonuniform_peri" -> 1,
    "q_w_bilinear_peri" -> 1,
    "q_w_conservative" -> 1,
    "q_w_conservative_curv" -> 1,
    "q_w_conservative_curv_exact" -> 1,
    "q_w_nearest_d2s" -> 1,
    "q_w_nearest_s2d" -> 1,
    "q_w_patch" -> 1,
    "q_w_patch_curv" -> 1,
    "q_w_patch_nonuniform" -> 1,
    "q_w_patch_nonuniform_peri" -> 1,
    "q_weighted_sample" -> 1,
    "q_weights_read" -> 1,
    "q_weights_read_nc" -> 1,
  )

  /** query → pinned (ShuffleExchange, BroadcastExchange) counts on the
    * initial (pre-AQE) plan at the PRIMARY audit scale (sf0.001).
    * EVERY contract query must have a pin (a missing pin is a
    * violation — refresh with --pin after an intentional plan change).
    * [[exchangePins01]] holds the same queries' pins at the second
    * scale (detector 5 above). */
    val exchangePins: Map[String, (Int, Int)] = Map(
    "q_ann_filtered" -> (2, 1),
    "q_ann_filtered_persisted" -> (2, 5),
    "q_ann_ivf" -> (2, 1),
    "q_ann_ivf_learned" -> (4, 2),
    "q_ann_ivf_learned_mp" -> (4, 2),
    "q_ann_ivf_mp" -> (2, 1),
    "q_ann_ivf_persisted" -> (4, 2),
    "q_ann_pq" -> (2, 5),
    "q_ann_pq_mp" -> (2, 5),
    "q_ann_pq_persisted" -> (2, 5),
    "q_ann_pq_rerank" -> (2, 7),
    "q_ann_refresh_serve" -> (2, 5),
    "q_ann_topk" -> (2, 1),
    "q_asof_join" -> (2, 0),
    "q_asof_join_bucketed" -> (5, 1),
    "q_attach_coords" -> (5, 4),
    "q_auc_merged" -> (7, 1),
    "q_auc_weighted" -> (7, 1),
    "q_audio_decode" -> (2, 0),
    "q_audio_resample" -> (2, 0),
    "q_bigram_lm" -> (10, 3),
    "q_bloom_merge" -> (4, 1),
    "q_bm25_topk" -> (5, 1),
    "q_bpe_apply" -> (2, 1),
    "q_bpe_train" -> (1, 0),
    "q_broadcast_dims" -> (5, 7),
    "q_calibration" -> (2, 0),
    "q_calibration_hist" -> (3, 0),
    "q_centroid_refresh" -> (1, 0),
    "q_chunk_docs" -> (1, 0),
    "q_classifier_auc" -> (7, 1),
    "q_cm_frequency" -> (4, 3),
    "q_cm_merge" -> (4, 3),
    "q_corpus_append" -> (2, 0),
    "q_corpus_diff" -> (3, 0),
    "q_corpus_layout" -> (2, 0),
    "q_corpus_report" -> (3, 0),
    "q_corpus_rollup" -> (2, 0),
    "q_corpus_zorder" -> (2, 0),
    "q_dataset_map" -> (5, 3),
    "q_decontam" -> (7, 1),
    "q_decontam_bloom" -> (5, 1),
    "q_decontam_fuzzy" -> (7, 1),
    "q_decontam_keep" -> (4, 2),
    "q_decontam_semantic" -> (1, 1),
    "q_dedup_clusters" -> (1, 0),
    "q_dedup_exact" -> (2, 0),
    "q_dedup_incremental" -> (23, 12),
    "q_dedup_keep_best" -> (3, 1),
    "q_dedup_minhash" -> (18, 3),
    "q_doc_fingerprint" -> (1, 0),
    "q_dupspan" -> (5, 1),
    "q_dupspan_scrub" -> (3, 2),
    "q_embedding_cosine" -> (3, 1),
    "q_embedding_cosine_lsh" -> (2, 3),
    "q_embedding_cosine_lsh_recall" -> (2, 3),
    "q_embedding_robust_stats" -> (1, 0),
    "q_embedding_stats" -> (2, 0),
    "q_events_funnel" -> (7, 4),
    "q_events_funnel_steps" -> (7, 4),
    "q_events_retention" -> (4, 1),
    "q_events_sessions" -> (2, 0),
    "q_events_window" -> (3, 0),
    "q_flatten_idx" -> (0, 0),
    "q_graph_pagerank" -> (1, 0),
    "q_graph_triangles" -> (1, 0),
    "q_grid_1d" -> (0, 0),
    "q_grid_2d" -> (0, 0),
    "q_grid_global" -> (0, 0),
    "q_hll_distinct" -> (10, 2),
    "q_hll_merge" -> (3, 0),
    "q_hll_overlap" -> (23, 6),
    "q_image_neardup" -> (2, 1),
    "q_item_cooccurrence" -> (8, 3),
    "q_kmeans" -> (1, 0),
    "q_kmeans_twolevel" -> (1, 0),
    "q_kmv_distinct" -> (6, 0),
    "q_kmv_jaccard" -> (13, 4),
    "q_lang_id" -> (1, 0),
    "q_length_quantiles" -> (10, 4),
    "q_length_quantiles_by_source" -> (11, 4),
    "q_lineitem_pricing" -> (2, 0),
    "q_local_supplier_volume" -> (2, 5),
    "q_locstream_nearest" -> (5, 3),
    "q_minhash_bands_stateless" -> (1, 0),
    "q_minhash_sig" -> (3, 0),
    "q_mix_apply" -> (4, 1),
    "q_mix_weights" -> (2, 0),
    "q_mix_weights_tau" -> (6, 0),
    "q_multimodal_decode" -> (2, 0),
    "q_multimodal_frames" -> (2, 0),
    "q_multimodal_gradient" -> (2, 0),
    "q_multimodal_gradient_resize" -> (2, 0),
    "q_multimodal_meta" -> (1, 0),
    "q_multimodal_resize" -> (2, 0),
    "q_ngram_jaccard" -> (12, 3),
    "q_ngram_jaccard_capped" -> (16, 7),
    "q_ngram_topk" -> (3, 0),
    "q_oov_rate" -> (3, 1),
    "q_orders_revenue" -> (2, 2),
    "q_pack_greedy" -> (2, 0),
    "q_pack_stats" -> (3, 0),
    "q_phrase_search" -> (3, 1),
    "q_pii_redact" -> (1, 0),
    "q_pipeline_e2e" -> (7, 3),
    "q_pr_curve" -> (7, 1),
    "q_quality_classifier" -> (1, 0),
    "q_quality_score" -> (1, 0),
    "q_quantiles_merged" -> (15, 4),
    "q_range_join" -> (1, 1),
    "q_regrid_conservative_curv" -> (5, 3),
    "q_regrid_conservative_curv_exact" -> (5, 3),
    "q_regrid_curv" -> (6, 2),
    "q_regrid_locstream" -> (17, 12),
    "q_regrid_locstream_in" -> (9, 6),
    "q_repetition" -> (1, 0),
    "q_rolling_anomaly" -> (2, 0),
    "q_sample_stratified" -> (2, 0),
    "q_sample_stratum_topk" -> (3, 0),
    "q_semantic_dedup" -> (3, 0),
    "q_shipping_priority" -> (1, 2),
    "q_shuffle_order" -> (4, 1),
    "q_simhash" -> (3, 0),
    "q_simhash_neardup" -> (2, 1),
    "q_skew_report" -> (3, 0),
    "q_split_assign" -> (1, 0),
    "q_spmm_apply" -> (5, 3),
    "q_strip_markup" -> (1, 0),
    "q_text_tokens" -> (1, 0),
    "q_tokens_bpe" -> (1, 0),
    "q_unmapped_zero" -> (5, 3),
    "q_vocab_topk" -> (1, 0),
    "q_w_bilinear" -> (1, 0),
    "q_w_bilinear_curv" -> (2, 0),
    "q_w_bilinear_curv_peri" -> (2, 0),
    "q_w_bilinear_nonuniform" -> (0, 3),
    "q_w_bilinear_nonuniform_peri" -> (0, 3),
    "q_w_bilinear_peri" -> (1, 0),
    "q_w_conservative" -> (1, 0),
    "q_w_conservative_curv" -> (1, 1),
    "q_w_conservative_curv_exact" -> (1, 1),
    "q_w_nearest_d2s" -> (1, 0),
    "q_w_nearest_s2d" -> (1, 0),
    "q_w_patch" -> (0, 0),
    "q_w_patch_curv" -> (2, 0),
    "q_w_patch_nonuniform" -> (0, 3),
    "q_w_patch_nonuniform_peri" -> (0, 3),
    "q_wave_smooth" -> (0, 0),
    "q_weighted_sample" -> (1, 0),
    "q_weights_read" -> (1, 0),
    "q_weights_read_nc" -> (1, 0),
  )

  /** query → pinned (ShuffleExchange, BroadcastExchange) counts at the
    * SECOND audit scale (sf0.1, the bench scale) — detector 5.
    * Refreshed by the same --pin invocation that refreshes
    * [[exchangePins]]. Where an entry differs from the sf0.001 pin,
    * the difference is a real size-driven plan change (an
    * auto-broadcast decision made on grown estimates) that is now
    * consciously pinned instead of invisible. */
    val exchangePins01: Map[String, (Int, Int)] = Map(
    "q_ann_filtered" -> (2, 1),
    "q_ann_filtered_persisted" -> (2, 5),
    "q_ann_ivf" -> (2, 1),
    "q_ann_ivf_learned" -> (4, 2),
    "q_ann_ivf_learned_mp" -> (4, 2),
    "q_ann_ivf_mp" -> (2, 1),
    "q_ann_ivf_persisted" -> (4, 2),
    "q_ann_pq" -> (2, 5),
    "q_ann_pq_mp" -> (2, 5),
    "q_ann_pq_persisted" -> (2, 5),
    "q_ann_pq_rerank" -> (2, 7),
    "q_ann_refresh_serve" -> (2, 5),
    "q_ann_topk" -> (2, 1),
    "q_asof_join" -> (2, 0),
    "q_asof_join_bucketed" -> (5, 1),
    "q_attach_coords" -> (4, 4),
    "q_auc_merged" -> (7, 1),
    "q_auc_weighted" -> (7, 1),
    "q_audio_decode" -> (2, 0),
    "q_audio_resample" -> (2, 0),
    "q_bigram_lm" -> (10, 3),
    "q_bloom_merge" -> (4, 1),
    "q_bm25_topk" -> (5, 1),
    "q_bpe_apply" -> (2, 1),
    "q_bpe_train" -> (1, 0),
    "q_broadcast_dims" -> (5, 7),
    "q_calibration" -> (2, 0),
    "q_calibration_hist" -> (3, 0),
    "q_centroid_refresh" -> (1, 0),
    "q_chunk_docs" -> (1, 0),
    "q_classifier_auc" -> (7, 1),
    "q_cm_frequency" -> (4, 3),
    "q_cm_merge" -> (4, 3),
    "q_corpus_append" -> (2, 0),
    "q_corpus_diff" -> (3, 0),
    "q_corpus_layout" -> (2, 0),
    "q_corpus_report" -> (3, 0),
    "q_corpus_rollup" -> (2, 0),
    "q_corpus_zorder" -> (2, 0),
    "q_dataset_map" -> (4, 3),
    "q_decontam" -> (7, 1),
    "q_decontam_bloom" -> (5, 1),
    "q_decontam_fuzzy" -> (7, 1),
    "q_decontam_keep" -> (4, 2),
    "q_decontam_semantic" -> (1, 1),
    "q_dedup_clusters" -> (1, 0),
    "q_dedup_exact" -> (2, 0),
    "q_dedup_incremental" -> (23, 12),
    "q_dedup_keep_best" -> (3, 1),
    "q_dedup_minhash" -> (18, 3),
    "q_doc_fingerprint" -> (1, 0),
    "q_dupspan" -> (5, 1),
    "q_dupspan_scrub" -> (3, 2),
    "q_embedding_cosine" -> (3, 1),
    "q_embedding_cosine_lsh" -> (2, 3),
    "q_embedding_cosine_lsh_recall" -> (2, 3),
    "q_embedding_robust_stats" -> (1, 0),
    "q_embedding_stats" -> (2, 0),
    "q_events_funnel" -> (7, 4),
    "q_events_funnel_steps" -> (7, 4),
    "q_events_retention" -> (4, 1),
    "q_events_sessions" -> (2, 0),
    "q_events_window" -> (3, 0),
    "q_flatten_idx" -> (0, 0),
    "q_graph_pagerank" -> (1, 0),
    "q_graph_triangles" -> (1, 0),
    "q_grid_1d" -> (0, 0),
    "q_grid_2d" -> (0, 0),
    "q_grid_global" -> (0, 0),
    "q_hll_distinct" -> (10, 2),
    "q_hll_merge" -> (3, 0),
    "q_hll_overlap" -> (23, 6),
    "q_image_neardup" -> (2, 1),
    "q_item_cooccurrence" -> (8, 3),
    "q_kmeans" -> (1, 0),
    "q_kmeans_twolevel" -> (1, 0),
    "q_kmv_distinct" -> (6, 0),
    "q_kmv_jaccard" -> (13, 4),
    "q_lang_id" -> (1, 0),
    "q_length_quantiles" -> (10, 4),
    "q_length_quantiles_by_source" -> (11, 4),
    "q_lineitem_pricing" -> (2, 0),
    "q_local_supplier_volume" -> (2, 5),
    "q_locstream_nearest" -> (5, 3),
    "q_minhash_bands_stateless" -> (1, 0),
    "q_minhash_sig" -> (3, 0),
    "q_mix_apply" -> (4, 1),
    "q_mix_weights" -> (2, 0),
    "q_mix_weights_tau" -> (6, 0),
    "q_multimodal_decode" -> (2, 0),
    "q_multimodal_frames" -> (2, 0),
    "q_multimodal_gradient" -> (2, 0),
    "q_multimodal_gradient_resize" -> (2, 0),
    "q_multimodal_meta" -> (1, 0),
    "q_multimodal_resize" -> (2, 0),
    "q_ngram_jaccard" -> (12, 3),
    "q_ngram_jaccard_capped" -> (16, 7),
    "q_ngram_topk" -> (3, 0),
    "q_oov_rate" -> (3, 1),
    "q_orders_revenue" -> (2, 2),
    "q_pack_greedy" -> (2, 0),
    "q_pack_stats" -> (3, 0),
    "q_phrase_search" -> (3, 1),
    "q_pii_redact" -> (1, 0),
    "q_pipeline_e2e" -> (7, 3),
    "q_pr_curve" -> (7, 1),
    "q_quality_classifier" -> (1, 0),
    "q_quality_score" -> (1, 0),
    "q_quantiles_merged" -> (15, 4),
    "q_range_join" -> (1, 1),
    "q_regrid_conservative_curv" -> (5, 3),
    "q_regrid_conservative_curv_exact" -> (5, 3),
    "q_regrid_curv" -> (6, 2),
    "q_regrid_locstream" -> (17, 12),
    "q_regrid_locstream_in" -> (9, 6),
    "q_repetition" -> (1, 0),
    "q_rolling_anomaly" -> (2, 0),
    "q_sample_stratified" -> (2, 0),
    "q_sample_stratum_topk" -> (3, 0),
    "q_semantic_dedup" -> (3, 0),
    "q_shipping_priority" -> (1, 2),
    "q_shuffle_order" -> (4, 1),
    "q_simhash" -> (3, 0),
    "q_simhash_neardup" -> (2, 1),
    "q_skew_report" -> (3, 0),
    "q_split_assign" -> (1, 0),
    "q_spmm_apply" -> (4, 3),
    "q_strip_markup" -> (1, 0),
    "q_text_tokens" -> (1, 0),
    "q_tokens_bpe" -> (1, 0),
    "q_unmapped_zero" -> (5, 3),
    "q_vocab_topk" -> (1, 0),
    "q_w_bilinear" -> (1, 0),
    "q_w_bilinear_curv" -> (2, 0),
    "q_w_bilinear_curv_peri" -> (2, 0),
    "q_w_bilinear_nonuniform" -> (0, 3),
    "q_w_bilinear_nonuniform_peri" -> (0, 3),
    "q_w_bilinear_peri" -> (1, 0),
    "q_w_conservative" -> (0, 0),
    "q_w_conservative_curv" -> (1, 1),
    "q_w_conservative_curv_exact" -> (1, 1),
    "q_w_nearest_d2s" -> (1, 0),
    "q_w_nearest_s2d" -> (1, 0),
    "q_w_patch" -> (0, 0),
    "q_w_patch_curv" -> (2, 0),
    "q_w_patch_nonuniform" -> (0, 3),
    "q_w_patch_nonuniform_peri" -> (0, 3),
    "q_wave_smooth" -> (0, 0),
    "q_weighted_sample" -> (1, 0),
    "q_weights_read" -> (1, 0),
    "q_weights_read_nc" -> (1, 0),
  )

  /** Recursive physical-plan walk that sees through AQE wrappers
    * (memory: AQE hides scans inside QueryStageExec leaves) but does
    * NOT descend into ReusedExchangeExec (its target is counted where
    * it is defined). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(p)
    case _ => p +: p.children.flatMap(walk)
  }

  private case class Shape(bnlj: Int, cart: Int, unpartWin: Int,
                           globalSort: Int, shuffle: Int, bcast: Int,
                           summary: String)

  private def shapeOf(df: DataFrame): Shape = {
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    def n(p: String) = PlanScan.opCount(s, p)
    val nodes = walk(plan)
    Shape(
      bnlj = n("BroadcastNestedLoopJoin"),
      cart = n("CartesianProduct"),
      unpartWin = nodes.count {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      },
      globalSort = nodes.count {
        case so: SortExec => so.global
        case _ => false
      },
      shuffle = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      bcast = nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      summary = Seq(
        "BHJ" -> n("BroadcastHashJoin"), "SMJ" -> n("SortMergeJoin"),
        "SHJ" -> n("ShuffledHashJoin"), "BNLJ" -> n("BroadcastNestedLoopJoin"),
        "CART" -> n("CartesianProduct"), "WSCG" -> n("WholeStageCodegen"))
        .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" "))
  }

  /** One audit pass over the contract queries (+ `injected` specimens)
    * at `sfDir`. Structural detectors (BNLJ/CART allowlist,
    * unpartitioned windows, global sorts) run only when `structural`
    * — plan structure does not move with input size, so they are
    * audited once at the primary scale; exchange counts gate against
    * `pins ++ injectedPins` at EVERY scale (detector 5). Returns the
    * violations (prefixed with `tag`) and the measured shapes for
    * --pin. */
  private def auditPass(spark: SparkSession, sfDir: String, tag: String,
                        pins: Map[String, (Int, Int)],
                        injected: Seq[(String, (SparkSession, String) => DataFrame)],
                        injectedPins: Map[String, (Int, Int)],
                        structural: Boolean, pinMode: Boolean)
      : (Seq[String], scala.collection.immutable.ListMap[String, Shape]) = {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val pinned = scala.collection.mutable.LinkedHashMap.empty[String, Shape]
    val audited: Seq[(String, (SparkSession, String) => DataFrame)] =
      graft.SparkEntry.queries.toSeq.sortBy(_._1) ++ injected
    val pfx = if (tag.isEmpty) "" else s"$tag "
    audited.foreach { case (name, fn) =>
      try {
        val sh = shapeOf(fn(spark, sfDir))
        pinned(name) = sh
        val isInjected = name.startsWith("zz_selftest_")
        val flags = scala.collection.mutable.ArrayBuffer.empty[String]
        if (structural) {
          val expected = allowlist.getOrElse(name, (0, 0))
          val expWin = windowAllow.getOrElse(name, 0)
          val expSort = sortAllow.getOrElse(name, 0)
          if ((sh.bnlj, sh.cart) != expected)
            flags += s"(BNLJ=${sh.bnlj}, CART=${sh.cart}) != allowlisted $expected"
          if (sh.unpartWin != expWin)
            flags += s"unpartitioned windows ${sh.unpartWin} != allowlisted $expWin (single-task collapse risk)"
          if (sh.globalSort != expSort)
            flags += s"global sorts ${sh.globalSort} != allowlisted $expSort (whole-input range exchange)"
        }
        if (!pinMode) {
          (pins ++ injectedPins).get(name) match {
            case Some(pin) if (sh.shuffle, sh.bcast) != pin =>
              flags += s"exchanges (shuffle=${sh.shuffle}, bcast=${sh.bcast}) drifted from pinned $pin"
            case None if !isInjected =>
              flags += s"no exchange pin at this scale — run --pin and commit the refreshed maps"
            case _ => ()
          }
        }
        flags.foreach(f => violations += s"$pfx$name: $f")
        val mark = if (flags.nonEmpty) "  <-- VIOLATION: " + flags.mkString("; ")
          else if (structural && sh.bnlj + sh.cart + sh.unpartWin + sh.globalSort > 0) "  (allowlisted)"
          else ""
        println(f"$pfx$name%-28s ${sh.summary} SHX=${sh.shuffle} BCX=${sh.bcast} UW=${sh.unpartWin} GS=${sh.globalSort}$mark")
      } catch { case e: Throwable =>
        violations += s"$pfx$name: PLAN ERROR ${e.getMessage.take(120)}"
        println(f"$pfx$name%-28s PLAN ERROR: ${e.getMessage.take(120)}")
      }
    }
    (violations.toSeq, scala.collection.immutable.ListMap(pinned.toSeq: _*))
  }

  /** The threshold-flip specimen (detector 5's selftest): a
    * lineitem⋈lineitem equi-join whose build side sits far under the
    * 10 MB auto-broadcast threshold at sf0.001 (116 KB → BHJ, zero
    * shuffles) and far over it at sf0.1 (11 MB → SortMergeJoin, two
    * shuffles). Pinned with its sf0.001 shape at BOTH scales
    * ([[threshFlipPin]]), it must audit clean at the primary scale and
    * be rejected at the second — the size-driven flip a single-scale
    * pin is blind to. */
  private val threshFlip: (SparkSession, String) => DataFrame = (s, dir) => {
    // both sides keep EVERY column: Spark scales a projected side's
    // size estimate by the column-pruning ratio, which would drag the
    // 10.8 MB sf0.1 file back under the 10 MB threshold and un-flip
    // the specimen — the full relation is what genuinely crosses it
    val l = s.read.parquet(s"$dir/lineitem.parquet")
    val r = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_quantity", "q2")
    l.join(r, Seq("l_orderkey"))
  }

  /** The specimen's measured sf0.001 shape (BHJ: 0 shuffles, 1
    * broadcast) — deliberately also used as its sf0.1 pin so the
    * second-scale audit must flag the drift. */
  private val threshFlipPin: (Int, Int) = (0, 1)

  def main(args: Array[String]): Unit = {
    val selftest = args.contains("--selftest")
    val pinMode = args.contains("--pin")
    val single = args.contains("--single") && !selftest // selftest IS the two-scale gate
    val dirs = args.filterNot(_.startsWith("--"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val sfDir2 = dirs.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val injected1: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (!selftest) Nil else Seq(
        "zz_selftest_crossjoin" -> ((s: SparkSession, dir: String) => {
          val d = s.read.parquet(s"$dir/documents.parquet")
          d.as("a").crossJoin(d.as("b")) // deliberate corpus × corpus
        }),
        "zz_selftest_window" -> ((s: SparkSession, dir: String) => {
          // deliberate UNPARTITIONED window over the corpus — the
          // single-task collapse detector must reject it
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.{col, row_number}
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
        }),
        "zz_selftest_sort" -> ((s: SparkSession, dir: String) => {
          // deliberate global corpus sort outside a TakeOrdered
          s.read.parquet(s"$dir/documents.parquet").orderBy("doc_id")
        }),
        "zz_selftest_exchdrift" -> ((s: SparkSession, dir: String) => {
          // pinned below as (0, 0) exchanges, but plans one shuffle —
          // the drift detector must reject the mismatch
          s.read.parquet(s"$dir/documents.parquet")
            .groupBy("lang").count()
        }),
        "zz_selftest_threshflip" -> threshFlip)
    // --pin also plans the flip specimen (both scales) so its measured
    // shapes print next to the maps, keeping threshFlipPin honest
    val pinExtra: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (pinMode && !selftest) Seq("zz_selftest_threshflip" -> threshFlip) else Nil
    val injectedPins1: Map[String, (Int, Int)] =
      if (selftest) Map("zz_selftest_exchdrift" -> (0, 0),
        "zz_selftest_threshflip" -> threshFlipPin)
      else Map.empty
    // second scale: only the flip specimen (the four structural
    // specimens are size-independent — re-injecting them would just
    // re-prove the primary pass), pinned with the STALE sf0.001 shape
    val injected2: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (selftest) Seq("zz_selftest_threshflip" -> threshFlip) else Nil
    val injectedPins2: Map[String, (Int, Int)] =
      if (selftest) Map("zz_selftest_threshflip" -> threshFlipPin) else Map.empty

    val (vio1raw, pinned1) = auditPass(spark, sfDir, "",
      exchangePins, injected1 ++ pinExtra, injectedPins1, structural = true, pinMode)
    val vio1 = scala.collection.mutable.ArrayBuffer(vio1raw: _*)

    // an allowlist/pin entry whose query vanished is stale — also a violation
    (allowlist.keys ++ windowAllow.keys ++ sortAllow.keys ++
      exchangePins.keys ++ exchangePins01.keys)
      .filterNot(_.startsWith("zz_selftest_"))
      .filterNot(graft.SparkEntry.queries.contains).toSeq.distinct.foreach { k =>
        vio1 += s"$k: allowlisted/pinned but no longer a contract query (stale entry)"
      }
    // targeted skew guard (r8 verdict #7): the bucketed as-of variant
    // exists precisely so one mega key cannot serialize into a single
    // window task — assert its physical Window really partitions by
    // (key, __b), i.e. the bucket column survives into the window
    // spec. A refactor that dropped __b from the partition list would
    // still be result-correct (hash gate blind) but single-task again.
    locally {
      val plan = graft.SparkEntry.queries("q_asof_join_bucketed")(spark, sfDir)
        .queryExecution.executedPlan.toString
      val winPartitionedByBucket =
        "(?s)Window .*windowspecdefinition\\([^)]*__b".r.findFirstIn(plan).isDefined
      if (!winPartitionedByBucket) {
        vio1 += "q_asof_join_bucketed: window not partitioned by (key, __b) — mega-key serialization regression"
        println("q_asof_join_bucketed  <-- WINDOW NOT PARTITIONED BY (key, __b): mega-key serialization regression")
      } else println("q_asof_join_bucketed window partitioned by (key, __b): OK")
    }

    val (vio2, pinned2) =
      if (single) (Seq.empty[String], scala.collection.immutable.ListMap.empty[String, Shape])
      else {
        println(s"== second scale: $sfDir2 (exchange pins only)")
        auditPass(spark, sfDir2, s"[sf2]",
          exchangePins01, injected2 ++ pinExtra, injectedPins2, structural = false, pinMode)
      }
    spark.stop()

    if (pinMode) {
      println("== --pin: paste the maps below into PlanAudit ==")
      val real1 = pinned1.toSeq.filterNot(_._1.startsWith("zz_selftest_"))
      val real2 = pinned2.toSeq.filterNot(_._1.startsWith("zz_selftest_"))
      def fmtPos(m: Seq[(String, Int)]): String = m.filter(_._2 > 0)
        .map { case (k, v) => s"""    "$k" -> $v,""" }.mkString("\n")
      println("  val windowAllow: Map[String, Int] = Map(")
      println(fmtPos(real1.map { case (k, sh) => (k, sh.unpartWin) }))
      println("  )")
      println("  val sortAllow: Map[String, Int] = Map(")
      println(fmtPos(real1.map { case (k, sh) => (k, sh.globalSort) }))
      println("  )")
      println("  val exchangePins: Map[String, (Int, Int)] = Map(")
      real1.foreach { case (k, sh) =>
        println(s"""    "$k" -> (${sh.shuffle}, ${sh.bcast}),""")
      }
      println("  )")
      if (real2.nonEmpty) {
        println("  val exchangePins01: Map[String, (Int, Int)] = Map(")
        real2.foreach { case (k, sh) =>
          println(s"""    "$k" -> (${sh.shuffle}, ${sh.bcast}),""")
        }
        println("  )")
      }
      // the specimen's measured shapes, for keeping threshFlipPin honest
      (pinned1.get("zz_selftest_threshflip"), pinned2.get("zz_selftest_threshflip")) match {
        case (Some(a), Some(b)) => println(
          s"  // threshflip specimen: primary (${a.shuffle}, ${a.bcast}) / second scale (${b.shuffle}, ${b.bcast})")
        case _ => ()
      }
      return
    }

    if (selftest) {
      val mustCatch = Map(
        "zz_selftest_crossjoin" -> "CART",
        "zz_selftest_window" -> "unpartitioned windows",
        "zz_selftest_sort" -> "global sorts",
        "zz_selftest_exchdrift" -> "drifted")
      val missed = mustCatch.filterNot { case (q, frag) =>
        vio1.exists(v => v.startsWith(q) && v.contains(frag))
      }
      // the flip must be INVISIBLE at the primary scale (that is the
      // blindness being demonstrated) and CAUGHT at the second
      val flipFalseAlarm = vio1.filter(_.startsWith("zz_selftest_threshflip"))
      val flipCaught = vio2.exists(v =>
        v.contains("zz_selftest_threshflip") && v.contains("drifted"))
      val others = (vio1 ++ vio2).filterNot(_.contains("zz_selftest_"))
      others.foreach(v => println(s"VIOLATION: $v"))
      if (missed.isEmpty && flipFalseAlarm.isEmpty && flipCaught && others.isEmpty) {
        println("== SELFTEST PASS: all five injected regressions rejected " +
          "(threshold flip clean at primary scale, caught at second), " +
          "real surface clean at both scales")
      } else {
        missed.foreach { case (q, frag) =>
          println(s"== SELFTEST FAIL: $q not caught by the '$frag' detector") }
        flipFalseAlarm.foreach(v =>
          println(s"== SELFTEST FAIL: threshold-flip specimen flagged at the PRIMARY scale: $v"))
        if (!flipCaught)
          println("== SELFTEST FAIL: threshold flip not caught at the second scale")
        if (others.nonEmpty) println(s"== SELFTEST saw ${others.size} real violation(s)")
        sys.exit(1)
      }
    } else {
      val all = vio1 ++ vio2
      all.foreach(v => println(s"VIOLATION: $v"))
      println(s"== violations: ${all.size} (allowlisted: ${allowlist.size} BNLJ/CART, " +
        s"${windowAllow.size} window, ${sortAllow.size} sort; " +
        s"${exchangePins.size} + ${exchangePins01.size} exchange pins over two scales)")
      if (all.nonEmpty) sys.exit(1)
    }
  }
}
