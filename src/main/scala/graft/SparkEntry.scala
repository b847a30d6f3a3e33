package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Ingest, Refresh}
import graft.queries.Parity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's §3.1 hot path on sf0.001 — scan → null
    * normalize → full-refresh columnar extract → count (driver smoke-checks
    * rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val li = Ingest.normalizeNulls(Tables.lineitem(spark, sfDir))
    val extract = s"${sys.props("java.io.tmpdir")}/graft_entry_extract"
    val cnt = Refresh.overwrite(li, extract)
    import spark.implicits._
    Seq(cnt).toDF("row_count").filter(col("row_count") > 0)
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * north-star extension operators (dedup / similarity / text /
    * multimodal) from graft.queries.Extensions.
    */
  private def allQ = Parity.all ++ graft.queries.Extensions.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.sql.map(q.name -> _)).toMap

  /** Headline subset Bench times per round (heaviest/most representative):
    * the reference-parity core plus the training-data extension operators
    * (dedup/similarity/text). All-pairs ground-truth variants
    * (q_ngram_jaccard, q_embed_neardup) are oracle-only by design and
    * excluded from throughput measurement.
    */
  def benchQueries: Seq[String] = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tfidf",
    "q_count_full_refresh", "q_fk_join", "q_multi_join", "q_semi_join",
    "q_upsert_antijoin", "q_dedup", "q_topk_latest", "q_window_tumbling",
    "q_session_lag", "q_select_multiple_split",
    "q_dedup_exact", "q_minhash_lsh_pairs", "q_simhash_pairs",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_join", "q_token_count", "q_quality_score",
    "q_lang_id", "q_fingerprint", "q_asof_join", "q_range_join",
    "q_semantic_dedup", "q_pack_sequences", "q_domain_cap", "q_scd2",
    "q_scd2_asof", "q_unigram_lm", "q_salted_join", "q_containment",
    "q_normalize", "q_incremental_neardup", "q_ivf_stats",
    "q_bloom_decontaminate", "q_paragraph_dedup",
    "q_tpch_q18", "q_bigram_lm", "q_lexical_diversity", "q_funnel",
    "q_cohort_retention", "q_tpch_q10", "q_sql_neardup", "q_dedup_funnel",
    "q_repetition_stats", "q_doc_perplexity",
    "q_dsir_weights", "q_concurrency", "q_pagerank",
    "q_tpch_q7", "q_tpch_q14", "q_data_card",
    "q_tpch_q4", "q_tpch_q8", "q_tpch_q13", "q_tpch_q15", "q_tpch_q17",
    "q_tpch_q19", "q_tpch_q21", "q_tpch_q22", "q_tpch_q12",
    "q_tpch_q2", "q_tpch_q9",
    "q_curation_pipeline", "q_curation_bucketed", "q_audio_stats",
    "q_audio_neardup", "q_ivf_join", "q_url_dedup", "q_boilerplate",
    "q_bpe_merges", "q_bpe_encode", "q_zorder_box", "q_image_neardup",
    "q_fuzzy_join", "q_pq_adc", "q_cms_heavy_hitters", "q_linear_probe",
    // q_ngram_spans_cms is oracle-checked but NOT benched: the CMS
    // prefilter is a measured negative result at minCount=2 (sketch
    // saturates as distinct grams outgrow any broadcastable width —
    // SCALING_NGRAM_CMS.json: ratio 49.0 vs hashed 21.6), kept as
    // the recorded experiment + the high-minCount tool it remains
    "q_ivf_pq", "q_drift_mix", "q_ngram_spans", "q_ngram_spans_hashed",
    "q_ngram_scrub",
    // r11: the bigram LM's 8-byte-BIGINT-key scale variant, benched
    // beside the exact form like the ngram_spans pair above
    "q_bigram_lm_hashed",
    // r11: skew diagnostic, embedding-tier decontamination, composed
    // entity resolution
    "q_skew_audit", "q_semantic_decontaminate", "q_entity_resolution",
    // r12: hybrid retrieval — BM25 lexical ranking + reciprocal-rank
    // fusion with the unigram-LM fluency leg
    "q_bm25", "q_rrf_fusion",
    // r16: the shipped PQ serving tier and the training-handoff
    // manifest — scale-proven in r15 but previously tracked only by
    // scaling re-runs, so a serving-path regression would have missed
    // the round-over-round gate
    "q_pq_full_stack", "q_shard_manifest",
    // r18: the lossless set-similarity tier (r17's exact self-join,
    // the R-S decontamination shape, and the persisted prefix index) —
    // among the heaviest recommended-path operators in the suite
    // (smoke t1 ~4.9/2.7/4.1 s), previously visible only to the sf0.01
    // smoke ledger, so a regression on the exact tier would have
    // missed the round-over-round record entirely
    "q_setsim_join", "q_setsim_decontaminate", "q_setsim_index"
  ).filter(queries.contains)
}
