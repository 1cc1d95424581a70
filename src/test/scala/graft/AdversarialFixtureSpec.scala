package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Adversarial-fixture sweep (r4 VERDICT item 5): the oracle gate runs on
  * driver-generated testdata whose shape is benign — every user has clicks,
  * no document is empty, no map key is null — so an ANSI trap (strict
  * `element_at`, null map keys, divide-by-zero on empty token lists) can
  * hide behind fixture luck. This spec rebuilds the three synthetic tables
  * with the hostile rows and runs EVERY declared query that reads only
  * those tables, asserting each is total (no throw) plus targeted value
  * pins for the semantics the traps would corrupt.
  *
  * Hostile rows: a zero-click user (missing map key), a NULL event_type
  * (null map key), a NULL value (null in sums/histograms), malformed and
  * NULL json props, an empty document, whitespace-only and punctuation-only
  * documents (empty token arrays), a single-token document (no bigrams), a
  * zero-norm embedding (cosine 0/0).
  */
class AdversarialFixtureSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-adversarial").toString
    val day = 86400L * 1000000000L // ns
    // (event_id, ts_ns, user_id, event_type, value, props)
    val events = Seq[(Long, Long, Long, String, java.lang.Double, String)](
      // user 1: zero clicks — map_functions' 'click' lookup must be NULL
      (1L, 1L * day + 1000000000L, 1L, "view", 1.5, """{"k": 1}"""),
      (2L, 1L * day + 2000000000L, 1L, "view", 2.5, """{"k": 2}"""),
      // user 2: 6 clicks (frequent) + a purchase with NULL value
      (3L, 1L * day + 3000000000L, 2L, "click", 1.0, """{"k": 3}"""),
      (4L, 1L * day + 4000000000L, 2L, "click", 2.0, "not json at all"),
      (5L, 1L * day + 5000000000L, 2L, "click", 3.0, null),
      (6L, 1L * day + 6000000000L, 2L, "click", 4.0, """{"k": 6}"""),
      (7L, 2L * day + 1000000000L, 2L, "click", 5.0, """{"k": 7}"""),
      (8L, 2L * day + 2000000000L, 2L, "click", 6.0, """{"k": 8}"""),
      (9L, 2L * day + 3000000000L, 2L, "purchase", null, """{"k": 9}"""),
      // user 3: a NULL event_type row (null map key) and one click
      (10L, 2L * day + 4000000000L, 3L, null, 7.0, """{"k": 10}"""),
      (11L, 2L * day + 5000000000L, 3L, "click", 8.0, """{"k": 11}"""),
      // user 4: a click->view->purchase chain for funnel/pattern queries
      (12L, 2L * day + 6000000000L, 4L, "click", 1.0, """{"k": 12}"""),
      (13L, 2L * day + 7000000000L, 4L, "view", 2.0, """{"k": 13}"""),
      (14L, 2L * day + 8000000000L, 4L, "purchase", 3.0, """{"k": 14}"""),
      (15L, 2L * day + 9000000000L, 4L, "signup", 4.0, """{"k": 15}"""),
      (16L, 3L * day + 1000000000L, 4L, "error", 5.0, """{"k": 16}"""),
      // user 5: timestamp TIES — the user's LAST three events share one
      // identical instant (changelog orderings must break on event_id,
      // never on shuffle arrival), one of them a signup (as-of <= must
      // include the tied instant); the earlier lone purchase pins
      // left-outer NULL before the first signup
      (17L, 3L * day + 2000000000L, 5L, "purchase", 4.0, """{"k": 17}"""),
      (18L, 3L * day + 3000000000L, 5L, "view", 1.0, """{"k": 18}"""),
      (19L, 3L * day + 3000000000L, 5L, "signup", 3.0, """{"k": 19}"""),
      (20L, 3L * day + 3000000000L, 5L, "click", 2.0, """{"k": 20}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // write ts at the REAL testdata encoding — TIMESTAMP_NTZ micros —
      // so these fixtures exercise the production schema (the r5 break:
      // fixtures kept Long nanos and stayed green while production broke)
      .withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
    events.repartition(1).write.parquet(s"$d/events.parquet")

    val near1 = "the quick brown fox jumps over the lazy dog while the " +
      "cat watches from the warm stone wall near the garden gate"
    val near2 = "the quick brown fox jumps over the lazy dog while the " +
      "cat watches from the warm stone wall near the garden fence"
    val docs = Seq[(Long, String, String, String)](
      (0L, "spark joins the fast table scan with a hash group and a " +
        "window sort over the small part table", "en", "src0"),
      (1L, "", "en", "src0"), // empty: zero tokens, zero chars
      (2L, " \t\n  ", "en", "src1"), // whitespace only: zero tokens
      (3L, "!!! ??? ... ;;;", "und", "src1"), // punctuation-only tokens
      (4L, "hello", "en", "src2"), // single token: no bigrams
      (5L, "spark spark spark spark spark spark", "en", "src2"), // repetition
      (6L, near1, "en", "src3"),
      (7L, near2, "en", "src3"), // near-dup pair for jaccard/minhash
      (8L, "call 555-123-4567 or mail jane.doe@example.com today", "en", "src4"),
      (9L, "la mesa grande tiene cuatro patas y un libro viejo", "es", "src0"),
      (10L, "der schnelle zug faehrt durch den langen dunklen tunnel", "de", "src1"),
      (11L, "query plans prune columns and push filters into the scan " +
        "so the executor reads fewer bytes", "en", "src2"),
      (12L, "reservoir sampling keeps a bounded uniform sample of an " +
        "unbounded stream of rows", "en", "src3"),
      (13L, "token budgets pack documents into shards without splitting " +
        "any single document across two shards", "en", "src4"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.parquet(s"$d/documents.parquet")

    val rnd = new scala.util.Random(42)
    val emb = (0L until 10L).map { i =>
      val v =
        if (i == 9L) Array.fill(64)(0.0f) // zero norm: cosine denominator 0
        else Array.fill(64)(rnd.nextFloat() * 2f - 1f)
      (i, v, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    emb.repartition(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  /** Every declared query whose reads stay within the three synthetic
    * tables (computed from the query bodies; streaming excluded — bounded
    * stream runs go through StreamingSpec's own MemoryStream fixtures).
    */
  private val swept: Seq[String] = Seq(
    "agg_misc", "agg_topk", "anomaly_zscore", "approx_sketches", "array_agg",
    "array_analytics", "asof_join", "bigram_lm", "bloom_decontam",
    "bpe_encode", "bpe_merges", "cdc_latest", "compact_files", "corpus_clean",
    "corpus_clean_incr",
    "csv_roundtrip", "decontam_overlap", "dedup_clusters", "dedup_containment",
    "dedup_embedding", "dedup_embedding_auto",
    "dedup_exact", "dedup_incr_lsh", "dedup_incremental", "dedup_minhash_lsh",
    "dedup_incr_lsh_indexed", "dedup_ngram_jaccard", "dedup_ngram_pruned",
    "dedup_semantic",
    "dedup_simhash", "dedup_spans", "dedup_winnow", "leakage_split",
    "distinct_agg", "doc_chunks", "doc_repetition", "embed_project",
    "embed_quantize",
    "funnel_steps", "fuzzy_match", "gap_fill", "graph_triangles",
    "hard_negatives", "heavy_hitters", "hopping_windows", "incr_agg_merge",
    "incremental_scan", "incremental_scan_jdbc", "interval_merge",
    "json_extract", "json_quarantine", "json_roundtrip", "json_variant",
    "kfold_split",
    "kmeans_assign",
    "lm_perplexity", "map_functions", "markov_transitions", "merge_upsert",
    "batch_padding",
    "null_handling", "orc_roundtrip", "pack_incremental", "pack_sequences",
    "partitioned_scan", "pattern_funnel",
    "pii_scrub", "pivot_events", "range_join", "regex_numbers",
    "reservoir_group", "retention_cohorts", "sample_split",
    "sample_stratified", "scd2_build", "session_stats", "sim_ann_multiprobe",
    "sim_ann_projected", "sim_ann_topk", "sim_ivf_auto", "sim_ivf_indexed",
    "sim_ivf_topk", "sim_sparse_topk", "sim_topk", "sim_topk_int8",
    "skew_distinct", "skew_join", "skyline_users", "sql_kernels",
    "table_diff", "temperature_mix", "text_normalize", "text_stats",
    "tfidf_terms", "token_shards", "train_mix", "value_histogram",
    "vocab_oov", "weighted_sample", "window_range", "window_ranks",
    "xml_roundtrip", "zorder_prune",
    // r8 index family: empty/whitespace-only docs produce empty token
    // arrays -> absent postings; absent query terms -> empty results, not
    // throws; BM25's stats include zero-length docs
    "text_search", "text_search_lead", "text_phrase", "text_near",
    "text_prefix", "text_bm25", "text_search_incr", "inverted_stats",
    "cooccurrence_pmi", "multimodal_dedup", "partition_overwrite",
    // late-r10 additions: empty/whitespace-only docs have no hashed
    // n-gram features (no weight row, not a throw); boolean retrieval
    // over absent terms returns empty; index telemetry over near-empty
    // corpora stays total; DSIR survives an all-false target mask
    "dsir_weights", "dsir_select", "dsir_apply_incr",
    "text_search_or", "text_search_msm", "text_search_not",
    "lsh_band_stats", "dedup_lsh_capped", "ivf_reseed",
    // PQ trains fewer codewords than requested on a tiny corpus and
    // must degrade, not throw (incl. the zero-norm embedding row)
    "sim_pq_topk")

  test("every function-breadth query is total on adversarial rows") {
    val failures = swept.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case t: Throwable =>
        Some(s"$name: ${t.getClass.getSimpleName}: " +
          Option(t.getMessage).getOrElse("").linesIterator.take(2).mkString(" ").take(200))
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries died on adversarial data:\n" +
      failures.mkString("\n"))
  }

  test("map_functions: missing and null map keys keep their documented semantics") {
    val rows = SparkEntry.queries("map_functions")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // zero-click user: try_element_at yields NULL, not a thrown error
    assert(rows(1L).isNullAt(2), "zero-click user must have NULL n_click")
    // null event_type row: the group survives into the map (n_types counts
    // it) and its count lands in the total
    assert(rows(3L).getInt(1) == 2, "null event_type must stay a key")
    assert(rows(3L).getLong(3) == 2L, "null-key count must reach the total")
  }

  test("timestamp ties resolve on event_id, and as-of <= includes the tied instant") {
    // cdc_latest: user 5's last three events share ONE identical
    // timestamp — the (tss, event_id) changelog order must pick event 20,
    // not whichever arrived last in shuffle order
    val cdc = SparkEntry.queries("cdc_latest")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(cdc(5L).getLong(2) == 20L && cdc(5L).getString(3) == "click",
      s"tied-timestamp CDC must break on event_id: ${cdc(5L)}")
    // asof_join: events 18/19/20 share the signup's exact micros — all
    // three must match signup 19 (<= semantics); the earlier purchase 17
    // precedes every signup and must stay NULL (left outer)
    val asof = SparkEntry.queries("asof_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(18L, 19L, 20L).foreach { eid =>
      assert(!asof(eid).isNullAt(3) && asof(eid).getLong(3) == 19L,
        s"event $eid must as-of-match the tied-instant signup: ${asof(eid)}")
    }
    assert(asof(17L).isNullAt(3),
      s"pre-signup event must keep a NULL as-of payload: ${asof(17L)}")
  }

  test("text stats are total on empty and whitespace-only documents") {
    val stats = SparkEntry.queries("text_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(stats.contains(id), s"doc $id must not vanish from stats")
      assert(stats(id).getAs[Number]("n_tokens").longValue() == 0L,
        s"doc $id has zero tokens")
    }
  }
}
