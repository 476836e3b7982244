package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain(formatted)` for representative queries to a markdown
  * file — the plan-review evidence trail (pushdown reaching the scan,
  * TakeOrderedAndProject instead of global sorts, broadcast joins on
  * dimension/top-k sides, whole-stage codegen spans over the kernels).
  *
  * Usage: `sbt 'runMain graft.PlanDump docs/PLANS_r1.md'`
  */
object PlanDump {
  val Representative = Seq(
    "v_knn_cosine",      // scan -> codegen score -> TakeOrderedAndProject
    "v_knn_batch",       // broadcast queries x corpus -> window top-k
    "v_neardup_pairs",   // blocked self-join
    "q3_top_orders",     // fact-fact shuffle join + broadcast dim + top-k
    "q5_nation_revenue", // multi-broadcast star join
    "e_latest_state",    // latest-per-key window (CAS resolution)
    "d_jaccard_pairs",   // checkpointed self-join + codegen merge intersect
    "d_minhash_bands",   // one-fold signatures
    "t_token_freq",      // salted two-phase aggregation
    "sql_exists_subquery", // decorrelated EXISTS
    // round 2 additions
    "q_hll_custkey",     // deterministic HLL: 64-register agg, no corpus shuffle
    "q_pagination",      // TakeOrdered cap, no full-table global window
    "d_simhash_pairs",   // broadcast blocked self-join, codegen simhash kernel
    "sql_window_suite",  // window-function family over partitioned frames
    "q_grouping_sets",   // expand-based lattice aggregation
    // round 3 additions
    "x_engine_lsh_det",  // engine LSH search over the shared fixture
    "x_engine_ivf_det",  // engine IVF probe: isin partition-pruned postings
    "q_bucketed_join",   // exchange-free SMJ over pre-bucketed tables
    "e_asof_custom",     // custom AsOfJoinExec: clustered+sorted merge walk
    "e_band_join",       // interval join as bucket-blocked equi-join (no NLJ)
    "v_ann_pq",          // PQ encode+ADC score in one map-only projection
    "x_engine_pq",       // engine PQ family: ADC codes scan + rerank
    "q_approx_quantile", // histogram-sketch quantiles: ~1k-bin agg
    // round 5 additions
    "x_engine_ivfpq",       // IVFPQ: isin-pruned codes scan, ADC, bounded rerank
    "x_engine_ivfpq_batch", // batched probe join + per-query top-k partial agg
    "d_dup_clusters",       // CC final join (per-round plans run at build time)
    "m_decode_px",          // mapPartitions ImageIO decode stage
    "x_engine_ivfpq_annjoin", // DF-scale batch: codebook-literal ADC, no driver tables
    "d_contamination",      // broadcast benchmark grams, map-side corpus probe
    "t_token_ids",          // broadcast vocab join + ordered reassembly
    "t_pack_sequences",     // two-phase prefix sum (range windows + offset map)
    "t_repetition",         // per-doc mode fractions via (doc, term) agg
    // round 6 additions
    "x_engine_lshdet_annjoin", // expression probe signatures -> bucket equi-join -> distributed pad
    "x_engine_pq_annjoin",     // flat-ADC vs codebook literal over the codes scan
    "x_engine_ivfpq_selfjoin", // corpus-scale self-join: N queries = N corpus rows
    "d_pipeline_e2e",          // five-stage curation DAG composed as flags on one scan
    "d_semantic_dedup",        // ANN-hit edges -> CC final join (index-backed SemDeDup)
    "d_incremental",           // batch bands BROADCAST vs persisted band index
    "t_perplexity",            // token-count agg + token equi-join + per-doc agg
    "t_tfidf",                 // two keyed aggs + per-doc-bounded window
    "m_resize_px",             // mapPartitions decode+resample stage
    "d_mixture_weights",       // |sources|-group agg + broadcast scalar joins
    "d_mixture_sample",        // broadcast policy thresholds onto one corpus scan
    "d_source_overlap",        // gram -> source-set agg, map-side pair expansion
    "t_bm25",                  // filtered postings aggs, broadcast idf/stats, top-k
    "v_hybrid_rrf",            // two top-k rankings fused in a 20x20 outer join
    "d_dsir",                  // two LM count tables joined onto the postings
    "x_engine_hybrid",         // engine search + BM25 ranks fused k x k
    "t_chunk_split",           // map-side overlapping-window explode
    "v_mmr_rerank",            // distributed top-k scan + k-bounded driver greedy
    "q_cms_topk",              // 128-cell CMS from the token-count agg
    "d_span_repeat",           // one gram agg -> per-gram count window -> doc stats
    "q_hll_by_flag",           // per-key register aggs over ONE reused distinct scan
    // round 7 additions
    "d_pipeline_full",         // 7-stage DAG: +mixture ppm threshold, +DSIR keep
    "m_pixel_dedup",           // decode scan -> content fingerprint -> one 32-byte-key shuffle
    "m_phash_neardup",         // aHash decode scan -> broadcast hamming pairs
    "t_curriculum",            // bounded score-histogram deciles, broadcast thresholds
    "d_span_strip",            // hot-gram equi-join -> matched-window explode -> (doc,pos) anti-join
    "d_minhash_eval",          // exact Jaccard over the candidate set only (never all-pairs)
    "x_engine_ivfpq_incremental", // frozen-centroid delta encode + codes anti-join state
    "v_maxsim",                // broadcast query set -> two partial aggs -> TakeOrdered
    "q_hll_merge",             // register-wise max merge: |groups| x 64 rows in
    "d_weighted_sample",       // integer-threshold Bernoulli keep on one narrow scan
    "d_pagerank",              // 10 fixed supersteps: edges->rank equi-join + dst agg each
    "q_profile",               // stacked (colname, value) rows: one job profiles all columns
    "sql_range_window",        // value-RANGE window frame over partitioned orders
    "v_knn_prefilter",         // filter pushed below the top-k scan
    "x_engine_sq8",            // byte-code scan, plan-literal ranges, no search-path join
    "x_engine_sq8_annjoin",    // codes x broadcast queries, per-query partial-agg cap
    "e_funnel",                // conditional min-agg chain, one user_id partitioning
    // round 8 additions
    "x_engine_ivfsq8",         // cell-pruned byte-code scan, per-cell kernel decode, bounded rerank
    "x_engine_ivfsq8_annjoin", // zip_with residual probe pairs -> looping dist kernel -> per-query cap
    "x_engine_sq8_compacted",  // search over the COMPACTED codes snapshot (layout-only change)
    "x_engine_pq_qerror",      // codebook decode-error fold, no join (truth stored beside the codes)
    "x_engine_ivfpq_qerror",   // ADC decode-error vs true residuals: chunk join + broadcast cents
    "d_span_strip_multi",      // two-scale hot-window coverage union -> one (doc,pos) anti-join
    "v_gram_matrix",           // one ObjectHashAggregate fold: 32 KiB buffer per partition
    "v_semantic_shard",        // broadcast centroids scan + two keyed windows, no cross-product
    "t_tfidf_sim",             // df-capped postings self-join, map-side pair combine, TakeOrdered
    "v_pca_project",           // broadcast direction literal, one narrow scan + TakeOrdered-free sort
    "v_knn_outlier",           // scored self-join -> k-bounded TopK partial agg (<= 5 rows/vec shuffled)
    "t_winnow_fp",             // doc-partitioned frame-min window + banded argmin self-join
    "e_scd2",                  // one lead() window per user partition, rows out == rows in
    "m_scene_cut",             // mapPartitions decode -> integer means -> clip_id-PARTITIONED lag window
    "e_interval_join",         // interval x interval: bucket equi-join + greatest-start-bucket residual
    "q_triangles",             // degree-oriented wedge join: three equi-joins, no hub blow-up
    "t_token_drift",           // (token, half) partial agg + broadcast totals, k-bounded output
    "q_salted_join",           // forced ShuffledHashJoin on (key, salt): hot keys spread 8-way
    "d_prefix_join",           // rarity-ordered prefix explode -> candidate equi-join -> merge verify
    "q_bloom_join",            // 8 KiB bitmap literal, three bit-test filters BEFORE the exchange
    "e_ivm_merge",             // base agg full-outer delta agg vs direct recompute
    "q_assoc_rules",           // Apriori prune BEFORE the orderkey pair self-join, ppm metrics
    "q_skyline",               // price-spine window (|distinct prices|), no quadratic dominance join
    "q_shortest_path",         // 8 chained relax supersteps, self-loop min fold, checkpointed edges
    "d_edit_dedup",            // candidate-bounded text hydration joins + codegen levenshtein
    "q_dq_checks",             // one conditional-agg pass per table + key-only anti-joins, stacked rows
    "d_greedy_cover",          // per-round semi-join covered set + anti-join marginals + TakeOrdered(1)
    "q_hll_running",           // |days| x 64 register spine, running max window, per-day Z fold
    "e_rate_limit",            // user-keyed fold: packed-BIGINT bucket state in one aggregate HOF
    "q_shard_ring",            // one-row ring column crossJoin, map-side assignment, no literal
    "v_kcenter_coreset",       // incremental min-dist frame x broadcast newest center, TakeOrdered(1)/round
    "q_communities",           // LPA superstep: equi-join + two hash aggs (max_by argmax, no sort window)
    "e_attribution",           // one user-keyed IGNORE-NULLS carry window -> |days|-bounded agg
    "t_clf_auc",               // bucketed rank decomposition: R-bucket prefix + per-bucket windows
    "q_link_predict",          // wedge equi-join -> anti-join existing edges -> TakeOrdered(20)
    "e_wau",                   // dedup user-days -> bounded cover explode -> per-day count-distinct
    "q_skew_audit",            // per-key count agg + decimal moment fold + k-bounded top-10 side
    "e_holt",                  // packed two-state integer fold over the bounded day array + lag
    "e_ab_test",               // user-keyed conversion agg -> 2-group agg -> one-row rate-space score
    "e_cusum",                 // two clamped prefix folds emitted per day from one sorted array
    "e_correlation",           // bounded midrank windows -> one sufficient-statistics agg, one row out
    // round 9 additions
    "t_langid",                // exploded-gram scan -> per-doc bucket agg -> 5x4096 broadcast profile join -> argmax agg
    "t_bpe_encode",            // learned segmentation broadcast join, per-doc ordered piece fold
    "sql_returned_revenue",    // integer-cents join-agg: zero DECIMAL casts anywhere in the plan
    // round 13 additions
    "x_engine_optimize_layout", // box scan over the hilbert-rewritten partition: pushed 2-d filters, row-group skip
    "x_engine_dedup_storage",   // raw-split CDC window + distinct-chash blob agg, 1-row stats
    "x_engine_search_text",     // engine-embedded query vector -> flat cosine scan -> TakeOrdered(10)
    "x_engine_nsw_det",         // beam walk: isin-pushed adjacency + posting reads per round, bounded rerank
    "x_engine_nswdet_annjoin",  // distributed frontier walk: per-round adjacency join + per-query beam window
    "x_engine_ivfdet_layout",   // nprobe isin pushed into the range-sliced postings scan (row-group skip)
    // round 14 additions
    "x_engine_hnsw_det",        // layered walk: level expr on postings, (layer,src) pushed descent reads, hybrid-seeded beam
    "x_engine_nswdet_prefiltered", // allowed-set semi-join gates seed pool + frontier before the beam cut
    "x_engine_search_text_dim64",  // 64-dim block-hash embed folded into the token scan, flat cosine tail
    // round 15 additions
    "x_engine_hnswdet_prefiltered", // ungated descent entry + allowed-gated hybrid pool/frontier beam
    "x_engine_hnswdet_layerstats",  // two metadata-scale aggs: level census x layer spine + per-layer edge counts
    "x_engine_bq",                  // packed-word scan: xor+popcount hamming, cap, bounded exact rerank
    "x_engine_ivfbq",               // centroid-isin-pruned packed scan: cell pushdown, hamming, bounded rerank
    "x_engine_bq_annjoin",          // executor-packed query codes x codes scan, per-query partial-agg cap
    "x_engine_range_search",        // scored scan -> threshold Filter -> TakeOrderedAndProject (no shuffle)
    "x_engine_recommend_margin",    // <=64 seed literals: greatest-of-cosines margin inside one codegen span
    "x_engine_group_search",        // per-group k-bounded partial agg -> one-row-per-group TakeOrdered -> bounded explode
  )

  /** Per-query dump mode (optimization rounds): SPARK_GRAFT_PLAN_QUERIES
    * is a comma-separated entry list and SPARK_GRAFT_PLAN_SUFFIX the file
    * suffix; each query's `explain(formatted)` goes to
    * `<outDir>/<name>_<suffix>.txt` (the `plans/rNN` evidence layout).
    */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/PLANS_r1.md")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    sys.env.get("SPARK_GRAFT_PLAN_QUERIES").foreach { qs =>
      val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
      val spark = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      Files.createDirectories(Paths.get(out))
      qs.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        Files.writeString(Paths.get(out, s"${name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote $out/${name}_$suffix.txt")
      }
      spark.stop()
      return
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans\n\n")
    sb.append(s"`explain(formatted)` at `$sfDir`. What to check per plan:\n")
    sb.append("`PushedFilters`/`ReadSchema` at every parquet scan (pushdown +\n")
    sb.append("pruning), `TakeOrderedAndProject` for top-k (never a global\n")
    sb.append("sort), `BroadcastHashJoin` on dimension/top-k sides,\n")
    sb.append("`WholeStageCodegen` spans covering the scoring kernels.\n")
    Representative.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
