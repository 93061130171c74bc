package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry here exercises one operator family from SURVEY.md §2 or a
  * training-data op; `oracleSql` carries the DuckDB-equivalent for the
  * driver's correctness gate (column names aligned on both sides).
  */
object SparkEntry {
  /** Flagship: the KG-construction pipeline (extract → LSH → CC →
    * canonicalize) over a deterministic transcript corpus. Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    kg.Pipeline.triplesInMemory(kg.TranscriptGen.turns(spark, 600L, 8).toDF())

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // graphio bulk semantics (SURVEY §2 A1-A6, B1-B4)
    "q_ingest_defaults"      -> (Queries.ingestDefaults _),
    "q_unique_edges"         -> (Queries.uniqueEdges _),
    "q_batching"             -> (Queries.batching _),
    "q_cluster_by"           -> (Queries.clusterBy _),
    "q_prop_key_union"       -> (Queries.propKeyUnion _),
    "q_nodeset_create"       -> (Queries.nodesetCreate _),
    "q_nodeset_dedup"        -> (Queries.nodesetDedup _),
    "q_nodeset_merge"        -> (Queries.nodesetMerge _),
    "q_labels_accum"         -> (Queries.labelsAccum _),
    "q_multikey_merge"       -> (Queries.multikeyMerge _),
    "q_nodeset_merge_append" -> (Queries.nodesetMergeAppend _),
    "q_merge_override"       -> (Queries.mergeOverride _),
    "q_relset_resolve"       -> (Queries.relsetResolve _),
    "q_relset_merge_idem"    -> (Queries.relsetMergeIdem _),
    "q_relset_arraykey"      -> (Queries.relsetArrayContains _),
    // OGM read path (B5-B11)
    "q_filter_ops"           -> (Queries.filterOps _),
    "q_traverse_1hop"        -> (Queries.traverse1hop _),
    "q_traverse_reverse"     -> (Queries.traverseReverse _),
    "q_traverse_2hop"        -> (Queries.traverse2hop _),
    "q_detach_delete"        -> (Queries.detachDelete _),
    "q_raw_query"            -> (Queries.rawQueryGate _),
    "q_edge_delete"          -> (Queries.edgeDelete _),
    "q_resume"               -> (Queries.resume _),
    "q_temporal_filter"      -> (Queries.temporalFilter _),
    // training-data ops: dedup family
    "q_dedup_exact"          -> (Queries.dedupExact _),
    "q_ngram_jaccard"        -> (Queries.ngramJaccard _),
    "q_minhash_pairs"        -> (Queries.minhashPairs _),
    "q_minhash_dedup"        -> (Queries.minhashDedup _),
    "q_minhash_dedup_best"   -> (Queries.minhashDedupBest _),
    "q_simhash_pairs"        -> (Queries.simhashPairs _),
    "q_simhash_sigs"         -> (Queries.simhashSigs _),
    // similarity search
    "q_ann_topk"             -> (Queries.annBruteForce _),
    "q_ann_quantized"        -> (Queries.annQuantized _),
    "q_ann_ivf"              -> (Queries.annIvf _),
    "q_ann_ivf_trained"      -> (Queries.annIvfTrained _),
    "q_embed_neardup"        -> (Queries.embedNearDup _),
    "q_quantize"             -> (Queries.quantize _),
    "q_embed_neardup_lsh"    -> (Queries.embedNearDupLsh _),
    "q_lsh_sigs"             -> (Queries.lshSigs _),
    "q_ann_recall"           -> (Queries.annRecall _),
    "q_pq_codebook"          -> (Queries.pqCodebookDump _),
    "q_ann_pq"               -> (Queries.annPq _),
    "q_ann_ivfpq"            -> (Queries.annIvfPq _),
    "q_ann_ivfpq_mat"        -> (Queries.annIvfPqMat _),
    "q_semantic_dedup"       -> (Queries.semanticDedupGate _),
    "q_rank_metrics"         -> (Queries.rankingMetricsGate _),
    "q_pca"                  -> (Queries.pcaGate _),
    "q_abtt"                 -> (Queries.abttGate _),
    "q_snapshot_diff"        -> (Queries.snapshotDiffGate _),
    "q_k_anonymity"          -> (Queries.kAnonymityGate _),
    "q_blocking_quality"     -> (Queries.blockingQualityGate _),
    "q_sparse_cosine"        -> (Queries.sparseCosineGate _),
    "q_resample_locf"        -> (Queries.resampleGate _),
    "q_ohlc"                 -> (Queries.ohlcGate _),
    "q_psi"                  -> (Queries.psiGate _),
    "q_mi"                   -> (Queries.miGate _),
    "q_kappa"                -> (Queries.kappaGate _),
    "q_length_batches"       -> (Queries.lengthBatchesGate _),
    "q_mix_rates"            -> (Queries.mixRatesGate _),
    "q_vocab_coverage"       -> (Queries.vocabCoverageGate _),
    "q_naming"               -> (Queries.naming _),
    // text analysis
    "q_token_counts"         -> (Queries.tokenCounts _),
    "q_lang_id"              -> (Queries.langId _),
    "q_quality"              -> (Queries.quality _),
    "q_fingerprint"          -> (Queries.fingerprint _),
    "q_sample_stratified"    -> (Queries.sampleStratified _),
    "q_sample_temperature"   -> (Queries.sampleTemperature _),
    "q_split"                -> (Queries.splitAssign _),
    "q_quota_topk"           -> (Queries.quotaTopk _),
    "q_repetition"           -> (Queries.repetition _),
    "q_scrub"                -> (Queries.scrub _),
    "q_vocab_topk"           -> (Queries.vocabTopk _),
    "q_corpus_stats"         -> (Queries.corpusStats _),
    "q_decontam"             -> (Queries.decontaminate _),
    "q_decontam_bloom"       -> (Queries.decontaminateBloom _),
    "q_vocab_size"           -> (Queries.vocabSize _),
    "q_corpus_pctl"          -> (Queries.corpusPercentiles _),
    "q_pack"                 -> (Queries.packBySize _),
    // KG pipeline shapes + skew-aware agg + CC
    "q_kg_triples"           -> (Queries.kgTriples _),
    "q_kg_entities"          -> (Queries.kgEntities _),
    "q_cc_events"            -> (Queries.ccEvents _),
    "q_conv_stats"           -> (Queries.convStats _),
    "q_window_agg"           -> (Queries.windowAgg _),
    "q_sessionize"           -> (Queries.sessionize _),
    "q_comention"            -> (Queries.comention _),
    "q_khop"                 -> (Queries.khop _),
    "q_temporal_validity"    -> (Queries.temporalValidity _),
    "q_asof"                 -> (Queries.asof _),
    "q_interval_join"        -> (Queries.intervalJoinAgg _),
    "q_funnel"               -> (Queries.funnelGate _),
    "q_rollup"               -> (Queries.rollupAgg _),
    "q_heavy_hitters"        -> (Queries.heavyHitters _),
    "q_cohort"               -> (Queries.cohortGate _),
    "q_outliers"             -> (Queries.outlierGate _),
    "q_bm25"                 -> (Queries.bm25 _),
    "q_tfidf"                -> (Queries.tfidf _),
    "q_context"              -> (Queries.contextGate _),
    "q_dialogue"             -> (Queries.dialogueGate _),
    "q_centroids"            -> (Queries.centroidsGate _),
    "q_fuzzy"                -> (Queries.fuzzyGate _),
    "q_jaro_winkler"         -> (Queries.jaroWinklerGate _),
    "q_ntile"                -> (Queries.ntileGate _),
    "q_transitions"          -> (Queries.transitionsGate _),
    "q_sample_weighted"      -> (Queries.sampleWeightedGate _),
    "q_sample_weighted_grp"  -> (Queries.sampleWeightedGroupGate _),
    "q_shuffle"              -> (Queries.shuffleGate _),
    "q_negative_pairs"       -> (Queries.negativePairsGate _),
    "q_kmeans"               -> (Queries.kmeansGate _),
    "q_random_project"       -> (Queries.randomProjectGate _),
    "q_lm_score"             -> (Queries.lmScoreGate _),
    "q_key_skew"             -> (Queries.keySkewGate _),
    "q_group_distinct"       -> (Queries.groupDistinctGate _),
    "q_contamination"        -> (Queries.contaminationGate _),
    "q_rrf"                  -> (Queries.rrfGate _),
    "q_constraints"          -> (Queries.constraintsGate _),
    "q_salted_join"          -> (Queries.saltedJoinGate _),
    "q_bloom_semi"           -> (Queries.bloomSemiGate _),
    "q_zorder"               -> (Queries.zorderGate _),
    "q_zorder_mat"           -> (Queries.zorderMat _),
    "q_histogram"            -> (Queries.histogramGate _),
    "q_dedup_stats"          -> (Queries.dedupStatsGate _),
    "q_curation"             -> (Queries.curationGate _),
    "q_curation_audit"       -> (Queries.curationAuditGate _),
    "q_profile"              -> (Queries.profileGate _),
    "q_sessions"             -> (Queries.sessionIdsGate _),
    "q_pmi"                  -> (Queries.pmi _),
    "q_hash_features"        -> (Queries.hashFeaturesGate _),
    "q_winsorize"            -> (Queries.winsorizeGate _),
    "q_adamic_adar"          -> (Queries.adamicAdar _),
    "q_chunk"                -> (Queries.chunk _),
    "q_rolling"              -> (Queries.rolling _),
    "q_triangles"            -> (Queries.triangles _),
    "q_neighbor_jaccard"     -> (Queries.neighborJacc _),
    "q_pagerank"             -> (Queries.pagerank _),
    "q_pagerank_personal"    -> (Queries.pagerankPersonal _),
    "q_pagerank_weighted"    -> (Queries.pagerankWeighted _),
    "q_hits"                 -> (Queries.hitsScores _),
    "q_communities"          -> (Queries.communities _),
    "q_kcore"                -> (Queries.kcore _),
    "q_sssp"                 -> (Queries.sssp _),
    "q_harmonic"             -> (Queries.harmonicGate _),
    "q_clustering"           -> (Queries.clusteringGate _),
    "q_kcore_check"          -> (Queries.kcoreCheck _),
    "q_degrees"              -> (Queries.degrees _),
    "q_scc"                  -> (Queries.sccGate _),
    "q_condensation"         -> (Queries.condensationGate _),
    "q_walks"                -> (Queries.walksGate _),
    "q_walks_biased"         -> (Queries.biasedWalksGate _),
    "q_ewma"                 -> (Queries.ewmaGate _),
    "q_bpe"                  -> (Queries.bpeGate _),
    "q_mmr"                  -> (Queries.mmrGate _),
    "q_ngram_containment"    -> (Queries.ngramContainment _),
    "q_twa"                  -> (Queries.twaGate _),
    "q_winnow"               -> (Queries.winnowGate _),
    "q_winnow_pairs"         -> (Queries.winnowPairsGate _),
    "q_split_leakage"        -> (Queries.splitLeakageGate _),
    "q_standardize"          -> (Queries.standardizeGate _),
    "q_pareto"               -> (Queries.paretoGate _),
    "q_incremental"          -> (Queries.incremental _),
    "q_stream_sessions"      -> (Queries.streamSessions _),
    "q_stream_dedup"         -> (Queries.streamDedup _),
    "q_stream_join"          -> (Queries.streamJoin _),
    "q_incremental_edges"    -> (Queries.incrementalEdges _),

    "q_media_partition"      -> (Queries.mediaPartition _),
    "q_media_meta"           -> (Queries.mediaMeta _),
    "q_pixel_stats"          -> (Queries.pixelStats _),
    "q_resize_stats"         -> (Queries.resizeStats _),
    "q_audio_decimate"       -> (Queries.audioDecimateStats _),
    "q_audio_stats"          -> (Queries.audioStats _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_ingest_defaults" ->
      """SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'unknown') AS et
        |FROM events""".stripMargin,

    "q_unique_edges" ->
      """SELECT status, count(*) AS n FROM (
        |  SELECT DISTINCT o_custkey, o_orderstatus AS status FROM orders)
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_prop_key_union" ->
      """WITH o AS (SELECT o_custkey AS uuid, count(*) AS o_cnt
        |           FROM orders WHERE o_orderstatus='O' GROUP BY 1),
        |     f AS (SELECT o_custkey AS uuid, count(*) AS f_price
        |           FROM orders WHERE o_orderstatus='F' GROUP BY 1),
        |     m AS (SELECT o.o_cnt, f.f_price
        |           FROM o FULL OUTER JOIN f ON o.uuid = f.uuid)
        |SELECT 'f_price' AS key, CAST(count(f_price) AS BIGINT) AS n_nonnull FROM m
        |UNION ALL
        |SELECT 'o_cnt', CAST(count(o_cnt) AS BIGINT) FROM m
        |ORDER BY key""".stripMargin,

    "q_batching" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |         row_number() OVER (ORDER BY l_orderkey, l_partkey,
        |           l_linenumber, l_suppkey, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem)
        |SELECT CAST(floor((rn - 1) / 1000) AS BIGINT) AS batch,
        |       count(*) AS n,
        |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // clustering invariant: each key in exactly one partition, partitions
    // sorted => pairs == keys and zero inversions
    "q_cluster_by" ->
      """SELECT count(DISTINCT c_custkey) AS n_keys,
        |       count(DISTINCT c_custkey) AS n_pairs,
        |       CAST(0 AS BIGINT) AS n_unsorted
        |FROM customer""".stripMargin,

    "q_merge_override" ->
      """WITH o AS (SELECT o_custkey AS uuid, count(*) AS cnt, 'O' AS first_status
        |           FROM orders WHERE o_orderstatus='O' GROUP BY 1),
        |     f AS (SELECT o_custkey AS uuid, count(*) AS cnt, 'F' AS first_status
        |           FROM orders WHERE o_orderstatus='F' GROUP BY 1)
        |SELECT COALESCE(f.uuid, o.uuid) AS uuid,
        |       COALESCE(f.cnt, o.cnt) AS cnt,
        |       COALESCE(o.first_status, f.first_status) AS first_status
        |FROM o FULL OUTER JOIN f ON o.uuid = f.uuid""".stripMargin,

    "q_raw_query" ->
      """SELECT c_mktsegment AS seg, count(*) AS n FROM customer
        |WHERE c_mktsegment <> 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_edge_delete" ->
      """WITH placed AS (SELECT o_orderstatus AS st, c_mktsegment AS seg
        |                FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT 'LOCATED' AS rel_type, (SELECT count(*) FROM customer) AS n
        |UNION ALL
        |SELECT 'PLACED', (SELECT count(*) FROM placed
        |                  WHERE NOT (seg = 'BUILDING' AND st = 'F'))
        |ORDER BY rel_type""".stripMargin,

    "q_resume" ->
      """SELECT event_type, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_temporal_filter" ->
      """SELECT event_id, ts FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |  AND event_type = 'click'""".stripMargin,

    "q_nodeset_create" ->
      """SELECT c_custkey AS uuid, c_name AS key FROM customer
        |UNION ALL SELECT c_custkey AS uuid, c_name AS key FROM customer""".stripMargin,

    "q_nodeset_dedup" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM (
        |  SELECT l_orderkey, l_partkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "q_nodeset_merge" ->
      """WITH o AS (SELECT o_custkey AS uuid, count(*) AS cnt, 'O' AS last_status
        |           FROM orders WHERE o_orderstatus='O' GROUP BY 1),
        |     f AS (SELECT o_custkey AS uuid, count(*) AS cnt, 'F' AS last_status
        |           FROM orders WHERE o_orderstatus='F' GROUP BY 1)
        |SELECT COALESCE(f.uuid, o.uuid) AS uuid,
        |       COALESCE(f.cnt, o.cnt) AS cnt,
        |       COALESCE(f.last_status, o.last_status) AS last_status
        |FROM o FULL OUTER JOIN f ON o.uuid = f.uuid""".stripMargin,

    "q_labels_accum" ->
      """SELECT c_custkey AS uuid, 'Active,Customer,Gold' AS labels_str FROM customer""",

    "q_multikey_merge" ->
      """WITH b1 AS (SELECT l_orderkey, l_linenumber, sum(l_quantity) AS qty, 'b1' AS src
        |            FROM lineitem GROUP BY 1, 2),
        |     b2 AS (SELECT l_orderkey, l_linenumber, sum(l_quantity * 2) AS qty, 'b2' AS src
        |            FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2)
        |SELECT COALESCE(b2.l_orderkey, b1.l_orderkey) AS l_orderkey,
        |       COALESCE(b2.l_linenumber, b1.l_linenumber) AS l_linenumber,
        |       ROUND(COALESCE(b2.qty, b1.qty), 2) AS qty,
        |       COALESCE(b2.src, b1.src) AS src
        |FROM b1 FULL OUTER JOIN b2
        |  ON b1.l_orderkey = b2.l_orderkey AND b1.l_linenumber = b2.l_linenumber""".stripMargin,

    "q_nodeset_merge_append" ->
      """WITH o AS (SELECT o_custkey AS uuid, count(*) AS cnt
        |           FROM orders WHERE o_orderstatus='O' GROUP BY 1),
        |     f AS (SELECT o_custkey AS uuid, count(*) AS cnt
        |           FROM orders WHERE o_orderstatus='F' GROUP BY 1)
        |SELECT COALESCE(f.uuid, o.uuid) AS uuid,
        |       array_to_string(list_transform(
        |         list_filter([o.cnt, f.cnt], x -> x IS NOT NULL),
        |         x -> CAST(x AS VARCHAR)), ',') AS cnt_list
        |FROM o FULL OUTER JOIN f ON o.uuid = f.uuid""".stripMargin,

    "q_relset_resolve" ->
      """SELECT o_orderstatus AS status, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_relset_merge_idem" ->
      """SELECT 'PLACED' AS rel_type, count(DISTINCT o_custkey) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_relset_arraykey" ->
      """SELECT kw, count(*) AS n_docs
        |FROM (VALUES ('join'), ('spark'), ('vector')) t(kw)
        |JOIN documents d ON list_contains(string_split(d.text, ' '), kw)
        |GROUP BY kw ORDER BY kw""".stripMargin,

    "q_filter_ops" ->
      """SELECT p_partkey, p_name, p_size, p_type FROM part
        |WHERE p_size >= 10 AND p_size < 40 AND p_name LIKE '%e%'
        |  AND p_name LIKE 'r%' AND p_name LIKE '%t'
        |  AND p_type <> 'PROMO'""".stripMargin,

    "q_traverse_1hop" ->
      """SELECT DISTINCT o_orderkey, o_orderstatus AS status
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 100000""".stripMargin,

    "q_traverse_reverse" ->
      """SELECT DISTINCT c_custkey, c_mktsegment AS seg
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'""".stripMargin,

    "q_traverse_2hop" ->
      """SELECT DISTINCT o_orderkey, o_orderstatus AS status
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = (SELECT min(n_name) FROM nation)""".stripMargin,

    "q_detach_delete" ->
      """SELECT (SELECT count(*) FROM customer WHERE c_mktsegment <> 'BUILDING') AS n_customers,
        |       ((SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey
        |         WHERE c_mktsegment <> 'BUILDING') +
        |        (SELECT count(*) FROM customer WHERE c_mktsegment <> 'BUILDING')) AS n_edges""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (SELECT lang, doc_id,
        |             list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS sh
        |           FROM documents WHERE lang = 'de')
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |       round(len(list_intersect(a.sh, b.sh)) * 1.0 /
        |             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""".stripMargin,

    // 3-gram shingle sets rebuilt as strings (hashes preserve set sizes);
    // containment = |A∩B| / min — integer arithmetic, exact threshold
    "q_ngram_containment" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) < 3
        |      THEN [array_to_string(regexp_split_to_array(lower(trim(text)), '\s+'), ' ')]
        |      ELSE list_distinct(list_transform(
        |        generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2),
        |        i -> array_to_string(
        |               (regexp_split_to_array(lower(trim(text)), '\s+'))[i:i+2], ' ')))
        |    END AS sh
        |  FROM documents WHERE lang = 'en')
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |       round(len(list_intersect(a.sh, b.sh)) * 1.0 /
        |             least(len(a.sh), len(b.sh)), 6) AS containment
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
        |      least(len(a.sh), len(b.sh)) >= 0.1""".stripMargin,

    // shared-print pairs recomputed from the q_winnow dump (the
    // two-table-dump pattern: q_winnow itself is value-exact, so this
    // verifies the pairing join and the minShared cut)
    "q_winnow_pairs" ->
      """WITH p AS (
        |  SELECT DISTINCT doc_id, print
        |  FROM read_parquet('__GRAFT_OUT__/q_winnow/*.parquet'))
        |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
        |FROM p l JOIN p r ON l.print = r.print AND l.doc_id < r.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    // the winnow selection replayed exactly: same polynomial gram hashes,
    // same encoded long whose window MIN is "smallest hash, rightmost pos"
    "q_winnow" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |             list_transform(string_split(t, ''),
        |               c -> CAST(unicode(c) AS BIGINT))),
        |           (a, c) -> (a * 131 + c) % 1000000007)) AS th
        |  FROM documents),
        |idx AS (SELECT doc_id, th,
        |               unnest(generate_series(1, len(th) - 5 + 1)) AS i
        |        FROM base WHERE len(th) >= 5),
        |grams AS (
        |  SELECT doc_id, i - 1 AS gpos, len(th) - 5 + 1 AS ng,
        |    list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+4]),
        |                (a, x) -> (a * 131 + x) % 1000000007) AS g
        |  FROM idx),
        |coded AS (SELECT doc_id, gpos, ng,
        |                 g * 1048576 + (1048575 - gpos) AS code
        |          FROM grams),
        |sel AS (SELECT doc_id, gpos, ng,
        |          min(code) OVER (PARTITION BY doc_id ORDER BY gpos
        |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mc
        |        FROM coded)
        |SELECT DISTINCT doc_id, mc // 1048576 AS print,
        |       CAST(1048575 - (mc % 1048576) AS INT) AS pos
        |FROM sel WHERE gpos <= greatest(ng - 4, 0)""".stripMargin,

    // interval-weighted mean: exact integer-µs holding times, last sample
    // weightless, single-sample keys null
    "q_twa" ->
      """WITH x AS (
        |  SELECT user_id, value, epoch_us(ts) AS t,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS nt
        |  FROM events)
        |SELECT user_id,
        |  CASE WHEN sum(CASE WHEN nt IS NOT NULL AND value IS NOT NULL
        |                     THEN CAST(nt - t AS DOUBLE) END) > 0
        |    THEN round(
        |      sum(CASE WHEN nt IS NOT NULL AND value IS NOT NULL
        |          THEN value * CAST(nt - t AS DOUBLE) END)
        |      / sum(CASE WHEN nt IS NOT NULL AND value IS NOT NULL
        |            THEN CAST(nt - t AS DOUBLE) END), 6)
        |  END AS twa
        |FROM x GROUP BY user_id""".stripMargin,

    // same portable split hash as q_split + sha256 membership against train
    "q_split_leakage" ->
      """WITH a AS (
        |  SELECT doc_id, sha256(text) AS h,
        |    CASE WHEN b < 800000 THEN 'train'
        |         WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, text,
        |          (((((doc_id + 3) % 1000003) * 2654435761 + 3) % 1000000)
        |           + ((((doc_id + 3) % 999983) * 2246822518) % 1000000)) % 1000000 AS b
        |        FROM documents)),
        |tr AS (SELECT DISTINCT h FROM a WHERE split = 'train'),
        |lk AS (SELECT split, count(*) AS n_leaked FROM a
        |       WHERE split <> 'train' AND h IN (SELECT h FROM tr)
        |       GROUP BY split)
        |SELECT a.split, count(*) AS n_docs,
        |       coalesce(any_value(lk.n_leaked), 0) AS n_leaked
        |FROM a LEFT JOIN lk ON a.split = lk.split
        |GROUP BY a.split""".stripMargin,

    // per-dim corpus stats by element indexing (the q_centroids pattern)
    "q_standardize" ->
      """WITH d AS (SELECT range AS dim FROM range(0, 64)),
        |long AS (SELECT vec_id, CAST(dim AS INTEGER) AS dim,
        |                CAST(embedding[dim + 1] AS DOUBLE) AS v
        |         FROM embeddings, d),
        |st AS (SELECT dim, avg(v) AS mu, stddev_samp(v) AS sd
        |       FROM long GROUP BY dim)
        |SELECT l.vec_id, l.dim,
        |       CASE WHEN st.sd > 0 THEN round((l.v - st.mu) / st.sd, 6) END AS z
        |FROM long l JOIN st USING (dim)""".stripMargin,

    "q_token_counts" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe
        |FROM documents""".stripMargin,

    "q_lang_id" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |              FROM documents),
        |sc AS (
        |  SELECT doc_id, 'de' AS lang,
        |    len(list_filter(t, x -> x IN ('der','die','und','das','ist','von','den','ein'))) * 1.0 / greatest(len(t), 1) AS score FROM toks
        |  UNION ALL SELECT doc_id, 'en',
        |    len(list_filter(t, x -> x IN ('the','and','of','to','a','in','is','that'))) * 1.0 / greatest(len(t), 1) FROM toks
        |  UNION ALL SELECT doc_id, 'es',
        |    len(list_filter(t, x -> x IN ('el','la','de','que','y','en','los','del'))) * 1.0 / greatest(len(t), 1) FROM toks
        |  UNION ALL SELECT doc_id, 'fr',
        |    len(list_filter(t, x -> x IN ('le','la','de','et','les','des','un','est'))) * 1.0 / greatest(len(t), 1) FROM toks)
        |SELECT doc_id, lang AS lang_pred FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
        |  FROM sc) WHERE rn = 1""".stripMargin,

    "q_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS n,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS nd,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS na,
        |    greatest(length(text), 1) AS lt
        |  FROM documents)
        |SELECT doc_id,
        |  round(least(n * 1.0 / 64.0, 1.0) * 0.3 +
        |        (na * 1.0 / lt) * 0.35 +
        |        (nd * 1.0 / n) * 0.35, 6) AS quality
        |FROM base""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS item_id, embedding AS ce FROM embeddings),
        |flat AS (
        |  SELECT query_id, item_id,
        |         CAST(unnest(qe) AS DOUBLE) AS qx, CAST(unnest(ce) AS DOUBLE) AS cx
        |  FROM q JOIN c ON item_id <> query_id),
        |dots AS (
        |  SELECT query_id, item_id, sum(qx * cx) AS dp,
        |         sum(qx * qx) AS nq, sum(cx * cx) AS nc
        |  FROM flat GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, item_id, round(dp / (sqrt(nq) * sqrt(nc)), 6) AS cos
        |  FROM dots)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // the int8-scan + float-rescore path returns the exact brute-force
    // top-k (the 4x overscan absorbs the <1% quantization drift), so it is
    // value-checked against the SAME exact oracle as q_ann_topk
    "q_ann_quantized" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS item_id, embedding AS ce FROM embeddings),
        |flat AS (
        |  SELECT query_id, item_id,
        |         CAST(unnest(qe) AS DOUBLE) AS qx, CAST(unnest(ce) AS DOUBLE) AS cx
        |  FROM q JOIN c ON item_id <> query_id),
        |dots AS (
        |  SELECT query_id, item_id, sum(qx * cx) AS dp,
        |         sum(qx * qx) AS nq, sum(cx * cx) AS nc
        |  FROM flat GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, item_id, round(dp / (sqrt(nq) * sqrt(nc)), 6) AS cos
        |  FROM dots)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // FULL IVF replay (seed -> assign -> probe -> rank): seeds are the 16
    // vectors lowest under the portable double-fold hash (salt 41,
    // id-tiebroken); every argmax along the path compares the ROUNDED-6dp
    // cosine with the same tiebreaks the Spark path uses (cell asc /
    // item_id asc), so the approximate result is an exact function of the
    // inputs. Parallel unnests zip positionally (the q_kmeans pattern).
    "q_ann_ivf" ->
      """WITH h AS (
        |  SELECT vec_id, embedding,
        |    ((((vec_id+41) % 1000003) * 2654435761 + 41) % 1000000
        |     + (((vec_id+41) % 999983) * 2246822518) % 1000000) % 1000000 AS hk
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cell, embedding AS cv FROM h
        |      ORDER BY hk, vec_id LIMIT 16),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |f1 AS (SELECT e.vec_id, s.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |       FROM e CROSS JOIN s),
        |d1 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f1 GROUP BY 1, 2),
        |assign AS (SELECT vec_id AS item_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d1) WHERE rk = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |f2 AS (SELECT q.query_id, s.cell,
        |         CAST(unnest(q.qe) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |       FROM q CROSS JOIN s),
        |d2 AS (SELECT query_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f2 GROUP BY 1, 2),
        |probe AS (SELECT query_id, cell FROM (
        |    SELECT query_id, cell,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS crk
        |    FROM d2) WHERE crk <= 4),
        |cand AS (SELECT p.query_id, a.item_id
        |         FROM probe p JOIN assign a USING (cell)
        |         WHERE a.item_id <> p.query_id),
        |f3 AS (SELECT cand.query_id, cand.item_id,
        |         CAST(unnest(qq.embedding) AS DOUBLE) AS qx,
        |         CAST(unnest(ee.embedding) AS DOUBLE) AS cx
        |       FROM cand
        |       JOIN embeddings qq ON qq.vec_id = cand.query_id
        |       JOIN embeddings ee ON ee.vec_id = cand.item_id),
        |d3 AS (SELECT query_id, item_id, sum(qx*cx) AS dp,
        |              sum(qx*qx) AS nq, sum(cx*cx) AS nc
        |       FROM f3 GROUP BY 1, 2),
        |scored AS (SELECT query_id, item_id,
        |                  round(dp/(sqrt(nq)*sqrt(nc)), 6) AS cos FROM d3)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // the q_ann_ivf replay with BOTH Lloyd rounds unrolled between seed and
    // probe (the q_kmeans oracle's round body, twice): assign on the
    // rounded-6dp cosine, per-dim means rounded to 6dp, empty cells KEEP
    // the previous centroid (LEFT JOIN + coalesce)
    "q_ann_ivf_trained" ->
      """WITH h AS (
        |  SELECT vec_id, embedding,
        |    ((((vec_id+41) % 1000003) * 2654435761 + 41) % 1000000
        |     + (((vec_id+41) % 999983) * 2246822518) % 1000000) % 1000000 AS hk
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cell,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |      FROM h ORDER BY hk, vec_id LIMIT 16),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |dims AS (SELECT range AS dim FROM range(0, 64)),
        |f1 AS (SELECT e.vec_id, s.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x, unnest(s.cv) AS c
        |       FROM e CROSS JOIN s),
        |d1 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f1 GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d1) WHERE rk = 1),
        |m1 AS (SELECT a1.cell, dims.dim,
        |         round(avg(CAST(e.embedding[dims.dim+1] AS DOUBLE)), 6) AS m
        |       FROM a1 JOIN e USING (vec_id) CROSS JOIN dims
        |       GROUP BY 1, 2),
        |m1l AS (SELECT cell, list(m ORDER BY dim) AS mv FROM m1 GROUP BY cell),
        |c1 AS (SELECT s.cell, coalesce(m1l.mv, s.cv) AS cv
        |       FROM s LEFT JOIN m1l USING (cell)),
        |f2 AS (SELECT e.vec_id, c1.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x, unnest(c1.cv) AS c
        |       FROM e CROSS JOIN c1),
        |d2 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f2 GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d2) WHERE rk = 1),
        |m2 AS (SELECT a2.cell, dims.dim,
        |         round(avg(CAST(e.embedding[dims.dim+1] AS DOUBLE)), 6) AS m
        |       FROM a2 JOIN e USING (vec_id) CROSS JOIN dims
        |       GROUP BY 1, 2),
        |m2l AS (SELECT cell, list(m ORDER BY dim) AS mv FROM m2 GROUP BY cell),
        |c2 AS (SELECT c1.cell, coalesce(m2l.mv, c1.cv) AS cv
        |       FROM c1 LEFT JOIN m2l USING (cell)),
        |f3 AS (SELECT e.vec_id, c2.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x, unnest(c2.cv) AS c
        |       FROM e CROSS JOIN c2),
        |d3 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f3 GROUP BY 1, 2),
        |assign AS (SELECT vec_id AS item_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d3) WHERE rk = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |f4 AS (SELECT q.query_id, c2.cell,
        |         CAST(unnest(q.qe) AS DOUBLE) AS x, unnest(c2.cv) AS c
        |       FROM q CROSS JOIN c2),
        |d4 AS (SELECT query_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f4 GROUP BY 1, 2),
        |probe AS (SELECT query_id, cell FROM (
        |    SELECT query_id, cell,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS crk
        |    FROM d4) WHERE crk <= 4),
        |cand AS (SELECT p.query_id, a.item_id
        |         FROM probe p JOIN assign a USING (cell)
        |         WHERE a.item_id <> p.query_id),
        |f5 AS (SELECT cand.query_id, cand.item_id,
        |         CAST(unnest(qq.embedding) AS DOUBLE) AS qx,
        |         CAST(unnest(ee.embedding) AS DOUBLE) AS cx
        |       FROM cand
        |       JOIN embeddings qq ON qq.vec_id = cand.query_id
        |       JOIN embeddings ee ON ee.vec_id = cand.item_id),
        |d5 AS (SELECT query_id, item_id, sum(qx*cx) AS dp,
        |              sum(qx*qx) AS nq, sum(cx*cx) AS nc
        |       FROM f5 GROUP BY 1, 2),
        |scored AS (SELECT query_id, item_id,
        |                  round(dp/(sqrt(nq)*sqrt(nc)), 6) AS cos FROM d5)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |flat AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |         CAST(unnest(a.embedding) AS DOUBLE) AS xa,
        |         CAST(unnest(b.embedding) AS DOUBLE) AS xb
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
        |dots AS (SELECT a, b, sum(xa * xb) AS dp, sum(xa * xa) AS na, sum(xb * xb) AS nb
        |         FROM flat GROUP BY 1, 2)
        |SELECT a, b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM dots WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.3""".stripMargin,

    // two-table dump check (the q_simhash_pairs pattern): the 16-bit
    // sign-LSH signatures are engine-specific (q_lsh_sigs stays
    // rows-only), but the PAIR OPERATOR — 4x4-bit banding, candidate
    // self-join, dedupe, exact rounded-cosine >= 0.3 verify — is
    // recomputed here in SQL from the DUMPED signatures
    "q_embed_neardup_lsh" ->
      """WITH sigs AS (
        |  SELECT vec_id, sig
        |  FROM read_parquet('__GRAFT_OUT__/q_lsh_sigs/*.parquet')),
        |banded AS (
        |  SELECT vec_id, bi, (sig >> CAST(bi * 4 AS INTEGER)) & 15 AS k
        |  FROM sigs, range(4) t(bi)),
        |cand AS (
        |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
        |  FROM banded l JOIN banded r
        |    ON l.bi = r.bi AND l.k = r.k AND l.vec_id < r.vec_id),
        |flat AS (
        |  SELECT cand.a, cand.b,
        |         CAST(unnest(ea.embedding) AS DOUBLE) AS xa,
        |         CAST(unnest(eb.embedding) AS DOUBLE) AS xb
        |  FROM cand
        |  JOIN embeddings ea ON ea.vec_id = cand.a
        |  JOIN embeddings eb ON eb.vec_id = cand.b),
        |dots AS (SELECT a, b, sum(xa * xb) AS dp, sum(xa * xa) AS na,
        |                sum(xb * xb) AS nb
        |         FROM flat GROUP BY 1, 2)
        |SELECT a, b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM dots WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.3""".stripMargin,

    // portable polynomial fingerprint: both engines fold the identical
    // code-point arithmetic (init 7 / base 131 per token; base 31 per doc)
    "q_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ts,
        |    t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |           list_transform(string_split(t, ''),
        |             c -> CAST(unicode(c) AS BIGINT))),
        |         (a, c) -> (a * 131 + c) % 1000000007))),
        |  (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
        |FROM toks""".stripMargin,

    // portable two-round multiplicative-hash bucket (Sampling.bucket):
    // ((((id+s) % 1000003) * 2654435761 + s) % 1e6
    //  + (((id+s) % 999983) * 2246822518) % 1e6) % 1e6
    // — identical exact integer arithmetic on both engines
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((((doc_id + 7) % 1000003) * 2654435761 + 7) % 1000000)
        |       + ((((doc_id + 7) % 999983) * 2246822518) % 1000000)) % 1000000 <
        |      (CASE WHEN lang = 'en' THEN 300000 ELSE 800000 END)""".stripMargin,

    // temperature mix (alpha = 0.5): weight = floor(sqrt(n)) is exact in
    // IEEE doubles on both engines, everything after is integer arithmetic
    // (floor division) — membership reproduces bit-for-bit
    "q_sample_temperature" ->
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |wt AS (SELECT lang, n,
        |         GREATEST(1, CAST(FLOOR(SQRT(n)) AS BIGINT)) AS w FROM cnt),
        |z AS (SELECT CAST(SUM(w) AS BIGINT) AS z FROM wt),
        |thr AS (SELECT lang,
        |          LEAST(1000000, (1000000 * 200 * w) // (z.z * n)) AS t
        |        FROM wt, z)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN thr USING (lang)
        |WHERE (((((doc_id + 5) % 1000003) * 2654435761 + 5) % 1000000)
        |       + ((((doc_id + 5) % 999983) * 2246822518) % 1000000)) % 1000000 < thr.t""".stripMargin,

    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 800000 THEN 'train'
        |       WHEN b < 900000 THEN 'val'
        |       WHEN b < 1000000 THEN 'test' END AS split
        |FROM (SELECT doc_id,
        |        (((((doc_id + 3) % 1000003) * 2654435761 + 3) % 1000000)
        |         + ((((doc_id + 3) % 999983) * 2246822518) % 1000000)) % 1000000 AS b
        |      FROM documents)""".stripMargin,

    "q_quota_topk" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS n,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS nd,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS na,
        |    greatest(length(text), 1) AS lt
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    round(least(n * 1.0 / 64.0, 1.0) * 0.3 +
        |          (na * 1.0 / lt) * 0.35 +
        |          (nd * 1.0 / n) * 0.35, 6) AS quality
        |  FROM base)
        |SELECT doc_id, lang, quality FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |            ORDER BY quality DESC, doc_id) AS rk FROM scored)
        |WHERE rk <= 10""".stripMargin,

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(range(1, len(w)),
        |                i -> array_to_string(w[i:i+1], ' ')) END AS bg
        |  FROM t),
        |m AS (
        |  SELECT doc_id,
        |    CASE WHEN len(bg) <= 0 THEN 0.0
        |         ELSE 1.0 - len(list_distinct(bg)) * 1.0 / len(bg) END AS dup_raw,
        |    list_max(list_transform(list_distinct(w),
        |      d -> len(list_filter(w, x -> x = d)))) * 1.0
        |      / greatest(len(w), 1) AS top_raw
        |  FROM g)
        |SELECT doc_id, round(dup_raw, 6) AS dup_bigram,
        |       round(top_raw, 6) AS top_token,
        |       (dup_raw <= 0.2 AND top_raw <= 0.3) AS rep_ok
        |FROM m""".stripMargin,

    "q_corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 6) AS mean_tokens,
        |  round(percentile_cont(0.5) WITHIN GROUP
        |    (ORDER BY len(regexp_split_to_array(trim(text), '\s+'))), 6) AS p50_tokens,
        |  round(percentile_cont(0.9) WITHIN GROUP
        |    (ORDER BY len(regexp_split_to_array(trim(text), '\s+'))), 6) AS p90_tokens
        |FROM documents GROUP BY lang""".stripMargin,

    "q_vocab_topk" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    // overlap computed on string grams here, on xxhash64(gram) in Spark —
    // identical row sets modulo 64-bit hash collisions (~1e-12 at this scale)
    "q_decontam" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 5 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(range(1, len(w) - 3),
        |                i -> array_to_string(w[i:i+4], ' ')) END AS gs
        |  FROM t),
        |bench AS (
        |  SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(gs) AS gr FROM g) x
        |  JOIN bench USING (gr))
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin,

    // the bloom-prefiltered path must equal the exact path row-for-row —
    // SAME oracle as q_decontam (false positives die in the exact verify;
    // false negatives are impossible)
    "q_decontam_bloom" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 5 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(range(1, len(w) - 3),
        |                i -> array_to_string(w[i:i+4], ' ')) END AS gs
        |  FROM t),
        |bench AS (
        |  SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(gs) AS gr FROM g) x
        |  JOIN bench USING (gr))
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin,

    // exact percentiles recomputed by the oracle; the t-digest bound is
    // the literal quality contract (the sketch itself is engine-specific)
    "q_corpus_pctl" ->
      """SELECT lang,
        |  round(percentile_cont(0.5) WITHIN GROUP
        |    (ORDER BY len(regexp_split_to_array(trim(text), '\s+'))), 6) AS p50_exact,
        |  round(percentile_cont(0.9) WITHIN GROUP
        |    (ORDER BY len(regexp_split_to_array(trim(text), '\s+'))), 6) AS p90_exact,
        |  true AS approx_ok
        |FROM documents GROUP BY lang""".stripMargin,

    // exact side recomputed by the oracle; the HLL++ bound is the literal
    // quality contract (the estimate itself is engine-specific)
    "q_vocab_size" ->
      """SELECT count(DISTINCT token) AS n_exact, true AS approx_ok
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |      FROM documents)""".stripMargin,

    // round-trip check: Spark ENCODES real PNG/WAV/JPEG headers from
    // id-derived parameters and PARSES them back (marker-stream walk for
    // JPEG's SOF0); the oracle computes the parameters directly — any
    // encode/parse asymmetry breaks the value match
    "q_media_meta" ->
      """SELECT id AS media_id,
        |  CASE id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
        |  CASE WHEN id % 3 = 0 THEN CAST(16 + id % 64 AS INTEGER)
        |       WHEN id % 3 = 2 THEN CAST(16 + id % 96 AS INTEGER) END AS width,
        |  CASE WHEN id % 3 = 0 THEN CAST(16 + id % 48 AS INTEGER)
        |       WHEN id % 3 = 2 THEN CAST(16 + id % 80 AS INTEGER) END AS height,
        |  CASE WHEN id % 3 = 1 THEN CAST(8000 + (id % 4) * 8000 AS INTEGER) END AS sample_rate,
        |  CASE WHEN id % 3 = 1 THEN CAST(1 + (id // 2) % 2 AS INTEGER) END AS channels
        |FROM range(300) t(id)""".stripMargin,

    // PQ replayed from the DUMPED trained codebook (q_pq_codebook — the
    // two-table-dump pattern): encode = rounded-6dp L2 argmax per
    // subspace (ties -> lowest code), reconstructed norm from the dumped
    // per-(j,c) squared norms, per-query LUT, ADC ranking (40 = k x
    // overscan candidates), exact rounded-cosine rescore. m=8, ksub=16,
    // d=8 (the gate's literal config).
    "q_ann_pq" ->
      """WITH cb AS (SELECT j, c, dim, w, sqn
        |            FROM read_parquet('__GRAFT_OUT__/q_pq_codebook/*.parquet')),
        |e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |sc AS (SELECT e.vec_id, cb.j, cb.c,
        |         round(sum(e.v[cb.j*8 + cb.dim + 1] * cb.w)
        |               - any_value(cb.sqn)/2, 6) AS score
        |       FROM e CROSS JOIN cb GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j
        |                         ORDER BY score DESC, c) AS rk
        |    FROM sc) WHERE rk = 1),
        |sq AS (SELECT DISTINCT j, c, sqn FROM cb),
        |recon AS (SELECT codes.vec_id, sqrt(sum(sq.sqn)) AS recon_norm
        |          FROM codes JOIN sq ON sq.j = codes.j AND sq.c = codes.code
        |          GROUP BY 1),
        |q AS (SELECT vec_id AS query_id, v,
        |             sqrt(list_sum(list_transform(v, x -> x*x))) AS qnorm
        |      FROM e WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, cb.j, cb.c,
        |               sum(q.v[cb.j*8 + cb.dim + 1] * cb.w) AS l
        |        FROM q CROSS JOIN cb GROUP BY 1, 2, 3),
        |adc AS (SELECT q.query_id, codes.vec_id AS item_id,
        |          round(sum(lut.l) / (any_value(q.qnorm)
        |                              * any_value(recon.recon_norm)), 6) AS acos
        |        FROM q
        |        JOIN codes ON codes.vec_id <> q.query_id
        |        JOIN lut ON lut.query_id = q.query_id
        |               AND lut.j = codes.j AND lut.c = codes.code
        |        JOIN recon ON recon.vec_id = codes.vec_id
        |        GROUP BY 1, 2),
        |cand AS (SELECT query_id, item_id FROM (
        |    SELECT query_id, item_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY acos DESC, item_id) AS ark
        |    FROM adc) WHERE ark <= 40),
        |f3 AS (SELECT cand.query_id, cand.item_id,
        |         CAST(unnest(qq.embedding) AS DOUBLE) AS qx,
        |         CAST(unnest(ee.embedding) AS DOUBLE) AS cx
        |       FROM cand
        |       JOIN embeddings qq ON qq.vec_id = cand.query_id
        |       JOIN embeddings ee ON ee.vec_id = cand.item_id),
        |d3 AS (SELECT query_id, item_id, sum(qx*cx) AS dp,
        |              sum(qx*qx) AS nq, sum(cx*cx) AS nc
        |       FROM f3 GROUP BY 1, 2),
        |scored AS (SELECT query_id, item_id,
        |                  round(dp/(sqrt(nq)*sqrt(nc)), 6) AS cos FROM d3)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // the COMPOSED IVF-PQ replay: the q_ann_ivf seed/assign/probe (8
    // cells by portable hash, nProbe=3) gates WHICH items are ADC-scored;
    // the q_ann_pq dumped-codebook encode/LUT/ADC scores them; exact
    // rescore of the 40 candidates ranks the final 5
    "q_ann_ivfpq" ->
      """WITH cb AS (SELECT j, c, dim, w, sqn
        |            FROM read_parquet('__GRAFT_OUT__/q_pq_codebook/*.parquet')),
        |h AS (
        |  SELECT vec_id, embedding,
        |    ((((vec_id+41) % 1000003) * 2654435761 + 41) % 1000000
        |     + (((vec_id+41) % 999983) * 2246822518) % 1000000) % 1000000 AS hk
        |  FROM embeddings),
        |s AS (SELECT vec_id AS cell, embedding AS cv FROM h
        |      ORDER BY hk, vec_id LIMIT 8),
        |e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |f1 AS (SELECT e2.vec_id, s.cell,
        |         CAST(unnest(e2.embedding) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |       FROM embeddings e2 CROSS JOIN s),
        |d1 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f1 GROUP BY 1, 2),
        |assign AS (SELECT vec_id AS item_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d1) WHERE rk = 1),
        |q AS (SELECT vec_id AS query_id, v,
        |             sqrt(list_sum(list_transform(v, x -> x*x))) AS qnorm
        |      FROM e WHERE vec_id < 8),
        |f2 AS (SELECT qq.vec_id AS query_id, s.cell,
        |         CAST(unnest(qq.embedding) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |       FROM embeddings qq CROSS JOIN s WHERE qq.vec_id < 8),
        |d2 AS (SELECT query_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f2 GROUP BY 1, 2),
        |probe AS (SELECT query_id, cell FROM (
        |    SELECT query_id, cell,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS crk
        |    FROM d2) WHERE crk <= 3),
        |sc AS (SELECT e.vec_id, cb.j, cb.c,
        |         round(sum(e.v[cb.j*8 + cb.dim + 1] * cb.w)
        |               - any_value(cb.sqn)/2, 6) AS score
        |       FROM e CROSS JOIN cb GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j
        |                         ORDER BY score DESC, c) AS rk
        |    FROM sc) WHERE rk = 1),
        |sq AS (SELECT DISTINCT j, c, sqn FROM cb),
        |recon AS (SELECT codes.vec_id, sqrt(sum(sq.sqn)) AS recon_norm
        |          FROM codes JOIN sq ON sq.j = codes.j AND sq.c = codes.code
        |          GROUP BY 1),
        |lut AS (SELECT q.query_id, cb.j, cb.c,
        |               sum(q.v[cb.j*8 + cb.dim + 1] * cb.w) AS l
        |        FROM q CROSS JOIN cb GROUP BY 1, 2, 3),
        |probed AS (SELECT p.query_id, a.item_id
        |           FROM probe p JOIN assign a USING (cell)
        |           WHERE a.item_id <> p.query_id),
        |adc AS (SELECT pr.query_id, pr.item_id,
        |          round(sum(lut.l) / (any_value(q.qnorm)
        |                              * any_value(recon.recon_norm)), 6) AS acos
        |        FROM probed pr
        |        JOIN q ON q.query_id = pr.query_id
        |        JOIN codes ON codes.vec_id = pr.item_id
        |        JOIN lut ON lut.query_id = pr.query_id
        |               AND lut.j = codes.j AND lut.c = codes.code
        |        JOIN recon ON recon.vec_id = pr.item_id
        |        GROUP BY 1, 2),
        |cand AS (SELECT query_id, item_id FROM (
        |    SELECT query_id, item_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY acos DESC, item_id) AS ark
        |    FROM adc) WHERE ark <= 40),
        |f3 AS (SELECT cand.query_id, cand.item_id,
        |         CAST(unnest(qq.embedding) AS DOUBLE) AS qx,
        |         CAST(unnest(ee.embedding) AS DOUBLE) AS cx
        |       FROM cand
        |       JOIN embeddings qq ON qq.vec_id = cand.query_id
        |       JOIN embeddings ee ON ee.vec_id = cand.item_id),
        |d3 AS (SELECT query_id, item_id, sum(qx*cx) AS dp,
        |              sum(qx*qx) AS nq, sum(cx*cx) AS nc
        |       FROM f3 GROUP BY 1, 2),
        |scored AS (SELECT query_id, item_id,
        |                  round(dp/(sqrt(nq)*sqrt(nc)), 6) AS cos FROM d3)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT query_id, item_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // materialized-layout parity: q_ann_ivfpq_mat serves IVF-PQ from the
    // cell-partitioned encode TABLE (partition-pruned probe); its oracle is
    // the in-memory path's dump — the production layout must reproduce it
    // row-for-row (two-table-dump pattern; quality itself is gated by
    // q_ann_recall's ivf_pq_full exactness floor)
    "q_ann_ivfpq_mat" ->
      """SELECT query_id, item_id, rank, cos
        |FROM read_parquet('__GRAFT_OUT__/q_ann_ivfpq/*.parquet')""".stripMargin,

    // streaming incremental-merge gates: Spark runs a REAL checkpointed
    // Structured Streaming job (3 one-file micro-batches, AvailableNow,
    // maxFilesPerTrigger=1) merging events-derived triples through
    // batch-id-idempotent snapshot commits, then replays batch 1 (must
    // skip); the oracle is the equivalent ONE-SHOT batch merge — any
    // double-count, dropped batch, or update-wins on the sum-accumulated
    // props breaks the value match
    "q_incremental" ->
      """WITH trip AS (
        |  SELECT 'user:' || user_id AS subj, event_type AS pred,
        |         'bucket:' || CAST(FLOOR(value / 100) AS BIGINT) AS obj
        |  FROM events)
        |SELECT name, count(*) AS mention_count
        |FROM (SELECT subj AS name FROM trip UNION ALL SELECT obj AS name FROM trip)
        |GROUP BY 1""".stripMargin,

    "q_incremental_edges" ->
      """SELECT 'user:' || user_id AS start_name,
        |       'bucket:' || CAST(FLOOR(value / 100) AS BIGINT) AS end_name,
        |       event_type AS pred, count(*) AS support
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    // closed sessions of the multi-micro-batch tracker = the one-shot
    // batch recompute per conversation
    "q_stream_sessions" ->
      """WITH turns AS (
        |  SELECT 'c:' || user_id AS conv_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) - 1 AS turn_idx,
        |         event_type AS role, ts
        |  FROM events)
        |SELECT conv_id, count(*) AS n_turns,
        |       min(ts) AS first_ts, max(ts) AS last_ts,
        |       max_by(role, turn_idx) AS last_role
        |FROM turns GROUP BY conv_id""".stripMargin,

    // the streaming dedup must keep EXACTLY one row per distinct text
    "q_stream_dedup" ->
      """SELECT sha256(text) AS h, CAST(1 AS BIGINT) AS n_kept
        |FROM (SELECT DISTINCT text FROM documents)""".stripMargin,

    // the multi-micro-batch stream-stream join must equal this BATCH
    // interval join exactly (even ids left, odd ids right, r.ts within
    // [l.ts, l.ts + 10 min] per user)
    "q_stream_join" ->
      """SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
        |WHERE l.event_id % 2 = 0 AND r.event_id % 2 = 1""".stripMargin,

    // PNG pixel-decode gate: Spark ENCODES 120 real PNGs (zlib IDAT, CRCs,
    // per-row filter = row % 5) from the closed-form pixel formula, DECODES
    // them back pure-JVM, and aggregates per-channel stats; the oracle
    // recomputes the same stats from the formula alone — the codec never
    // runs in DuckDB, so a wrong unfilter/inflate/stride breaks the hash
    "q_pixel_stats" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 120)),
        |xs AS (SELECT range AS x FROM range(0, 17)),
        |ys AS (SELECT range AS y FROM range(0, 15)),
        |cs AS (SELECT range AS c FROM range(0, 3)),
        |img AS (SELECT id, 8 + id % 9 AS w, 8 + id % 7 AS h FROM ids),
        |px AS (SELECT id, c, (3 * x + 5 * y + 7 * id + 11 * c) % 256 AS v
        |       FROM img, xs, ys, cs WHERE x < w AND y < h)
        |SELECT id AS media_id, CAST(c AS INTEGER) AS channel,
        |       count(*) AS n_px, ROUND(AVG(v), 6) AS mean,
        |       CAST(MIN(v) AS INTEGER) AS vmin, CAST(MAX(v) AS INTEGER) AS vmax
        |FROM px GROUP BY 1, 2""".stripMargin,

    // resized pixels stay closed-form through the floor index mapping:
    // src = (x'·w)//newW, (y'·h)//newH — no resampler runs in DuckDB
    "q_resize_stats" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 120)),
        |xs AS (SELECT range AS x FROM range(0, 6)),
        |ys AS (SELECT range AS y FROM range(0, 5)),
        |cs AS (SELECT range AS c FROM range(0, 3)),
        |img AS (SELECT id, 8 + id % 9 AS w, 8 + id % 7 AS h FROM ids),
        |px AS (SELECT id, c,
        |         (3 * ((x * w) // 6) + 5 * ((y * h) // 5)
        |          + 7 * id + 11 * c) % 256 AS v
        |       FROM img, xs, ys, cs)
        |SELECT id AS media_id, CAST(c AS INTEGER) AS channel,
        |       count(*) AS n_px, ROUND(AVG(v), 6) AS mean,
        |       CAST(MIN(v) AS INTEGER) AS vmin, CAST(MAX(v) AS INTEGER) AS vmax
        |FROM px GROUP BY 1, 2""".stripMargin,

    // decimation keeps frames ≡ 0 (mod 3) of the closed-form samples and
    // integer-divides the rate
    "q_audio_decimate" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 90)),
        |fs AS (SELECT range AS f FROM range(0, 100)),
        |chs AS (SELECT range AS c FROM range(0, 2)),
        |au AS (SELECT id,
        |         CAST((8000 + (id % 3) * 4000) // 3 AS INTEGER) AS sample_rate,
        |         1 + id % 2 AS nch, 50 + id % 50 AS nframes FROM ids),
        |smp AS (SELECT id, sample_rate, c,
        |               ((13 * f + 7 * id + 17 * c) % 4001) - 2000 AS v
        |        FROM au, fs, chs
        |        WHERE f < nframes AND f % 3 = 0 AND c < nch)
        |SELECT id AS media_id, sample_rate, CAST(c AS INTEGER) AS channel,
        |       count(*) AS n_samp, ROUND(AVG(v), 6) AS mean,
        |       CAST(MIN(v) AS INTEGER) AS vmin, CAST(MAX(v) AS INTEGER) AS vmax
        |FROM smp GROUP BY 1, 2, 3""".stripMargin,

    // WAV sample decode: the oracle recomputes the closed-form PCM samples
    // (integer arithmetic; AVG sums stay exact in doubles) — the codec
    // itself never runs in DuckDB
    "q_audio_stats" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 90)),
        |fs AS (SELECT range AS f FROM range(0, 100)),
        |chs AS (SELECT range AS c FROM range(0, 2)),
        |au AS (SELECT id, CAST(8000 + (id % 3) * 4000 AS INTEGER) AS sample_rate,
        |              1 + id % 2 AS nch, 50 + id % 50 AS nframes FROM ids),
        |smp AS (SELECT id, sample_rate, c,
        |               ((13 * f + 7 * id + 17 * c) % 4001) - 2000 AS v
        |        FROM au, fs, chs WHERE f < nframes AND c < nch)
        |SELECT id AS media_id, sample_rate, CAST(c AS INTEGER) AS channel,
        |       count(*) AS n_samp, ROUND(AVG(v), 6) AS mean,
        |       CAST(MIN(v) AS INTEGER) AS vmin, CAST(MAX(v) AS INTEGER) AS vmax,
        |       ROUND(AVG(v * v), 6) AS mean_sq
        |FROM smp GROUP BY 1, 2, 3""".stripMargin,

    "q_pack" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    ((((((doc_id + 11) % 1000003) * 2654435761 + 11) % 1000000)
        |      + ((((doc_id + 11) % 999983) * 2246822518) % 1000000)) % 1000000) % 4 AS shard,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  shard * 4294967296 +
        |  CAST(floor((sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) - toks)
        |             / 200.0) AS BIGINT) AS pack_id
        |FROM base""".stripMargin,

    // same ordered rewrites (URL, EMAIL, IP, NUM) over the same synthetic
    // input; regexes stay in the Java-regex ∩ RE2 common dialect
    "q_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    concat_ws(' ', text,
        |      'contact', 'user' || CAST(doc_id AS VARCHAR) || '@example.com',
        |      'at', 'http://site' || CAST(doc_id AS VARCHAR) || '.com/path?q=1',
        |      'ip', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7',
        |      'acct', '9' || lpad(CAST(doc_id % 100000 AS VARCHAR), 7, '0')),
        |    'https?://\S+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{7,}\b', '<NUM>', 'g') AS scrubbed
        |FROM documents""".stripMargin,

    "q_quantize" ->
      """WITH s AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |         list_max(list_transform(embedding,
        |           x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |         list_transform(e, x -> CASE WHEN scale = 0 THEN 0
        |           ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END) AS qs
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |       CAST(list_sum(qs) AS BIGINT) AS q_sum,
        |       CAST(list_min(qs) AS INTEGER) AS q_min,
        |       CAST(list_max(qs) AS INTEGER) AS q_max
        |FROM q""".stripMargin,

    // MinHash-LSH is approximate, but at jaccard >= 0.9 with 16 bands x 2
    // rows the miss probability is ~3e-12, so the exact-Jaccard SQL is a
    // valid oracle for the verified pair set.
    "q_minhash_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(w) - 1),
        |              i -> array_to_string(w[i:i+2], ' ')))
        |  END AS s FROM t)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  round(len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9""".stripMargin,

    // components over the exact-Jaccard >= 0.9 pair graph; drop non-min ids
    "q_minhash_dedup" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(w) - 1),
        |              i -> array_to_string(w[i:i+2], ' ')))
        |  END AS s FROM t),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(n, m) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
        |losers AS (
        |  SELECT n AS id FROM reach GROUP BY n HAVING n <> min(m))
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    // keep-best variant: survivor = argmax(rounded quality, min id) per
    // component; the quality formula is the portable one from q_quality
    "q_minhash_dedup_best" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(w) - 1),
        |              i -> array_to_string(w[i:i+2], ' ')))
        |  END AS s FROM t),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(n, m) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
        |comp AS (SELECT n AS id, min(m) AS root FROM reach GROUP BY n),
        |base AS (
        |  SELECT doc_id,
        |    greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS n,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS nd,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS na,
        |    greatest(length(text), 1) AS lt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    round(least(n * 1.0 / 64.0, 1.0) * 0.3 +
        |          (na * 1.0 / lt) * 0.35 +
        |          (nd * 1.0 / n) * 0.35, 6) AS q6
        |  FROM base),
        |losers AS (
        |  SELECT id FROM (
        |    SELECT c.id,
        |           row_number() OVER (PARTITION BY c.root
        |             ORDER BY q.q6 DESC, c.id) AS rk
        |    FROM comp c JOIN q ON q.doc_id = c.id)
        |  WHERE rk > 1)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    "q_kg_triples" ->
      """SELECT 'user:' || user_id AS subj, event_type AS pred,
        |       'bucket:' || CAST(FLOOR(value / 100) AS BIGINT) AS obj,
        |       count(*) AS support
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_kg_entities" ->
      """WITH tr AS (
        |  SELECT 'user:' || user_id AS subj, event_type AS pred,
        |         'bucket:' || CAST(FLOOR(value / 100) AS BIGINT) AS obj,
        |         count(*) AS support
        |  FROM events GROUP BY 1, 2, 3),
        |u AS (SELECT subj AS name, support FROM tr
        |      UNION ALL SELECT obj AS name, support FROM tr)
        |SELECT name, CAST(sum(support) AS BIGINT) AS mentions FROM u GROUP BY 1""".stripMargin,

    "q_cc_events" ->
      """WITH RECURSIVE ed AS (
        |  SELECT DISTINCT 'u:' || user_id AS a, 'e:' || event_type AS b FROM events),
        |und AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
        |reach(n, m) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a)
        |SELECT n AS node, min(m) AS component FROM reach GROUP BY n""".stripMargin,

    "q_window_agg" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |agg AS (
        |  SELECT user_id, count(*) AS n_turns, min(ts) AS first_ts,
        |         max(ts) AS last_ts, max(rn) AS maxrn
        |  FROM r GROUP BY 1)
        |SELECT CAST(a.user_id AS VARCHAR) AS conv_id,
        |       CAST(a.n_turns AS BIGINT) AS n_turns,
        |       a.first_ts, a.last_ts,
        |       r.event_type AS last_role, false AS closed
        |FROM agg a JOIN r ON r.user_id = a.user_id AND r.rn = a.maxrn""".stripMargin,

    "q_comention" ->
      """WITH ge AS (SELECT DISTINCT user_id AS g, event_type AS e FROM events)
        |SELECT l.e AS a, r.e AS b, count(DISTINCT l.g) AS n_groups
        |FROM ge l JOIN ge r ON l.g = r.g AND l.e < r.e
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_khop" ->
      """WITH RECURSIVE ed AS (
        |  SELECT DISTINCT 'u:' || user_id AS src, 'e:' || event_type AS dst FROM events),
        |und AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
        |reach(node, hops) AS (
        |  SELECT 'u:1', 0
        |  UNION ALL
        |  SELECT u.dst, r.hops + 1 FROM reach r JOIN und u ON r.node = u.src
        |  WHERE r.hops < 3)
        |SELECT node, CAST(min(hops) AS INTEGER) AS hops FROM reach GROUP BY node""".stripMargin,

    "q_temporal_validity" ->
      """SELECT user_id AS uid, min(ts) AS first_seen, max(ts) AS last_seen,
        |       count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // trailing 24h RANGE frame on epoch micros; integer cents keep the
    // sum order-insensitive (float sums accumulate in frame order)
    "q_rolling" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS cents_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // sliding-window chunking: stride 24 = maxTokens 32 − overlap 8; the
    // chunk text itself is value-compared, so any off-by-one in the
    // window math or slice bounds breaks the hash
    "q_chunk" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM base),
        |k AS (SELECT doc_id, toks, n,
        |        unnest(generate_series(0, GREATEST(0, CAST((n - 32 + 23) // 24 AS BIGINT)))) AS chunk_idx
        |      FROM n)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |       array_to_string(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)], ' ') AS chunk_text,
        |       CAST(len(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)]) AS INTEGER) AS n_tok
        |FROM k""".stripMargin,

    // as-of join: DuckDB's NATIVE ASOF LEFT JOIN is an independent
    // implementation of the backward-inclusive point-in-time semantics
    "q_asof" ->
      """SELECT l.event_id, l.user_id, l.ts,
        |       r.event_id AS asof_event_id, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // same epoch-aligned buckets; open/close via min_by/max_by over the
    // (µs, event_id) total order — encoded here as one HUGEINT
    // us·10^9 + event_id (same order as Spark's struct comparison while
    // event_id < 10^9)
    "q_ohlc" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id, value
        |           FROM events
        |           WHERE event_type = 'purchase' AND value IS NOT NULL)
        |SELECT user_id,
        |       make_timestamp(us - us % 21600000000) AS bar_ts,
        |       min_by(value, CAST(us AS HUGEINT) * 1000000000 + event_id) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max_by(value, CAST(us AS HUGEINT) * 1000000000 + event_id) AS close,
        |       count(*) AS n
        |FROM p GROUP BY 1, 2""".stripMargin,

    // reference-anchored 10-bin PSI with explicit Laplace smoothing:
    // p = (n_e+1)/(N_e+10), q = (n_a+1)/(N_a+10), term = (q-p)·ln(q/p)
    "q_psi" ->
      """WITH e AS (SELECT value FROM events
        |           WHERE event_type = 'purchase' AND value IS NOT NULL),
        |a AS (SELECT value FROM events
        |      WHERE event_type = 'view' AND value IS NOT NULL),
        |b AS (SELECT min(value) AS lo, max(value) AS hi FROM e),
        |eb AS (SELECT CASE WHEN b.hi = b.lo THEN 0
        |         ELSE greatest(0, least(9,
        |           CAST(floor((value - b.lo) * 10 / (b.hi - b.lo)) AS BIGINT)))
        |       END AS bin, count(*) AS n
        |       FROM e CROSS JOIN b GROUP BY 1),
        |ab AS (SELECT CASE WHEN b.hi = b.lo THEN 0
        |         ELSE greatest(0, least(9,
        |           CAST(floor((value - b.lo) * 10 / (b.hi - b.lo)) AS BIGINT)))
        |       END AS bin, count(*) AS n
        |       FROM a CROSS JOIN b GROUP BY 1),
        |bins AS (SELECT range AS bin FROM range(0, 10)),
        |j AS (SELECT bins.bin, coalesce(eb.n, 0) AS ne, coalesce(ab.n, 0) AS na
        |      FROM bins LEFT JOIN eb USING (bin) LEFT JOIN ab USING (bin)),
        |t AS (SELECT sum(ne) AS te, sum(na) AS ta FROM j)
        |SELECT j.bin, j.ne AS n_expected, j.na AS n_actual,
        |  round(((j.na + 1.0) / (t.ta + 10) - (j.ne + 1.0) / (t.te + 10))
        |        * ln(((j.na + 1.0) / (t.ta + 10))
        |             / ((j.ne + 1.0) / (t.te + 10))), 6) AS psi_term
        |FROM j CROSS JOIN t""".stripMargin,

    // gold lang vs the q_lang_id replay, then the kappa arithmetic:
    // po = agree/N, pe = sum(na·nb)/N² over shared labels
    "q_kappa" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |              FROM documents),
        |sc AS (
        |  SELECT doc_id, 'de' AS lang,
        |    len(list_filter(t, x -> x IN ('der','die','und','das','ist','von','den','ein'))) * 1.0 / greatest(len(t), 1) AS score FROM toks
        |  UNION ALL SELECT doc_id, 'en',
        |    len(list_filter(t, x -> x IN ('the','and','of','to','a','in','is','that'))) * 1.0 / greatest(len(t), 1) FROM toks
        |  UNION ALL SELECT doc_id, 'es',
        |    len(list_filter(t, x -> x IN ('el','la','de','que','y','en','los','del'))) * 1.0 / greatest(len(t), 1) FROM toks
        |  UNION ALL SELECT doc_id, 'fr',
        |    len(list_filter(t, x -> x IN ('le','la','de','et','les','des','un','est'))) * 1.0 / greatest(len(t), 1) FROM toks),
        |pred AS (SELECT doc_id, lang AS b FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
        |  FROM sc) WHERE rn = 1),
        |j AS (SELECT d.lang AS a, p.b
        |      FROM documents d JOIN pred p USING (doc_id)
        |      WHERE d.lang IS NOT NULL),
        |tot AS (SELECT count(*) AS n,
        |               sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
        |        FROM j),
        |ma AS (SELECT a AS c, count(*) AS na FROM j GROUP BY 1),
        |mb AS (SELECT b AS c, count(*) AS nb FROM j GROUP BY 1),
        |pe2 AS (SELECT coalesce(sum(ma.na * mb.nb), 0) AS pe2
        |        FROM ma JOIN mb USING (c))
        |SELECT tot.n AS n_items,
        |  round(tot.agree / tot.n, 6) AS po,
        |  round(pe2.pe2 / (tot.n * tot.n), 6) AS pe,
        |  CASE WHEN pe2.pe2 / (tot.n * tot.n) < 1 THEN
        |    round((tot.agree / tot.n - pe2.pe2 / (tot.n * tot.n))
        |          / (1.0 - pe2.pe2 / (tot.n * tot.n)), 6)
        |  END AS kappa
        |FROM tot CROSS JOIN pe2""".stripMargin,

    // per-cell MI contributions: (n_xy/N)·ln(N·n_xy/(n_x·n_y))
    "q_mi" ->
      """WITH b AS (SELECT lang AS x, source AS y FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL),
        |j AS (SELECT x, y, count(*) AS n_xy FROM b GROUP BY 1, 2),
        |mx AS (SELECT x, count(*) AS nx FROM b GROUP BY 1),
        |my AS (SELECT y, count(*) AS ny FROM b GROUP BY 1),
        |t AS (SELECT sum(n_xy) * 1.0 AS n FROM j)
        |SELECT j.x, j.y, j.n_xy,
        |  round((j.n_xy / t.n) * ln(t.n * j.n_xy / (mx.nx * my.ny)), 6)
        |    AS mi_term
        |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t""".stripMargin,

    // the same epoch-aligned 6-hour grid regenerated per user, LOCF via
    // DuckDB's NATIVE ASOF LEFT JOIN (the q_asof independent-implementation
    // precedent)
    "q_resample_locf" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |span AS (SELECT user_id, min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |         FROM p GROUP BY 1),
        |grid AS (SELECT user_id, make_timestamp(g) AS grid_ts
        |         FROM span,
        |              unnest(generate_series(lo - lo % 21600000000,
        |                                     hi, 21600000000)) AS t(g))
        |SELECT g.user_id, g.grid_ts,
        |       r.event_id AS asof_event_id, r.value AS asof_value
        |FROM grid g ASOF LEFT JOIN p r
        |  ON g.user_id = r.user_id AND g.grid_ts >= r.ts""".stripMargin,

    // the naive BETWEEN range join — the banded equi-join must reproduce
    // it exactly, band-boundary rows included
    "q_interval_join" ->
      """WITH w AS (SELECT user_id, ts AS ws, ts + INTERVAL 2 HOUR AS we,
        |                  event_id AS wid
        |           FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, count(*) AS n_win,
        |       min(w.wid) AS first_win, max(w.wid) AS last_win
        |FROM events e JOIN w ON e.user_id = w.user_id
        |                    AND e.ts >= w.ws AND e.ts <= w.we
        |GROUP BY e.event_id""".stripMargin,

    // integer-valued quantities sum exactly; NULL rollup markers → 'ALL'
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    // the oracle recomputes the exact top-20 counts; the CMS bound
    // boolean must be TRUE on every row (sketch overcount ≤ 2N/width)
    "q_heavy_hitters" ->
      """SELECT token, count(*) AS n, TRUE AS cm_ok
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // first-touch funnel unrolled as a join chain: each stage's anchor is
    // the min qualifying ts strictly after (and within 6 h of) the
    // previous stage's anchor
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.t
        |         AND e.ts <= t1.t + INTERVAL 6 HOUR
        |       GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t
        |         AND e.ts <= t2.t + INTERVAL 6 HOUR
        |       GROUP BY e.user_id)
        |SELECT 0 AS stage_idx, 'view' AS stage,
        |       (SELECT count(*) FROM t1) AS n_users
        |UNION ALL SELECT 1, 'click', (SELECT count(*) FROM t2)
        |UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM t3)""".stripMargin,

    // Monday-start weeks on both engines; offsets are exact whole weeks
    "q_cohort" ->
      """WITH f AS (SELECT user_id, ts,
        |             min(ts) OVER (PARTITION BY user_id) AS first_ts
        |           FROM events)
        |SELECT date_trunc('week', first_ts) AS cohort_week,
        |       CAST(floor(date_diff('day', date_trunc('week', first_ts),
        |                            date_trunc('week', ts)) / 7) AS INT)
        |         AS week_offset,
        |       count(DISTINCT user_id) AS n_active
        |FROM f GROUP BY 1, 2""".stripMargin,

    // threshold applied to the 6-dp-rounded z on both sides
    "q_outliers" ->
      """WITH s AS (SELECT event_id, event_type, value,
        |             round((value - avg(value) OVER (PARTITION BY event_type)) /
        |                   stddev_samp(value) OVER (PARTITION BY event_type), 6)
        |               AS z
        |           FROM events)
        |SELECT event_id, event_type, value, z FROM s
        |WHERE abs(z) >= 2.0""".stripMargin,

    // Okapi BM25 recomputed from the same whitespace tokenization;
    // 6-dp rounding + (score DESC, doc_id) total order on both sides
    "q_bm25" ->
      """WITH post AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |        FROM documents)
        |  WHERE term IN ('hash', 'join', 'vector')
        |  GROUP BY doc_id, term),
        |dl AS (SELECT doc_id,
        |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS dl
        |       FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY term)
        |SELECT doc_id, round(sum(
        |         ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) *
        |         p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
        |       ), 6) AS score
        |FROM post p JOIN dft f USING (term) JOIN dl d USING (doc_id)
        |CROSS JOIN stats s
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // byte-exact context strings: same reshape, same ROWS frame, same
    // frame order, newline-joined
    "q_context" ->
      """WITH turns AS (
        |  SELECT CAST(user_id AS VARCHAR) AS conv_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) - 1 AS turn_idx,
        |         event_type AS role, props AS text
        |  FROM events)
        |SELECT conv_id, turn_idx,
        |       coalesce(array_to_string(list(role || ': ' || text) OVER (
        |         PARTITION BY conv_id ORDER BY turn_idx
        |         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), chr(10)), '')
        |         AS context
        |FROM turns""".stripMargin,

    // adjacent same-role pairs under the same stable turn order
    "q_dialogue" ->
      """WITH turns AS (
        |  SELECT CAST(user_id AS VARCHAR) AS conv_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) - 1 AS turn_idx,
        |         event_type AS role
        |  FROM events),
        |x AS (SELECT conv_id, role,
        |        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
        |      FROM turns)
        |SELECT conv_id, count(*) AS n_turns,
        |       count(DISTINCT role) AS n_roles,
        |       CAST(sum(CASE WHEN prev = role THEN 1 ELSE 0 END) AS BIGINT)
        |         AS same_role_adjacent
        |FROM x GROUP BY conv_id""".stripMargin,

    // Levenshtein is the classic integer edit distance on both engines
    "q_fuzzy" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part)
        |SELECT a.nm AS a, b.nm AS b,
        |       CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON substr(a.nm, 1, 1) = substr(b.nm, 1, 1) AND a.nm < b.nm
        |WHERE levenshtein(a.nm, b.nm) <= 3""".stripMargin,

    // Jaro-Winkler values checked cell-by-cell on the Levenshtein-gated
    // pair set; DuckDB's jaro_winkler_similarity is the byte-level
    // semantics the native expression was pinned to
    "q_jaro_winkler" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part)
        |SELECT a.nm AS a, b.nm AS b,
        |       CAST(levenshtein(a.nm, b.nm) AS INT) AS dist,
        |       round(jaro_winkler_similarity(a.nm, b.nm), 6) AS jw
        |FROM n a JOIN n b
        |  ON substr(a.nm, 1, 1) = substr(b.nm, 1, 1) AND a.nm < b.nm
        |WHERE levenshtein(a.nm, b.nm) <= 3""".stripMargin,

    // SQL-standard ntile under the same (value, event_id) total order
    "q_ntile" ->
      """SELECT event_id, event_type,
        |       ntile(10) OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS decile
        |FROM events""".stripMargin,

    // first-order Markov transitions: lag under the (ts, event_id) total
    // order, then count + row-normalized probability (round 6)
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev AS from_type, event_type AS to_type, count(*) AS n,
        |       round(count(*) * 1.0 /
        |             sum(count(*)) OVER (PARTITION BY prev), 6) AS p
        |FROM seq WHERE prev IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // Efraimidis–Spirakis A-Res weighted sample: key = u^(1/w) with u the
    // portable two-round hash bucket midpoint, cut = top-50 under the
    // (rounded key DESC, doc_id) total order — same arithmetic both engines
    "q_sample_weighted" ->
      """SELECT doc_id, n_chars,
        |  round(pow(
        |    ((((doc_id % 1000003) * 2654435761) % 1000000
        |      + ((doc_id % 999983) * 2246822518) % 1000000) % 1000000
        |     + 0.5) / 1000000.0,
        |    1.0 / n_chars), 6) AS wkey
        |FROM documents WHERE n_chars > 0
        |ORDER BY wkey DESC, doc_id LIMIT 50""".stripMargin,

    // the same A-Res key, cut per language by a rank window
    "q_sample_weighted_grp" ->
      """SELECT doc_id, lang, wkey FROM (
        |  SELECT doc_id, lang, wkey,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY wkey DESC, doc_id) AS rk
        |  FROM (SELECT doc_id, lang,
        |    round(pow(
        |      ((((doc_id % 1000003) * 2654435761) % 1000000
        |        + ((doc_id % 999983) * 2246822518) % 1000000) % 1000000
        |       + 0.5) / 1000000.0,
        |      1.0 / n_chars), 6) AS wkey
        |    FROM documents WHERE n_chars > 0))
        |WHERE rk <= 10""".stripMargin,

    // global training-order permutation: rank under the (hash, doc_id)
    // total order — one window here, the sharded two-pass index in Spark
    "q_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY (((((doc_id + 17) % 1000003) * 2654435761 + 17) % 1000000)
        |              + ((((doc_id + 17) % 999983) * 2246822518) % 1000000))
        |             % 1000000,
        |             doc_id) - 1 AS pos
        |FROM documents""".stripMargin,

    // negatives replayed: permutation (salt 29) + composite partner hash
    // (salts 30/31, 10^12 range) + the self-collision +1 shift
    "q_negative_pairs" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      ORDER BY (((((doc_id + 29) % 1000003) * 2654435761 + 29) % 1000000)
        |                + ((((doc_id + 29) % 999983) * 2246822518) % 1000000))
        |               % 1000000,
        |               doc_id) - 1 AS pos
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM p),
        |a AS (SELECT p.doc_id AS anchor_id, p.pos AS apos, j.range AS j, nn.n,
        |        p.doc_id * 4 + j.range AS seed
        |      FROM p CROSS JOIN range(0, 4) j CROSS JOIN nn),
        |h AS (SELECT anchor_id, apos, j, n,
        |        ((((((seed + 30) % 1000003) * 2654435761 + 30) % 1000000)
        |          + ((((seed + 30) % 999983) * 2246822518) % 1000000)) % 1000000)
        |        * 1000000 +
        |        (((((seed + 31) % 1000003) * 2654435761 + 31) % 1000000)
        |         + ((((seed + 31) % 999983) * 2246822518) % 1000000)) % 1000000
        |        AS wide
        |      FROM a),
        |q AS (SELECT anchor_id, j,
        |        CASE WHEN wide % n = apos THEN (wide % n + 1) % n
        |             ELSE wide % n END AS ppos
        |      FROM h)
        |SELECT q.anchor_id, CAST(q.j AS INT) AS j, p.doc_id AS neg_id
        |FROM q JOIN p ON p.pos = q.ppos
        |WHERE p.doc_id <> q.anchor_id""".stripMargin,

    // JL projection replayed: plane weight (j,d) from the double-fold
    // hash at stride 4096, salt 23; y_j = Σ_d x_d·w(j,d), 6-dp
    "q_random_project" ->
      """WITH w AS (
        |  SELECT j.range AS j, d.range AS dim,
        |    (((j.range*4096 + d.range + 23) % 1000003 * 2654435761 + 23) % 1000000
        |     + ((j.range*4096 + d.range + 23) % 999983 * 2246822518) % 1000000)
        |    % 1000000 AS b
        |  FROM range(0, 16) j CROSS JOIN range(0, 64) d)
        |SELECT e.vec_id, CAST(w.j AS INT) AS j,
        |       round(sum(CAST(e.embedding[w.dim+1] AS DOUBLE)
        |                 * ((w.b + 0.5)/1000000.0 - 0.5)), 6) AS y
        |FROM embeddings e CROSS JOIN w
        |GROUP BY 1, 2""".stripMargin,

    // one portable Lloyd round: id-ordered seeds → rounded-cosine argmax
    // (ties to the lowest cell) → rounded per-dim means → final assign;
    // parallel unnests zip positionally (the q_ann_topk pattern)
    "q_kmeans" ->
      """WITH s AS (SELECT vec_id AS cell, embedding AS cv
        |           FROM embeddings ORDER BY vec_id LIMIT 8),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |f1 AS (
        |  SELECT e.vec_id, s.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |  FROM e CROSS JOIN s),
        |d1 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx,
        |              sum(c*c) AS nc
        |       FROM f1 GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |       FROM d1),
        |m1 AS (
        |  SELECT a1.cell, d.dim,
        |         round(avg(CAST(e.embedding[d.dim+1] AS DOUBLE)), 6) AS m
        |  FROM a1 JOIN e USING (vec_id)
        |  CROSS JOIN (SELECT range AS dim FROM range(0, 64)) d
        |  WHERE a1.rk = 1 GROUP BY 1, 2),
        |c1 AS (SELECT cell, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cell),
        |f2 AS (SELECT e.vec_id, c1.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x, unnest(c1.cv) AS c
        |       FROM e CROSS JOIN c1),
        |d2 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx,
        |              sum(c*c) AS nc
        |       FROM f2 GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cell, round(dp/(sqrt(nx)*sqrt(nc)), 6) AS cos,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |       FROM d2)
        |SELECT vec_id, cell, cos FROM a2 WHERE rk = 1""".stripMargin,

    // same bin arithmetic: ((v-lo)*20)/(hi-lo), floored, max folds into
    // the last bin
    "q_histogram" ->
      """WITH b AS (SELECT min(value) AS lo, max(value) AS hi
        |           FROM events WHERE value IS NOT NULL)
        |SELECT CASE WHEN b.hi = b.lo THEN 0
        |       ELSE LEAST(19, CAST(floor((value - b.lo) * 20 / (b.hi - b.lo))
        |                           AS BIGINT)) END AS bin,
        |       count(*) AS n
        |FROM events CROSS JOIN b WHERE value IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // the COMPOSED curation chain replayed end-to-end: quality (the
    // q_quota formula) → keep-first dedup → 5-gram decontam (q_decontam's
    // construction) → the salt-3 train cut (q_split's hash)
    "q_curation" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text,
        |    greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS n,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS nd,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS na,
        |    greatest(length(text), 1) AS lt
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang, text,
        |    round(least(n * 1.0 / 64.0, 1.0) * 0.3 + (na * 1.0 / lt) * 0.35 +
        |          (nd * 1.0 / n) * 0.35, 6) AS quality
        |  FROM base),
        |q AS (SELECT * FROM scored WHERE quality >= 0.5),
        |dd AS (SELECT * FROM (
        |        SELECT *, row_number() OVER (PARTITION BY text
        |                                     ORDER BY doc_id) AS rn
        |        FROM q) WHERE rn = 1),
        |t2 AS (SELECT doc_id,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |       FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(w) < 5 THEN CAST([] AS VARCHAR[])
        |             ELSE list_transform(range(1, len(w) - 3),
        |                    i -> array_to_string(w[i:i+4], ' ')) END AS gs
        |      FROM t2),
        |bench AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 97 = 0),
        |hits AS (SELECT DISTINCT doc_id
        |         FROM (SELECT doc_id, unnest(gs) AS gr FROM g) x
        |         JOIN bench USING (gr)),
        |clean AS (SELECT dd.* FROM dd
        |          WHERE dd.doc_id NOT IN (SELECT doc_id FROM hits))
        |SELECT doc_id, lang, quality FROM clean
        |WHERE (((((doc_id + 3) % 1000003) * 2654435761 + 3) % 1000000)
        |       + ((((doc_id + 3) % 999983) * 2246822518) % 1000000))
        |      % 1000000 < 800000""".stripMargin,

    // the same chain's per-stage row counts
    "q_curation_audit" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS n,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS nd,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS na,
        |    greatest(length(text), 1) AS lt
        |  FROM documents),
        |q AS (SELECT doc_id, text FROM base
        |      WHERE round(least(n * 1.0 / 64.0, 1.0) * 0.3 + (na * 1.0 / lt) * 0.35 +
        |                  (nd * 1.0 / n) * 0.35, 6) >= 0.5),
        |dd AS (SELECT doc_id, text FROM (
        |        SELECT doc_id, text, row_number() OVER (PARTITION BY text
        |                                     ORDER BY doc_id) AS rn
        |        FROM q) WHERE rn = 1),
        |t2 AS (SELECT doc_id,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |       FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(w) < 5 THEN CAST([] AS VARCHAR[])
        |             ELSE list_transform(range(1, len(w) - 3),
        |                    i -> array_to_string(w[i:i+4], ' ')) END AS gs
        |      FROM t2),
        |bench AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 97 = 0),
        |hits AS (SELECT DISTINCT doc_id
        |         FROM (SELECT doc_id, unnest(gs) AS gr FROM g) x
        |         JOIN bench USING (gr)),
        |clean AS (SELECT dd.doc_id FROM dd
        |          WHERE dd.doc_id NOT IN (SELECT doc_id FROM hits))
        |SELECT 'input' AS stage, count(*) AS n_rows FROM documents
        |UNION ALL SELECT 'quality', count(*) FROM q
        |UNION ALL SELECT 'dedup', count(*) FROM dd
        |UNION ALL SELECT 'decontam', count(*) FROM clean
        |UNION ALL SELECT 'train', count(*) FROM clean
        |WHERE (((((doc_id + 3) % 1000003) * 2654435761 + 3) % 1000000)
        |       + ((((doc_id + 3) % 999983) * 2246822518) % 1000000))
        |      % 1000000 < 800000""".stripMargin,

    // per-source duplication audit
    "q_dedup_stats" ->
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT text) AS n_unique,
        |       round(1.0 - count(DISTINCT text) * 1.0 / count(*), 6) AS dup_rate
        |FROM documents GROUP BY 1""".stripMargin,

    // the bloom prefilter must not change the semi-join result
    "q_bloom_semi" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,

    // the same 16-bit Morton interleave in SQL bit algebra
    "q_zorder" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((l_partkey >> $i) & 1) << ${2 * i})",
        s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})"))
      s"SELECT l_orderkey, l_linenumber, ${terms.mkString(" | ")} AS z FROM lineitem"
    },

    // the power-iteration trajectory unrolled: rounded per-dim means,
    // w0 = 1/sqrt(64) = 0.125 exactly, two rounds of (coef = (x-mu)·w,
    // s = sum coef·(x-mu), w = round(s/|s|, 6))
    "q_pca" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |dims AS (SELECT range AS d FROM range(0, 64)),
        |mu AS (SELECT dims.d, round(avg(CAST(e.embedding[dims.d+1] AS DOUBLE)), 6) AS m
        |       FROM e CROSS JOIN dims GROUP BY 1),
        |c1 AS (SELECT e.vec_id,
        |         sum((CAST(e.embedding[mu.d+1] AS DOUBLE) - mu.m) * 0.125) AS c
        |       FROM e CROSS JOIN mu GROUP BY 1),
        |s1 AS (SELECT mu.d,
        |         sum(c1.c * (CAST(e.embedding[mu.d+1] AS DOUBLE) - mu.m)) AS s
        |       FROM e JOIN c1 USING (vec_id) CROSS JOIN mu GROUP BY 1),
        |w1 AS (SELECT d, round(s / (SELECT sqrt(sum(s*s)) FROM s1), 6) AS w
        |       FROM s1),
        |wm1 AS (SELECT w1.d, w1.w, mu.m FROM w1 JOIN mu USING (d)),
        |c2 AS (SELECT e.vec_id,
        |         sum((CAST(e.embedding[wm1.d+1] AS DOUBLE) - wm1.m) * wm1.w) AS c
        |       FROM e CROSS JOIN wm1 GROUP BY 1),
        |s2 AS (SELECT wm1.d,
        |         sum(c2.c * (CAST(e.embedding[wm1.d+1] AS DOUBLE) - wm1.m)) AS s
        |       FROM e JOIN c2 USING (vec_id) CROSS JOIN wm1 GROUP BY 1),
        |w2 AS (SELECT d, round(s / (SELECT sqrt(sum(s*s)) FROM s2), 6) AS w
        |       FROM s2)
        |SELECT d AS dim, w FROM w2""".stripMargin,

    // the q_pca trajectory continued: coef = (x-mu)·w2 per vector,
    // resid_norm = |(x-mu) - coef·w2|
    "q_abtt" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |dims AS (SELECT range AS d FROM range(0, 64)),
        |mu AS (SELECT dims.d, round(avg(CAST(e.embedding[dims.d+1] AS DOUBLE)), 6) AS m
        |       FROM e CROSS JOIN dims GROUP BY 1),
        |c1 AS (SELECT e.vec_id,
        |         sum((CAST(e.embedding[mu.d+1] AS DOUBLE) - mu.m) * 0.125) AS c
        |       FROM e CROSS JOIN mu GROUP BY 1),
        |s1 AS (SELECT mu.d,
        |         sum(c1.c * (CAST(e.embedding[mu.d+1] AS DOUBLE) - mu.m)) AS s
        |       FROM e JOIN c1 USING (vec_id) CROSS JOIN mu GROUP BY 1),
        |w1 AS (SELECT d, round(s / (SELECT sqrt(sum(s*s)) FROM s1), 6) AS w
        |       FROM s1),
        |wm1 AS (SELECT w1.d, w1.w, mu.m FROM w1 JOIN mu USING (d)),
        |c2 AS (SELECT e.vec_id,
        |         sum((CAST(e.embedding[wm1.d+1] AS DOUBLE) - wm1.m) * wm1.w) AS c
        |       FROM e CROSS JOIN wm1 GROUP BY 1),
        |s2 AS (SELECT wm1.d,
        |         sum(c2.c * (CAST(e.embedding[wm1.d+1] AS DOUBLE) - wm1.m)) AS s
        |       FROM e JOIN c2 USING (vec_id) CROSS JOIN wm1 GROUP BY 1),
        |w2 AS (SELECT d, round(s / (SELECT sqrt(sum(s*s)) FROM s2), 6) AS w
        |       FROM s2),
        |wm2 AS (SELECT w2.d, w2.w, mu.m FROM w2 JOIN mu USING (d)),
        |cf AS (SELECT e.vec_id,
        |         sum((CAST(e.embedding[wm2.d+1] AS DOUBLE) - wm2.m) * wm2.w) AS c
        |       FROM e CROSS JOIN wm2 GROUP BY 1),
        |rs AS (SELECT e.vec_id,
        |         sum(pow((CAST(e.embedding[wm2.d+1] AS DOUBLE) - wm2.m)
        |                 - cf.c * wm2.w, 2)) AS r2
        |       FROM e JOIN cf USING (vec_id) CROSS JOIN wm2 GROUP BY 1)
        |SELECT rs.vec_id, round(cf.c, 6) AS coef,
        |       round(sqrt(rs.r2), 6) AS resid_norm
        |FROM rs JOIN cf USING (vec_id)""".stripMargin,

    // the inverted-index all-pairs join replayed: postings, the df <= 100
    // vocabulary cut, idf = ln(N/df) weights, term-keyed dot products,
    // norms, rounded-6dp threshold
    "q_sparse_cosine" ->
      """WITH post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM post GROUP BY 1
        |        HAVING count(*) <= 100),
        |n AS (SELECT count(*) * 1.0 AS n FROM documents),
        |w AS (SELECT p.doc_id, p.term, p.tf * ln(n.n / d.df) AS w
        |      FROM post p JOIN dft d USING (term) CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY 1),
        |dots AS (SELECT l.doc_id AS a, r.doc_id AS b, sum(l.w * r.w) AS dp
        |         FROM w l JOIN w r ON l.term = r.term AND l.doc_id < r.doc_id
        |         GROUP BY 1, 2)
        |SELECT a, b, round(dp / (na.nrm * nb.nrm), 6) AS cos
        |FROM dots
        |JOIN nrm na ON na.doc_id = a
        |JOIN nrm nb ON nb.doc_id = b
        |WHERE round(dp / (na.nrm * nb.nrm), 6) >= 0.6""".stripMargin,

    // Christen's blocking metrics recomputed whole: candidates re-banded
    // from the dumped signatures, truth = exact rounded-cosine >= 0.3
    // pairs, completeness = hit/truth, reduction = 1 - cand/C(n,2)
    "q_blocking_quality" ->
      """WITH sigs AS (
        |  SELECT vec_id, sig
        |  FROM read_parquet('__GRAFT_OUT__/q_lsh_sigs/*.parquet')),
        |banded AS (
        |  SELECT vec_id, bi, (sig >> CAST(bi * 4 AS INTEGER)) & 15 AS k
        |  FROM sigs, range(4) t(bi)),
        |cand AS (
        |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
        |  FROM banded l JOIN banded r
        |    ON l.bi = r.bi AND l.k = r.k AND l.vec_id < r.vec_id),
        |flat AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |         CAST(unnest(a.embedding) AS DOUBLE) AS xa,
        |         CAST(unnest(b.embedding) AS DOUBLE) AS xb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |dots AS (SELECT a, b, sum(xa*xb) AS dp, sum(xa*xa) AS na,
        |                sum(xb*xb) AS nb
        |         FROM flat GROUP BY 1, 2),
        |truth AS (SELECT a, b FROM dots
        |          WHERE round(dp/(sqrt(na)*sqrt(nb)), 6) >= 0.3),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |agg AS (SELECT
        |  (SELECT count(*) FROM cand) AS n_candidates,
        |  (SELECT count(*) FROM truth) AS n_truth,
        |  (SELECT count(*) FROM truth JOIN cand USING (a, b)) AS n_hit,
        |  (SELECT n * (n - 1) // 2 FROM nn) AS total)
        |SELECT n_candidates, n_truth, n_hit,
        |       round(n_hit * 1.0 / n_truth, 6) AS pair_completeness,
        |       round(1.0 - n_candidates * 1.0 / total, 6) AS reduction_ratio
        |FROM agg""".stripMargin,

    // the sharded two-pass (len, id) rank replayed as ONE window, then
    // batches of 32 with padding = n·max − sum(len)
    "q_length_batches" ->
      """WITH l AS (SELECT doc_id,
        |             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS len
        |           FROM documents),
        |p AS (SELECT doc_id, len,
        |        row_number() OVER (ORDER BY len, doc_id) - 1 AS pos
        |      FROM l)
        |SELECT pos // 32 AS batch_idx, count(*) AS n_docs,
        |       max(len) AS max_tokens,
        |       CAST(max(len) * count(*) - sum(len) AS BIGINT) AS padding
        |FROM p GROUP BY 1""".stripMargin,

    // the water-filling walk replayed: sources sorted by (a/w, s), the cap
    // test is the exact cross-multiplied a·(W−pw) <= (T−pa)·w with
    // EXCLUSIVE prefix sums, capped = the cumulative-AND prefix (single
    // crossing); uncapped takes divide the frozen remainder
    "q_mix_rates" ->
      """WITH a AS (
        |  SELECT source, CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS a,
        |         (CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 4) + 1 AS w
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) * 9 // 10 AS BIGINT) AS t,
        |               CAST(sum(w) AS BIGINT) AS wtot FROM a),
        |walk AS (
        |  SELECT a.*, tot.t, tot.wtot,
        |    coalesce(sum(a.a) OVER win, 0) AS pa,
        |    coalesce(sum(a.w) OVER win, 0) AS pw
        |  FROM a CROSS JOIN tot
        |  WINDOW win AS (ORDER BY a.a * 1.0 / a.w, a.source
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |flags AS (
        |  SELECT *,
        |    bool_and(a * (wtot - pw) <= (t - pa) * w) OVER
        |      (ORDER BY a * 1.0 / w, source
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
        |  FROM walk),
        |lvl AS (SELECT coalesce(sum(CASE WHEN capped THEN a END), 0) AS ca,
        |               coalesce(sum(CASE WHEN capped THEN w END), 0) AS cw
        |        FROM flags)
        |SELECT f.source, f.a AS avail_tokens,
        |  CASE WHEN f.capped THEN CAST(f.a AS DOUBLE)
        |       ELSE round((f.t - lvl.ca) * f.w * 1.0 / (f.wtot - lvl.cw), 6)
        |  END AS take_tokens,
        |  CASE WHEN f.capped THEN 1.0
        |       ELSE round(round((f.t - lvl.ca) * f.w * 1.0 / (f.wtot - lvl.cw), 6)
        |                  / f.a, 6)
        |  END AS rate
        |FROM flags f CROSS JOIN lvl""".stripMargin,

    // the top-64 vocabulary + per-language covered/OOV token accounting
    "q_vocab_coverage" ->
      """WITH top AS (
        |  SELECT token FROM (
        |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |    FROM documents)
        |  GROUP BY token ORDER BY count(*) DESC, token LIMIT 64),
        |toks AS (SELECT lang,
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |         FROM documents)
        |SELECT lang, count(*) AS total_tokens,
        |  CAST(sum(CASE WHEN tok IN (SELECT token FROM top) THEN 1 ELSE 0 END)
        |       AS BIGINT) AS covered_tokens,
        |  round(1.0 - sum(CASE WHEN tok IN (SELECT token FROM top) THEN 1
        |                       ELSE 0 END) * 1.0 / count(*), 6) AS oov_rate
        |FROM toks GROUP BY 1""".stripMargin,

    // both snapshot versions recomputed from the base table, then the
    // full-outer CDC diff: only-in-v2 = inserted, only-in-v1 = deleted,
    // any shared column null-safe-different = updated
    "q_snapshot_diff" ->
      """WITH v1 AS (SELECT o_orderkey, o_custkey, o_totalprice
        |            FROM orders WHERE o_orderkey % 5 <> 0),
        |v2 AS (SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
        |              ELSE o_totalprice END AS o_totalprice
        |       FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
        |       CASE WHEN v1.o_orderkey IS NULL THEN 'inserted'
        |            WHEN v2.o_orderkey IS NULL THEN 'deleted'
        |            ELSE 'updated' END AS change_type
        |FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        |WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
        |   OR v1.o_custkey IS DISTINCT FROM v2.o_custkey
        |   OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice""".stripMargin,

    // sub-k quasi-identifier groups = re-identification risks
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 8""".stripMargin,

    // SemDeDup replayed end-to-end: the q_kmeans 1-round replay (8
    // id-order seeds, rounded argmax, rounded means) -> within-cell
    // rounded-cosine >= 0.3 pairs -> recursive-CTE components -> keep the
    // minimum id
    "q_semantic_dedup" ->
      """WITH RECURSIVE s AS (SELECT vec_id AS cell, embedding AS cv
        |           FROM embeddings ORDER BY vec_id LIMIT 8),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |f1 AS (SELECT e.vec_id, s.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |         CAST(unnest(s.cv) AS DOUBLE) AS c
        |       FROM e CROSS JOIN s),
        |d1 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f1 GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |       FROM d1),
        |m1 AS (SELECT a1.cell, d.dim,
        |         round(avg(CAST(e.embedding[d.dim+1] AS DOUBLE)), 6) AS m
        |       FROM a1 JOIN e USING (vec_id)
        |       CROSS JOIN (SELECT range AS dim FROM range(0, 64)) d
        |       WHERE a1.rk = 1 GROUP BY 1, 2),
        |c1 AS (SELECT cell, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cell),
        |f2 AS (SELECT e.vec_id, c1.cell,
        |         CAST(unnest(e.embedding) AS DOUBLE) AS x, unnest(c1.cv) AS c
        |       FROM e CROSS JOIN c1),
        |d2 AS (SELECT vec_id, cell, sum(x*c) AS dp, sum(x*x) AS nx, sum(c*c) AS nc
        |       FROM f2 GROUP BY 1, 2),
        |av AS (SELECT vec_id AS id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dp/(sqrt(nx)*sqrt(nc)), 6) DESC, cell) AS rk
        |    FROM d2) WHERE rk = 1),
        |fp AS (SELECT l.id AS a, r.id AS b,
        |         CAST(unnest(ea.embedding) AS DOUBLE) AS xa,
        |         CAST(unnest(eb.embedding) AS DOUBLE) AS xb
        |       FROM av l JOIN av r ON l.cell = r.cell AND l.id < r.id
        |       JOIN embeddings ea ON ea.vec_id = l.id
        |       JOIN embeddings eb ON eb.vec_id = r.id),
        |dps AS (SELECT a, b, sum(xa*xb) AS d, sum(xa*xa) AS na, sum(xb*xb) AS nb
        |        FROM fp GROUP BY 1, 2),
        |pairs AS (SELECT a, b FROM dps
        |          WHERE round(d/(sqrt(na)*sqrt(nb)), 6) >= 0.3),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(n, m) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
        |comp AS (SELECT n AS id, min(m) AS root FROM reach GROUP BY n)
        |SELECT av.id AS vec_id, av.cell,
        |       coalesce(comp.root, av.id) AS keep_id,
        |       coalesce(comp.root, av.id) = av.id AS kept
        |FROM av LEFT JOIN comp USING (id)""".stripMargin,

    // the exact top-5 ranking (the q_ann_topk replay) graded against
    // same-label ground truth: recall@5, MRR@5, binary-gain nDCG@5 — every
    // formula recomputed here (DCG = sum 1/log2(rank+1) over relevant
    // hits; ideal DCG from min(k, n_rel) perfect placements)
    "q_rank_metrics" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS item_id, embedding AS ce FROM embeddings),
        |flat AS (
        |  SELECT query_id, item_id,
        |         CAST(unnest(qe) AS DOUBLE) AS qx, CAST(unnest(ce) AS DOUBLE) AS cx
        |  FROM q JOIN c ON item_id <> query_id),
        |dots AS (
        |  SELECT query_id, item_id, sum(qx * cx) AS dp,
        |         sum(qx * qx) AS nq, sum(cx * cx) AS nc
        |  FROM flat GROUP BY 1, 2),
        |ranked AS (SELECT query_id, item_id, rank FROM (
        |  SELECT query_id, item_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY round(dp / (sqrt(nq) * sqrt(nc)), 6) DESC, item_id) AS rank
        |  FROM dots) WHERE rank <= 5),
        |rel AS (SELECT DISTINCT ql.vec_id AS query_id, il.vec_id AS item_id
        |        FROM embeddings ql JOIN embeddings il
        |          ON ql.label = il.label AND il.vec_id <> ql.vec_id
        |        WHERE ql.vec_id < 8),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |hits AS (SELECT r.query_id, count(*) AS hits, min(r.rank) AS fr,
        |                sum(1.0 / log2(r.rank + 1)) AS dcg
        |         FROM ranked r JOIN rel USING (query_id, item_id)
        |         GROUP BY 1),
        |idcg AS (SELECT n.query_id,
        |                sum(1.0 / log2(i.range + 1)) AS idcg
        |         FROM nrel n JOIN range(1, 6) i
        |           ON i.range <= least(5, n.n_rel)
        |         GROUP BY 1)
        |SELECT n.query_id, n.n_rel, coalesce(h.hits, 0) AS hits,
        |       round(coalesce(h.hits, 0) * 1.0 / n.n_rel, 6) AS recall,
        |       round(coalesce(1.0 / h.fr, 0.0), 6) AS mrr,
        |       round(coalesce(h.dcg, 0.0) / g.idcg, 6) AS ndcg
        |FROM nrel n LEFT JOIN hits h USING (query_id)
        |JOIN idcg g ON g.query_id = n.query_id""".stripMargin,

    // the z-layout + corner-code superset filter + residual box must
    // reproduce the PLAIN 2-D box query exactly — the materialized-layout
    // parity bar (q_ann_ivfpq_mat's) applied to Z-order
    "q_zorder_mat" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem
        |WHERE l_partkey BETWEEN 256 AND 511
        |  AND l_suppkey BETWEEN 32 AND 47""".stripMargin,

    // the deterministic byte-aware partition assignment replayed as ONE
    // running-sum window: the synthetic media table's payload length is a
    // closed form of the id (65 + id % 192 single-byte chars), so the
    // sharded two-pass cumulative-byte bucketing must equal
    // floor(cum_bytes_before / 4096) under the global media_id order
    "q_media_partition" ->
      """WITH m AS (SELECT range AS media_id,
        |                  CAST(65 + range % 192 AS BIGINT) AS n_bytes
        |           FROM range(0, 300))
        |SELECT media_id, n_bytes,
        |       CAST(floor((sum(n_bytes) OVER (ORDER BY media_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              - n_bytes) / 4096) AS BIGINT) AS bucket
        |FROM m""".stripMargin,

    // the salted join must reproduce the plain inner join exactly
    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
        |       o.o_orderstatus, o.o_totalprice
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey""".stripMargin,

    // six evidence rows: two uniqueness, not-null, accepted set, two FKs
    "q_constraints" ->
      """WITH u1 AS (SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY 1),
        |u2 AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1)
        |SELECT 'unique(c_custkey)' AS chk, CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS n_violations,
        |       coalesce(sum(CASE WHEN c > 1 THEN c END), 0) = 0 AS pass
        |FROM u1
        |UNION ALL
        |SELECT 'unique(o_custkey)', CAST(sum(c) AS BIGINT),
        |       CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
        |       coalesce(sum(CASE WHEN c > 1 THEN c END), 0) = 0
        |FROM u2
        |UNION ALL
        |SELECT 'not_null(event_type)', count(*),
        |       count(*) - count(event_type),
        |       count(*) - count(event_type) = 0
        |FROM events
        |UNION ALL
        |SELECT 'accepted(o_orderstatus)', count(*),
        |       CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P')
        |                          THEN 0 ELSE 1 END), 0) AS BIGINT),
        |       coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P')
        |                    THEN 0 ELSE 1 END), 0) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'fk(o_custkey->c_custkey)',
        |       (SELECT count(*) FROM orders),
        |       (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |       (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
        |UNION ALL
        |SELECT 'fk(l_orderkey->o_orderkey)',
        |       (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0""".stripMargin,

    // per-column (n, nulls, exact distinct) snapshot of events
    "q_profile" ->
      """SELECT 'event_id' AS col_name, count(*) AS n_rows,
        |       count(*) - count(event_id) AS n_null,
        |       count(DISTINCT event_id) AS n_distinct FROM events
        |UNION ALL
        |SELECT 'user_id', count(*), count(*) - count(user_id),
        |       count(DISTINCT user_id) FROM events
        |UNION ALL
        |SELECT 'event_type', count(*), count(*) - count(event_type),
        |       count(DISTINCT event_type) FROM events
        |UNION ALL
        |SELECT 'value', count(*), count(*) - count(value),
        |       count(DISTINCT value) FROM events
        |UNION ALL
        |SELECT 'props', count(*), count(*) - count(props),
        |       count(DISTINCT props) FROM events""".stripMargin,

    // graded 5-gram overlap vs the every-97th-doc benchmark (string grams
    // here, hashed grams in Spark — same membership)
    "q_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 5 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(range(1, len(w) - 3),
        |                i -> array_to_string(w[i:i+4], ' ')) END AS gs
        |  FROM t),
        |bench AS (
        |  SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 97 = 0),
        |dg AS (SELECT DISTINCT doc_id, unnest(gs) AS gr FROM g),
        |j AS (SELECT dg.doc_id,
        |        CASE WHEN bench.gr IS NULL THEN 0 ELSE 1 END AS hit
        |      FROM dg LEFT JOIN bench USING (gr))
        |SELECT doc_id, count(*) AS n_grams,
        |       CAST(sum(hit) AS BIGINT) AS n_hit,
        |       round(sum(hit) * 1.0 / count(*), 6) AS overlap
        |FROM j GROUP BY 1""".stripMargin,

    // RRF over the two value-exact dumps: rank each run, sum 1/(60+rank)
    "q_rrf" ->
      """WITH a AS (SELECT doc_id,
        |             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |           FROM read_parquet('__GRAFT_OUT__/q_bm25/*.parquet')),
        |b AS (SELECT doc_id,
        |        row_number() OVER (ORDER BY quality DESC, doc_id) AS rank
        |      FROM (SELECT doc_id, quality
        |            FROM read_parquet('__GRAFT_OUT__/q_quality/*.parquet')
        |            ORDER BY quality DESC, doc_id LIMIT 20)),
        |u AS (SELECT doc_id, rank FROM a
        |      UNION ALL SELECT doc_id, rank FROM b)
        |SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf,
        |       count(*) AS n_runs
        |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // exact per-group distinct + the HLL-within-bound boolean (the sketch
    // itself is engine-internal; the oracle asserts the CONTRACT held)
    "q_group_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,

    // hot-key profile: count, corpus share, hotness ratio (count ÷ mean)
    "q_key_skew" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        |s AS (SELECT sum(n) AS tot, count(*) * 1.0 AS nk FROM c)
        |SELECT key, n, round(n * 1.0 / s.tot, 6) AS share,
        |       round(n * s.nk / s.tot, 6) AS ratio
        |FROM c CROSS JOIN s
        |ORDER BY n DESC, key LIMIT 20""".stripMargin,

    // add-one bigram LM retrained in SQL: c(w1,w2), c(w1) = bigram starts,
    // V = corpus distinct tokens; per-doc mean -ln p, 6-dp
    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE len(trim(text)) > 0),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM toks WHERE len(t) >= 2),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos),
        |bc AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
        |uc AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |v AS (SELECT count(DISTINCT e) AS nv
        |      FROM (SELECT unnest(t) AS e FROM toks)),
        |sc AS (SELECT bi.doc_id,
        |         -ln((bc.c2 + 1) * 1.0 / (uc.c1 + v.nv)) AS x
        |       FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1)
        |       CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(x), 6) AS nll
        |FROM sc GROUP BY 1""".stripMargin,

    // per-component float means over the 64-dim vectors, 6-dp-rounded
    "q_centroids" ->
      """WITH d AS (SELECT range AS dim FROM range(0, 64))
        |SELECT label, CAST(dim AS INTEGER) AS dim,
        |       round(avg(CAST(embedding[dim + 1] AS DOUBLE)), 6) AS mean,
        |       count(*) AS n
        |FROM embeddings, d GROUP BY label, dim""".stripMargin,

    // lag + running sum of session starts under the same total order
    "q_sessions" ->
      """WITH x AS (SELECT event_id, user_id, ts, event_id AS eid,
        |             lag(ts) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS prev
        |           FROM events),
        |y AS (SELECT event_id, user_id, ts, eid,
        |        CASE WHEN prev IS NULL
        |               OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM x)
        |SELECT event_id, user_id,
        |       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, eid
        |                             ROWS UNBOUNDED PRECEDING) - 1 AS INT)
        |         AS session_idx
        |FROM y""".stripMargin,

    // the portable polynomial token hash (q_fingerprint's inner reduce)
    // recomputed per token, folded mod 64 — bucket VALUES value-checked
    "q_hash_features" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |             list_transform(string_split(t, ''),
        |               c -> CAST(unicode(c) AS BIGINT))),
        |           (a, c) -> (a * 131 + c) % 1000000007))) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % 64 AS INT) AS bucket, count(*) AS n
        |FROM toks GROUP BY doc_id, bucket""".stripMargin,

    // GATE PRECONDITION (here and for q_adamic_adar/q_clustering): the
    // Spark path applies a 10k hub/group-size safety gate by default; this
    // oracle does NOT replicate it, so the value compare assumes no
    // neighborhood/group exceeds 10k members at the gate's sf (verified
    // far below that; a larger sf breaching it would diverge HERE first,
    // not in the operator)
    // document-frequency PMI with the identical arithmetic shape
    "q_pmi" ->
      """WITH m AS (SELECT DISTINCT g, e FROM (
        |             SELECT doc_id AS g,
        |               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS e
        |             FROM documents)),
        |p AS (SELECT l.e AS a, r.e AS b, count(DISTINCT l.g) AS n_ab
        |      FROM m l JOIN m r ON l.g = r.g AND l.e < r.e
        |      GROUP BY l.e, r.e),
        |f AS (SELECT e, count(*) AS n FROM m GROUP BY e),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
        |SELECT p.a, p.b, p.n_ab,
        |       round(ln((nd.nd * p.n_ab) / (fa.n * fb.n)), 6) AS pmi
        |FROM p JOIN f fa ON fa.e = p.a JOIN f fb ON fb.e = p.b
        |CROSS JOIN nd""".stripMargin,

    // tf·ln(N/df), ranked per doc on the ROUNDED score + term tiebreak
    "q_tfidf" ->
      """WITH post AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |sc AS (SELECT p.doc_id, p.term,
        |         round(p.tf * ln(n.n / f.df), 6) AS score
        |       FROM post p JOIN dft f USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, term) AS rank
        |      FROM sc)
        |SELECT doc_id, rank, term, score FROM r WHERE rank <= 3""".stripMargin,

    // exact interpolated percentiles (the q_corpus_stats contract) as the
    // clip band; clipped values rounded to 6 dp on both sides
    "q_winsorize" ->
      """WITH b AS (SELECT event_type,
        |             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS plo,
        |             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS phi
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |       round(greatest(b.plo, least(b.phi, e.value)), 6) AS value_w
        |FROM events e JOIN b USING (event_type)""".stripMargin,

    // Adamic–Adar over the customer ↔ part co-purchase membership:
    // shared-neighbor 1/ln(deg) sums, 6-dp-rounded, total-ordered cut
    "q_adamic_adar" ->
      """WITH m AS (SELECT DISTINCT l_partkey AS p, o_custkey AS c
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (SELECT p, count(*) AS d FROM m GROUP BY p)
        |SELECT l.c AS a, r.c AS b, count(*) AS common,
        |       round(sum(1.0 / ln(deg.d)), 6) AS score
        |FROM m l JOIN m r ON l.p = r.p AND l.c < r.c
        |JOIN deg ON deg.p = l.p
        |GROUP BY l.c, r.c
        |ORDER BY score DESC, a, b LIMIT 100""".stripMargin,

    "q_triangles" ->
      """WITH ge AS (SELECT DISTINCT user_id AS g, event_type AS e FROM events),
        |ed AS (SELECT DISTINCT l.e AS x, r.e AS y
        |       FROM ge l JOIN ge r ON l.g = r.g AND l.e < r.e),
        |tri AS (SELECT e1.x AS n1, e1.y AS n2, e2.y AS n3
        |        FROM ed e1 JOIN ed e2 ON e1.x = e2.x AND e1.y < e2.y
        |        JOIN ed e3 ON e3.x = e1.y AND e3.y = e2.y)
        |SELECT node, count(*) AS n_triangles FROM (
        |  SELECT n1 AS node FROM tri
        |  UNION ALL SELECT n2 FROM tri
        |  UNION ALL SELECT n3 FROM tri)
        |GROUP BY node""".stripMargin,

    "q_degrees" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS src, 'e:' || event_type AS dst
        |           FROM events),
        |o AS (SELECT src AS node, count(*) AS out_deg FROM ed GROUP BY 1),
        |i AS (SELECT dst AS node, count(*) AS in_deg FROM ed GROUP BY 1)
        |SELECT COALESCE(o.node, i.node) AS node,
        |       COALESCE(o.out_deg, 0) AS out_deg,
        |       COALESCE(i.in_deg, 0) AS in_deg,
        |       COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS degree
        |FROM o FULL OUTER JOIN i ON o.node = i.node""".stripMargin,

    // SCC ground truth by brute force: recursive-CTE transitive closure,
    // then scc_id(u) = min over {u} ∪ {v : u →* v ∧ v →* u} — tractable
    // because the handoff digraph has ≤ |users| nodes at gate scale
    "q_scc" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |                             ORDER BY ts, event_id) AS nxt,
        |         lead(ts) OVER (PARTITION BY event_type
        |                        ORDER BY ts, event_id) AS nts
        |  FROM events),
        |edges AS (SELECT DISTINCT user_id AS src, nxt AS dst FROM seq
        |          WHERE nxt IS NOT NULL AND nxt <> user_id
        |            AND epoch_us(nts) - epoch_us(ts) <= 30000000),
        |nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
        |reach(s, d) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src),
        |mutual AS (SELECT r1.s AS u, r1.d AS v FROM reach r1
        |           JOIN reach r2 ON r1.d = r2.s AND r2.d = r1.s)
        |SELECT n.n AS node, least(n.n, coalesce(min(m.v), n.n)) AS scc_id
        |FROM nodes n LEFT JOIN mutual m ON m.u = n.n
        |GROUP BY n.n""".stripMargin,

    // the full greedy MMR trajectory unrolled: round i picks argmax of
    // 0.7·rel − 0.3·max(6dp sims to s1..s_{i−1}), ties by id — rel and
    // sims are 6dp-rounded cosines so the score is an exact IEEE function
    // of engine-identical inputs
    "q_mmr" -> {
      // the EXACT doubles the Spark side computes: lit(lambda) and
      // lit(1.0 - lambda). A hand-written "0.3" is one ulp off 1.0-0.7
      // and could flip a greedy tie — interpolate the Scala values
      val lam = 0.7
      val lamS = lam.toString
      val redS = (1.0 - lam).toString
      def simCte(j: Int) =
        s"""m$j AS (
           |  SELECT id, round(sum(cx*sx) / (sqrt(sum(cx*cx)) * sqrt(sum(sx*sx))), 6)
           |           AS ms$j
           |  FROM (SELECT c.id, CAST(unnest(c.e) AS DOUBLE) AS cx,
           |               CAST(unnest(s.e) AS DOUBLE) AS sx
           |        FROM cand c, s$j s) x
           |  GROUP BY id)""".stripMargin
      def pickCte(i: Int) = {
        val joins = (1 until i).map(j => s"JOIN m$j USING (id)").mkString(" ")
        val ms = if (i == 1) "0"
                 else if (i == 2) "m1.ms1"
                 else s"greatest(${(1 until i).map(j => s"m$j.ms$j").mkString(", ")})"
        val excl = if (i == 1) ""
                   else "WHERE c.id NOT IN (" +
                     (1 until i).map(j => s"SELECT id FROM s$j").mkString(" UNION ALL ") + ")"
        s"""s$i AS (
           |  SELECT c.id, c.e, CAST($lamS AS DOUBLE)*r.rel
           |                    - CAST($redS AS DOUBLE)*($ms) AS mraw
           |  FROM cand c JOIN rel r USING (id) $joins
           |  $excl
           |  ORDER BY mraw DESC, c.id LIMIT 1)""".stripMargin
      }
      val ctes = (1 to 5).map(i =>
        pickCte(i) + (if (i < 5) ",\n" + simCte(i) else "")).mkString(",\n")
      val out = (1 to 5).map(i =>
        s"SELECT CAST($i AS INT) AS rank, id AS vec_id, round(mraw, 6) AS mmr FROM s$i")
        .mkString("\nUNION ALL ")
      s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
         |cand AS (SELECT vec_id AS id, embedding AS e FROM embeddings
         |         WHERE vec_id <> 0),
         |rel AS (
         |  SELECT id, round(sum(cx*qx) / (sqrt(sum(cx*cx)) * sqrt(sum(qx*qx))), 6)
         |           AS rel
         |  FROM (SELECT c.id, CAST(unnest(c.e) AS DOUBLE) AS cx,
         |               CAST(unnest(q.e) AS DOUBLE) AS qx
         |        FROM cand c, q) x
         |  GROUP BY id),
         |$ctes
         |$out""".stripMargin
    },

    // the BPE replace chain replayed verbatim: both engines' replace() is
    // leftmost-non-overlapping, so the segmentation matches byte-for-byte
    "q_bpe" -> {
      val chain = Queries.BpeMerges.foldLeft(
        "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '") {
        case (s, (a, b)) => s"replace($s, ' $a $b ', ' $a$b ')"
      }
      s"""WITH seg AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(
         |      regexp_split_to_array(lower(trim(text)), '\\s+'),
         |      w -> trim($chain)), chr(10)) AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_split_to_array(s, '[\n ]')) AS INT) AS n_tokens,
         |  sha256(s) AS seg_sha
         |FROM seg""".stripMargin
    },

    // identical unrolled-lag expression, same addition order, 0.5^j exact
    // IEEE literals cast to DOUBLE (DuckDB decimal literals would switch
    // the arithmetic to DECIMAL)
    "q_ewma" -> {
      val lags = (1 to 5).map(j => s"lag(value, $j) OVER w AS l$j").mkString(", ")
      val num = (0 to 5).map { j =>
        val x = if (j == 0) "value" else s"l$j"
        s"coalesce($x * CAST(${math.pow(0.5, j)} AS DOUBLE), CAST(0 AS DOUBLE))"
      }.mkString(" + ")
      val den = (0 to 5).map { j =>
        val x = if (j == 0) "value" else s"l$j"
        s"coalesce(CASE WHEN $x IS NOT NULL THEN CAST(${math.pow(0.5, j)} AS DOUBLE) END, CAST(0 AS DOUBLE))"
      }.mkString(" + ")
      s"""SELECT event_id,
         |  CASE WHEN ($den) > 0 THEN round(($num) / ($den), 6) END AS ewma
         |FROM (SELECT event_id, value, $lags
         |      FROM events
         |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin
    },

    // the non-quadratic skyline: per-d min cost, exclusive running min
    // down the d order, semi-join back — same shape both engines
    "q_pareto" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS d,
        |    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n
        |  FROM documents),
        |pv AS (SELECT d, min(n) AS vmin FROM base GROUP BY 1),
        |pv2 AS (SELECT d, vmin,
        |          min(vmin) OVER (ORDER BY d DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS better
        |        FROM pv),
        |fr AS (SELECT d, vmin FROM pv2 WHERE better IS NULL OR vmin < better)
        |SELECT b.doc_id, b.d, b.n
        |FROM base b JOIN fr ON b.d = fr.d AND b.n = fr.vmin""".stripMargin,

    // every walk hop replayed in SQL: rank = portable double-fold hash of
    // (start, step) and (node, step) summed, mod the out-degree, over the
    // id-ranked adjacency — the q_split/q_shuffle determinism contract
    "q_walks" -> {
      def b(x: String, s: Long) =
        s"(((($x + $s) % 1000003) * 2654435761 + $s) % 1000000" +
          s" + ((($x + $s) % 999983) * 2246822518) % 1000000) % 1000000"
      val seed = 7L
      val hops = (1 to 4).map { k =>
        s"""w$k AS (SELECT w.start, r.dst AS node
           |  FROM w${k - 1} w
           |  JOIN deg d ON w.node = d.src
           |  JOIN ranked r ON r.src = w.node
           |   AND r.rk = (${b("w.start", seed + k)} + ${b("w.node", seed + 1000 + k)})
           |              % 1000000 % d.deg)""".stripMargin
      }.mkString(",\n")
      val unions = (0 to 4).map(k =>
        s"SELECT start, CAST($k AS INT) AS step, node FROM w$k").mkString("\nUNION ALL ")
      s"""WITH seq AS (
         |  SELECT user_id, ts, event_id,
         |         lead(user_id) OVER (PARTITION BY event_type
         |                             ORDER BY ts, event_id) AS nxt,
         |         lead(ts) OVER (PARTITION BY event_type
         |                        ORDER BY ts, event_id) AS nts
         |  FROM events),
         |edges AS (SELECT DISTINCT user_id AS src, nxt AS dst FROM seq
         |          WHERE nxt IS NOT NULL AND nxt <> user_id
         |            AND epoch_us(nts) - epoch_us(ts) <= 30000000),
         |ranked AS (SELECT src, dst,
         |             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk
         |           FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |starts AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
         |w0 AS (SELECT n AS start, n AS node FROM starts),
         |$hops
         |$unions""".stripMargin
    },

    // every biased hop replayed: step 1 = the uniform q_walks hop
    // (carrying prev), steps 2..3 = neighbor weights by relation to prev
    // (return 1 / p-adjacent 4 / far 2), cumulative ranges over id-ordered
    // neighbors, pick = portable hash % total weight
    "q_walks_biased" -> {
      def b(x: String, s: Long) =
        s"(((($x + $s) % 1000003) * 2654435761 + $s) % 1000000" +
          s" + ((($x + $s) % 999983) * 2246822518) % 1000000) % 1000000"
      val seed = 11L
      val biasedHops = (2 to 3).map { k =>
        s"""c$k AS (
           |  SELECT w.start, w.node, r.dst AS v,
           |    CASE WHEN r.dst = w.prev THEN 1
           |         WHEN EXISTS (SELECT 1 FROM edges e2
           |                      WHERE e2.src = w.prev AND e2.dst = r.dst) THEN 4
           |         ELSE 2 END AS wt
           |  FROM p${k - 1} w JOIN edges r ON r.src = w.node),
           |s$k AS (
           |  SELECT start, node, v, wt,
           |    sum(wt) OVER (PARTITION BY start ORDER BY v
           |                  ROWS UNBOUNDED PRECEDING) AS cum,
           |    sum(wt) OVER (PARTITION BY start) AS tot
           |  FROM c$k),
           |p$k AS (
           |  SELECT start, node AS prev, v AS node FROM s$k
           |  WHERE (${b("start", seed + k)} + ${b("node", seed + 1000 + k)})
           |        % 1000000 % tot >= cum - wt
           |    AND (${b("start", seed + k)} + ${b("node", seed + 1000 + k)})
           |        % 1000000 % tot < cum)""".stripMargin
      }.mkString(",\n")
      val unions = (0 to 3).map(k =>
        s"SELECT start, CAST($k AS INT) AS step, node FROM p$k").mkString("\nUNION ALL ")
      s"""WITH seq AS (
         |  SELECT user_id, ts, event_id,
         |         lead(user_id) OVER (PARTITION BY event_type
         |                             ORDER BY ts, event_id) AS nxt,
         |         lead(ts) OVER (PARTITION BY event_type
         |                        ORDER BY ts, event_id) AS nts
         |  FROM events),
         |edges AS (SELECT DISTINCT user_id AS src, nxt AS dst FROM seq
         |          WHERE nxt IS NOT NULL AND nxt <> user_id
         |            AND epoch_us(nts) - epoch_us(ts) <= 30000000),
         |ranked AS (SELECT src, dst,
         |             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk
         |           FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |starts AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
         |p0 AS (SELECT n AS start, CAST(NULL AS BIGINT) AS prev, n AS node
         |       FROM starts),
         |p1 AS (SELECT w.start, w.node AS prev, r.dst AS node
         |  FROM p0 w
         |  JOIN deg d ON w.node = d.src
         |  JOIN ranked r ON r.src = w.node
         |   AND r.rk = (${b("w.start", seed + 1)} + ${b("w.node", seed + 1001)})
         |              % 1000000 % d.deg),
         |$biasedHops
         |$unions""".stripMargin
    },

    // SCC → condensed DAG → longest path per component, all in SQL: the
    // recursive `paths` CTE is finite because the condensation is acyclic
    "q_condensation" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |                             ORDER BY ts, event_id) AS nxt,
        |         lead(ts) OVER (PARTITION BY event_type
        |                        ORDER BY ts, event_id) AS nts
        |  FROM events),
        |edges AS (SELECT DISTINCT user_id AS src, nxt AS dst FROM seq
        |          WHERE nxt IS NOT NULL AND nxt <> user_id
        |            AND epoch_us(nts) - epoch_us(ts) <= 30000000),
        |nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
        |reach(s, d) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src),
        |mutual AS (SELECT r1.s AS u, r1.d AS v FROM reach r1
        |           JOIN reach r2 ON r1.d = r2.s AND r2.d = r1.s),
        |comp AS (SELECT n.n AS node, least(n.n, coalesce(min(m.v), n.n)) AS scc_id
        |         FROM nodes n LEFT JOIN mutual m ON m.u = n.n GROUP BY n.n),
        |ce AS (SELECT DISTINCT c1.scc_id AS cs, c2.scc_id AS cd
        |       FROM edges e JOIN comp c1 ON e.src = c1.node
        |                    JOIN comp c2 ON e.dst = c2.node
        |       WHERE c1.scc_id <> c2.scc_id),
        |paths(d, lvl) AS (
        |  SELECT cd, 1 FROM ce
        |  UNION
        |  SELECT ce.cd, p.lvl + 1 FROM paths p JOIN ce ON ce.cs = p.d),
        |lv AS (SELECT c.scc_id, coalesce(max(p.lvl), 0) AS level
        |       FROM (SELECT DISTINCT scc_id FROM comp) c
        |       LEFT JOIN paths p ON p.d = c.scc_id
        |       GROUP BY c.scc_id)
        |SELECT lv.scc_id, CAST(lv.level AS INT) AS level, m.n_members
        |FROM lv JOIN (SELECT scc_id, count(*) AS n_members
        |              FROM comp GROUP BY 1) m USING (scc_id)""".stripMargin,

    "q_pagerank" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS src, 'e:' || event_type AS dst
        |           FROM events),
        |nodes AS (SELECT src AS n FROM ed UNION SELECT dst FROM ed),
        |params AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM ed GROUP BY src),
        |pr0 AS (SELECT n, 1.0 / (SELECT nn FROM params) AS r FROM nodes),
        |it1 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr0 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr1 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it1.c, 0) AS r
        |        FROM nodes LEFT JOIN it1 ON nodes.n = it1.n),
        |it2 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr1 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it2.c, 0) AS r
        |        FROM nodes LEFT JOIN it2 ON nodes.n = it2.n),
        |it3 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr2 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it3.c, 0) AS r
        |        FROM nodes LEFT JOIN it3 ON nodes.n = it3.n)
        |SELECT n, ROUND(r, 6) AS r FROM pr3""".stripMargin,

    // personalized teleport: mass restarts at the two seed users; dangling
    // leak model identical to q_pagerank so the unrolled SQL is exact
    "q_pagerank_personal" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS src, 'e:' || event_type AS dst
        |           FROM events),
        |nodes AS (SELECT src AS n FROM ed UNION SELECT dst FROM ed),
        |tele AS (SELECT n, CASE WHEN n IN ('u:1', 'u:2') THEN 0.5 ELSE 0.0 END AS t
        |         FROM nodes),
        |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM ed GROUP BY src),
        |pr0 AS (SELECT n, t, t AS r FROM tele),
        |it1 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr0 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr1 AS (SELECT tele.n, tele.t,
        |               0.15 * tele.t + 0.85 * COALESCE(it1.c, 0) AS r
        |        FROM tele LEFT JOIN it1 ON tele.n = it1.n),
        |it2 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr1 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT tele.n, tele.t,
        |               0.15 * tele.t + 0.85 * COALESCE(it2.c, 0) AS r
        |        FROM tele LEFT JOIN it2 ON tele.n = it2.n),
        |it3 AS (SELECT e.dst AS n, SUM(p.r / o.od) AS c
        |        FROM ed e JOIN od o ON e.src = o.src JOIN pr2 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT tele.n, tele.t,
        |               0.15 * tele.t + 0.85 * COALESCE(it3.c, 0) AS r
        |        FROM tele LEFT JOIN it3 ON tele.n = it3.n)
        |SELECT n, ROUND(r, 6) AS r FROM pr3""".stripMargin,

    // weighted teleport-only model: contributions proportional to edge
    // weight (support count) over the source's total out-weight
    "q_pagerank_weighted" ->
      """WITH ed AS (SELECT 'u:' || user_id AS src, 'e:' || event_type AS dst,
        |                  CAST(count(*) AS DOUBLE) AS w
        |           FROM events GROUP BY 1, 2),
        |nodes AS (SELECT src AS n FROM ed UNION SELECT dst FROM ed),
        |params AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |sw AS (SELECT src, SUM(w) AS sw FROM ed GROUP BY src),
        |pr0 AS (SELECT n, 1.0 / (SELECT nn FROM params) AS r FROM nodes),
        |it1 AS (SELECT e.dst AS n, SUM(p.r * e.w / o.sw) AS c
        |        FROM ed e JOIN sw o ON e.src = o.src JOIN pr0 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr1 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it1.c, 0) AS r
        |        FROM nodes LEFT JOIN it1 ON nodes.n = it1.n),
        |it2 AS (SELECT e.dst AS n, SUM(p.r * e.w / o.sw) AS c
        |        FROM ed e JOIN sw o ON e.src = o.src JOIN pr1 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it2.c, 0) AS r
        |        FROM nodes LEFT JOIN it2 ON nodes.n = it2.n),
        |it3 AS (SELECT e.dst AS n, SUM(p.r * e.w / o.sw) AS c
        |        FROM ed e JOIN sw o ON e.src = o.src JOIN pr2 p ON p.n = e.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT nodes.n,
        |               0.15 / (SELECT nn FROM params) + 0.85 * COALESCE(it3.c, 0) AS r
        |        FROM nodes LEFT JOIN it3 ON nodes.n = it3.n)
        |SELECT n, ROUND(r, 6) AS r FROM pr3""".stripMargin,

    // HITS, L1-normalized half-steps (sum division — SQL-replicable
    // exactly; rankings invariant under positive rescaling)
    "q_hits" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS src, 'e:' || event_type AS dst
        |           FROM events),
        |nodes AS (SELECT src AS n FROM ed UNION SELECT dst FROM ed),
        |h0 AS (SELECT n, 1.0 AS h FROM nodes),
        |a1r AS (SELECT e.dst AS n, SUM(h0.h) AS x
        |        FROM ed e JOIN h0 ON h0.n = e.src GROUP BY e.dst),
        |a1 AS (SELECT nodes.n, COALESCE(a1r.x, 0) / (SELECT SUM(x) FROM a1r) AS a
        |       FROM nodes LEFT JOIN a1r ON nodes.n = a1r.n),
        |h1r AS (SELECT e.src AS n, SUM(a1.a) AS x
        |        FROM ed e JOIN a1 ON a1.n = e.dst GROUP BY e.src),
        |h1 AS (SELECT nodes.n, COALESCE(h1r.x, 0) / (SELECT SUM(x) FROM h1r) AS h
        |       FROM nodes LEFT JOIN h1r ON nodes.n = h1r.n),
        |a2r AS (SELECT e.dst AS n, SUM(h1.h) AS x
        |        FROM ed e JOIN h1 ON h1.n = e.src GROUP BY e.dst),
        |a2 AS (SELECT nodes.n, COALESCE(a2r.x, 0) / (SELECT SUM(x) FROM a2r) AS a
        |       FROM nodes LEFT JOIN a2r ON nodes.n = a2r.n),
        |h2r AS (SELECT e.src AS n, SUM(a2.a) AS x
        |        FROM ed e JOIN a2 ON a2.n = e.dst GROUP BY e.src),
        |h2 AS (SELECT nodes.n, COALESCE(h2r.x, 0) / (SELECT SUM(x) FROM h2r) AS h
        |       FROM nodes LEFT JOIN h2r ON nodes.n = h2r.n)
        |SELECT h2.n, ROUND(h2.h, 6) AS hub, ROUND(a2.a, 6) AS auth
        |FROM h2 JOIN a2 ON h2.n = a2.n""".stripMargin,

    // synchronous LPA, unrolled (2 rounds, min-label ties — deterministic
    // by construction, so the SQL replays the exact same rounds)
    "q_communities" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS a,
        |                  'b:' || CAST(FLOOR(value / 100) AS BIGINT) AS b
        |           FROM events),
        |canon AS (SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM ed
        |          WHERE a <> b GROUP BY 1, 2),
        |nbr AS (SELECT x AS n, y AS m FROM canon UNION ALL SELECT y, x FROM canon),
        |l0 AS (SELECT DISTINCT n, n AS lbl FROM nbr),
        |c1 AS (SELECT nbr.n, l0.lbl, count(*) AS c
        |       FROM nbr JOIN l0 ON l0.n = nbr.m GROUP BY 1, 2),
        |l1 AS (SELECT n, lbl FROM (
        |         SELECT n, lbl, row_number() OVER (PARTITION BY n ORDER BY c DESC, lbl) AS rk
        |         FROM c1) WHERE rk = 1),
        |c2 AS (SELECT nbr.n, l1.lbl, count(*) AS c
        |       FROM nbr JOIN l1 ON l1.n = nbr.m GROUP BY 1, 2),
        |l2 AS (SELECT n, lbl FROM (
        |         SELECT n, lbl, row_number() OVER (PARTITION BY n ORDER BY c DESC, lbl) AS rk
        |         FROM c2) WHERE rk = 1)
        |SELECT n AS node, lbl AS community FROM l2""".stripMargin,

    // two-table dump check (same pattern as q_simhash_pairs): the oracle
    // re-validates the DUMPED k-core membership against the raw edge table
    // in SQL — (a) every member's within-core degree >= 3 and equal to the
    // dumped core_deg, (b) no outside node has >= 3 core neighbors (the
    // core was maximal). A wrong peel breaks the value match without the
    // oracle ever running the peeling.
    // 3 Bellman-Ford rounds unrolled: each d_k relaxes d_{k-1} over the
    // weighted symmetric edges; integer weights → exact distances
    "q_sssp" ->
      """WITH ed AS (SELECT 'u:' || user_id AS a,
        |                   'b:' || CAST(FLOOR(value / 100) AS BIGINT) AS b,
        |                   CAST(count(*) AS BIGINT) AS w
        |            FROM events GROUP BY 1, 2),
        |sym AS (SELECT a AS s, b AS d, w FROM ed
        |        UNION ALL SELECT b, a, w FROM ed),
        |d0 AS (SELECT 'u:1' AS n, CAST(0 AS BIGINT) AS dist),
        |d1 AS (SELECT n, MIN(dist) AS dist FROM (
        |         SELECT n, dist FROM d0
        |         UNION ALL
        |         SELECT sym.d, d0.dist + sym.w FROM d0 JOIN sym ON d0.n = sym.s)
        |       GROUP BY 1),
        |d2 AS (SELECT n, MIN(dist) AS dist FROM (
        |         SELECT n, dist FROM d1
        |         UNION ALL
        |         SELECT sym.d, d1.dist + sym.w FROM d1 JOIN sym ON d1.n = sym.s)
        |       GROUP BY 1),
        |d3 AS (SELECT n, MIN(dist) AS dist FROM (
        |         SELECT n, dist FROM d2
        |         UNION ALL
        |         SELECT sym.d, d2.dist + sym.w FROM d2 JOIN sym ON d2.n = sym.s)
        |       GROUP BY 1)
        |SELECT n AS node, CAST(dist AS BIGINT) AS dist FROM d3""".stripMargin,

    // canonical-edge triangle enumeration (the q_triangles pattern) over
    // the thresholded co-activity graph + the 2T/d(d-1) ratio
    "q_clustering" ->
      """WITH m AS (SELECT DISTINCT user_id AS u,
        |             CAST(FLOOR(value / 20) AS BIGINT) AS b FROM events),
        |ed AS (SELECT l.u AS x, r.u AS y
        |       FROM m l JOIN m r ON l.b = r.b AND l.u < r.u
        |       GROUP BY 1, 2 HAVING count(*) >= 10),
        |deg AS (SELECT n, count(*) AS d FROM (
        |          SELECT x AS n FROM ed UNION ALL SELECT y FROM ed) GROUP BY n),
        |tri AS (SELECT e1.x AS n1, e1.y AS n2, e2.y AS n3
        |        FROM ed e1 JOIN ed e2 ON e1.x = e2.x AND e1.y < e2.y
        |        JOIN ed e3 ON e3.x = e1.y AND e3.y = e2.y),
        |tcnt AS (SELECT node, count(*) AS t FROM (
        |           SELECT n1 AS node FROM tri
        |           UNION ALL SELECT n2 FROM tri
        |           UNION ALL SELECT n3 FROM tri) GROUP BY node)
        |SELECT deg.n AS node, CAST(coalesce(t, 0) AS BIGINT) AS n_triangles,
        |       d AS degree,
        |       round(CASE WHEN d >= 2
        |                  THEN 2.0 * coalesce(t, 0) / (d * (d - 1))
        |                  ELSE 0.0 END, 6) AS clustering
        |FROM deg LEFT JOIN tcnt ON tcnt.node = deg.n""".stripMargin,

    // per-landmark min-hop distances: 3 relaxation rounds unrolled, then
    // the harmonic Σ 1/hops with 1/0 excluded by the hops > 0 filter
    "q_harmonic" ->
      """WITH m AS (SELECT DISTINCT 'p:' || l_partkey AS p, 'c:' || o_custkey AS c
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS s, p AS d FROM m UNION ALL SELECT p, c FROM m),
        |d0 AS (SELECT n AS lm, n AS node, 0 AS hops
        |       FROM (VALUES ('c:1'), ('c:2'), ('c:3')) t(n)),
        |d1 AS (SELECT lm, node, MIN(hops) AS hops FROM (
        |         SELECT lm, node, hops FROM d0
        |         UNION ALL
        |         SELECT d0.lm, e.d, d0.hops + 1 FROM d0 JOIN e ON d0.node = e.s)
        |       GROUP BY 1, 2),
        |d2 AS (SELECT lm, node, MIN(hops) AS hops FROM (
        |         SELECT lm, node, hops FROM d1
        |         UNION ALL
        |         SELECT d1.lm, e.d, d1.hops + 1 FROM d1 JOIN e ON d1.node = e.s)
        |       GROUP BY 1, 2),
        |d3 AS (SELECT lm, node, MIN(hops) AS hops FROM (
        |         SELECT lm, node, hops FROM d2
        |         UNION ALL
        |         SELECT d2.lm, e.d, d2.hops + 1 FROM d2 JOIN e ON d2.node = e.s)
        |       GROUP BY 1, 2)
        |SELECT node, count(*) AS n_landmarks,
        |       round(sum(1.0 / hops), 6) AS harmonic
        |FROM d3 WHERE hops > 0 GROUP BY node""".stripMargin,

    "q_kcore_check" ->
      """WITH ed AS (SELECT DISTINCT 'u:' || user_id AS a,
        |                  'b:' || CAST(FLOOR(value / 100) AS BIGINT) AS b
        |           FROM events),
        |und AS (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
        |core AS (SELECT node, core_deg
        |         FROM read_parquet('__GRAFT_OUT__/q_kcore/*.parquet')),
        |icd AS (SELECT u.a AS node, count(*) AS d
        |        FROM und u
        |        JOIN core c1 ON u.a = c1.node
        |        JOIN core c2 ON u.b = c2.node
        |        GROUP BY u.a),
        |bc AS (SELECT count(*) AS v FROM core LEFT JOIN icd USING (node)
        |       WHERE COALESCE(icd.d, 0) < 3 OR icd.d <> core.core_deg),
        |bo AS (SELECT count(*) AS v FROM (
        |         SELECT u.a, count(*) AS d
        |         FROM und u JOIN core c ON u.b = c.node
        |         WHERE u.a NOT IN (SELECT node FROM core)
        |         GROUP BY u.a) WHERE d >= 3)
        |SELECT (SELECT count(*) FROM core) AS n_core,
        |       (SELECT v FROM bc) AS bad_core,
        |       (SELECT v FROM bo) AS bad_outside""".stripMargin,

    "q_neighbor_jaccard" ->
      """WITH m AS (SELECT DISTINCT event_type AS n, user_id AS nb FROM events),
        |deg AS (SELECT n, count(*) AS d FROM m GROUP BY n),
        |sh AS (SELECT l.n AS a, r.n AS b, count(DISTINCT l.nb) AS shared
        |       FROM m l JOIN m r ON l.nb = r.nb AND l.n < r.n GROUP BY 1, 2)
        |SELECT sh.a, sh.b, sh.shared,
        |       CAST(sh.shared AS DOUBLE) / (da.d + db.d - sh.shared) AS jaccard
        |FROM sh JOIN deg da ON da.n = sh.a JOIN deg db ON db.n = sh.b
        |ORDER BY 1, 2""".stripMargin,

    "q_conv_stats" ->
      """SELECT user_id, count(*) AS n_events,
        |       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY 1""".stripMargin,

    // two-table dump check: the signature table itself is engine-specific
    // (q_simhash_sigs stays rows-only), but the PAIR OPERATOR — 16-bit
    // banding, self-join, dedupe, hamming<=3 filter — is recomputed here in
    // SQL from the DUMPED signatures, so any join/band/dedupe bug breaks
    // the value match. __GRAFT_OUT__ is substituted by Verify with the dump
    // directory it just wrote.
    "q_simhash_pairs" ->
      """WITH sigs AS (
        |  SELECT id, simhash
        |  FROM read_parquet('__GRAFT_OUT__/q_simhash_sigs/*.parquet')),
        |banded AS (
        |  SELECT id, simhash, bi, (simhash >> CAST(bi * 16 AS INTEGER)) & 65535 AS k
        |  FROM sigs, range(4) t(bi)),
        |cand AS (
        |  SELECT DISTINCT l.id AS a, r.id AS b, l.simhash AS sa, r.simhash AS sb
        |  FROM banded l JOIN banded r
        |    ON l.bi = r.bi AND l.k = r.k AND l.id < r.id)
        |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,

    // quality contract for the approximate operators: recall_ok is the
    // literal expectation (recall computed IN SPARK against exact
    // references that are themselves value-gated — q_ann_topk /
    // q_embed_neardup); the reference-set SIZES are recomputed here
    // exactly (8 queries × top-5; exact rounded-cosine pair count), so a
    // broken reference side cannot silently shrink the recall base
    "q_ann_recall" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |flat AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |         CAST(unnest(a.embedding) AS DOUBLE) AS xa,
        |         CAST(unnest(b.embedding) AS DOUBLE) AS xb
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |dots AS (SELECT a, b, sum(xa * xb) AS dp, sum(xa * xa) AS na, sum(xb * xb) AS nb
        |         FROM flat GROUP BY 1, 2),
        |np AS (SELECT count(*) AS n FROM dots
        |       WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.3)
        |SELECT 'ivf_full_probe' AS variant, CAST(40 AS BIGINT) AS n_ref, true AS recall_ok
        |UNION ALL SELECT 'ivf', 40, true
        |UNION ALL SELECT 'ivf_trained', 40, true
        |UNION ALL SELECT 'lsh_neardup', (SELECT n FROM np), true
        |UNION ALL SELECT 'pq', 40, true
        |UNION ALL SELECT 'pq_full_overscan', 40, true
        |UNION ALL SELECT 'ivf_pq', 40, true
        |UNION ALL SELECT 'ivf_pq_full', 40, true""".stripMargin,

    // literal naming contract (nodeset.py:123-141, model.py:596):
    // registry-resolved specs must produce exactly these names/paths
    "q_naming" ->
      """SELECT 'cust_name' AS entity, 'nodeset_Customer_Gold_uuid' AS value
        |UNION ALL SELECT 'cust_path', '/warehouse/prod/nodeset_Customer_Gold_uuid'
        |UNION ALL SELECT 'cust_path_override', '/warehouse/staging/nodeset_Customer_Gold_uuid'
        |UNION ALL SELECT 'line_name', 'nodeset_Line_l_orderkey_l_linenumber'
        |UNION ALL SELECT 'placed_name', 'relationshipset_PLACED_Customer_Order'
        |UNION ALL SELECT 'placed_path', '/warehouse/prod/relationshipset_PLACED_Customer_Order'""".stripMargin
    // q_simhash_sigs / q_lsh_sigs (xxhash-derived signatures) /
    // q_pq_codebook (engine-trained floats) / q_kcore (dump re-validated
    // by q_kcore_check): rows-only structural dumps — each one's CONSUMER
    // gate (q_simhash_pairs / q_embed_neardup_lsh / q_ann_pq + q_ann_ivfpq
    // / q_kcore_check) replays the operator from it value-exactly, so no
    // gate's rows go unverified.
  )
}
