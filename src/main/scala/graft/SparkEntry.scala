package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{MaintPipelines, QueryCatalog => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator family from SURVEY.md §2 (and the training-data extras)
  * has a `queries` entry; SQL-expressible ones carry a DuckDB oracle. */
object SparkEntry {

  /** Flagship: full maintenance pipeline (build token table from documents →
    * compact → z-order → verifiable scan) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MaintPipelines.zorderRoundtrip(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 sources
    "src_scan_pushdown" -> (Q.srcScanPushdown _),
    "src_iterable" -> (Q.srcIterable _),
    "src_sql" -> (Q.srcSql _),
    "src_ttl_commands" -> (Q.srcTtlCommands _),
    "src_csv" -> (Q.srcCsv _),
    "src_jsonl" -> (Q.srcJsonl _),
    "src_yaml" -> (Q.srcYaml _),
    "src_txt" -> (Q.srcTxt _),
    "src_api" -> (Q.srcApi _),
    // §2.2 filters
    "flt_values_match" -> (Q.fltValuesMatch _),
    "flt_values_exclude" -> (Q.fltValuesExclude _),
    "flt_regex" -> (Q.fltRegex _),
    "flt_condition_algebra" -> (Q.fltConditionAlgebra _),
    "flt_contains" -> (Q.fltContains _),
    "flt_schema_enforcer" -> (Q.fltSchemaEnforcer _),
    // §2.3 transformers / interpretations
    "tfm_value_projection" -> (Q.tfmValueProjection _),
    "tfm_expand_json" -> (Q.tfmExpandJson _),
    "tfm_switch" -> (Q.tfmSwitch _),
    "tfm_find_many_zip" -> (Q.tfmFindManyZip _),
    "tfm_jsonpath" -> (Q.tfmJsonPath _),
    "tfm_interpret_source_node" -> (Q.tfmInterpretSourceNode _),
    "tfm_interpret_relationship" -> (Q.tfmInterpretRelationship _),
    "tfm_multi_pass" -> (Q.tfmMultiPass _),
    "tfm_interpreter_full" -> (Q.tfmInterpreterFull _),
    // §2.4 expression providers
    "exp_format" -> (Q.expFormat _),
    "exp_regex_extract" -> (Q.expRegexExtract _),
    "exp_cast" -> (Q.expCast _),
    "exp_normalize" -> (Q.expNormalize _),
    "exp_mapping" -> (Q.expMapping _),
    // §2.5 write-path semantics
    "dbn_debounce_last_wins" -> (Q.dbnDebounceLastWins _),
    "dbn_upsert_eager" -> (Q.dbnUpsertEager _),
    "dbn_match_only" -> (Q.dbnMatchOnly _),
    "dbn_ttl" -> (Q.dbnTtl _),
    // relational core
    "agg_pricing" -> (Q.aggPricing _),
    "join_revenue" -> (Q.joinRevenue _),
    "win_running" -> (Q.winRunning _),
    // maintenance engine (north rule)
    "maint_compact" -> ((s, d) => MaintPipelines.compactRoundtrip(s, d)),
    "maint_zorder" -> ((s, d) => MaintPipelines.zorderRoundtrip(s, d)),
    "maint_hilbert" -> ((s, d) => MaintPipelines.hilbertRoundtrip(s, d)),
    "maint_merge" -> ((s, d) => MaintPipelines.mergeRoundtrip(s, d)),
    "maint_partitioned" -> ((s, d) => MaintPipelines.partitionedRoundtrip(s, d)),
    "maint_concurrent_merge" -> ((s, d) => MaintPipelines.concurrentMergeRoundtrip(s, d)),
    "maint_merge_match_only" -> ((s, d) => MaintPipelines.mergeMatchOnlyRoundtrip(s, d)),
    "maint_merge_create" -> ((s, d) => MaintPipelines.mergeCreateRoundtrip(s, d)),
    "maint_hooks" -> ((s, d) => MaintPipelines.mergeHooksRoundtrip(s, d)),
    "maint_merge_fuzzy" -> ((s, d) => MaintPipelines.mergeFuzzyRoundtrip(s, d)),
    "maint_delete" -> ((s, d) => MaintPipelines.deleteRoundtrip(s, d)),
    "maint_expire" -> ((s, d) => MaintPipelines.expireAndScan(s, d)),
    "maint_time_travel" -> ((s, d) => MaintPipelines.timeTravelRoundtrip(s, d)),
    "maint_copy" -> ((s, d) => MaintPipelines.copyRoundtrip(s, d)),
    "maint_table_source" -> ((s, d) => MaintPipelines.tableSourcePushdown(s, d)),
    "maint_pipeline_yaml" -> ((s, d) => MaintPipelines.pipelineYamlRoundtrip(s, d)),
    "maint_schema_evolution" -> ((s, d) => MaintPipelines.schemaEvolutionRoundtrip(s, d)),
    "maint_migrations" -> ((s, d) => MaintPipelines.migrationsRoundtrip(s, d)),
    "maint_delete_mor" -> ((s, d) => MaintPipelines.deleteMorRoundtrip(s, d)),
    "maint_wap" -> ((s, d) => MaintPipelines.wapRoundtrip(s, d)),
    "maint_incremental" -> ((s, d) => MaintPipelines.incrementalRoundtrip(s, d)),
    "maint_changelog" -> ((s, d) => MaintPipelines.changelogRoundtrip(s, d)),
    "maint_changelog_append" -> ((s, d) => MaintPipelines.changelogAppendRoundtrip(s, d)),
    "maint_stream_append" -> ((s, d) => MaintPipelines.streamAppendRoundtrip(s, d)),
    "maint_stream_merge" -> ((s, d) => MaintPipelines.streamMergeRoundtrip(s, d)),
    "maint_stream_merge_mor" -> ((s, d) => MaintPipelines.streamMergeMorRoundtrip(s, d)),
    "stream_window_counts" -> (Q.streamWindowCounts _),
    "stream_dedup" -> (Q.streamDedup _),
    // dedup
    "ddp_exact" -> (Q.ddpExact _),
    "ddp_jaccard_pairs" -> (Q.ddpJaccardPairs _),
    "ddp_minhash_lsh" -> (Q.ddpMinhashLsh _),
    "ddp_components" -> (Q.ddpComponents _),
    "ddp_simhash" -> (Q.ddpSimhash _),
    "ddp_incremental" -> (Q.ddpIncremental _),
    "ddp_decontaminate" -> (Q.ddpDecontaminate _),
    "ddp_embed_cosine_dup" -> (Q.ddpEmbedCosineDup _),
    // similarity search
    "ann_brute_topk" -> (Q.annBruteTopK _),
    "ann_lsh_topk" -> (Q.annLshTopK _),
    "ann_ivf_topk" -> (Q.annIvfTopK _),
    "ann_quantize_int8" -> (Q.annQuantizeInt8 _),
    "pack_chunks" -> (Q.packChunks _),
    "pipeline_curate" -> (Q.pipelineCurate _),
    "smp_stratified" -> (Q.smpStratified _),
    "sel_token_budget" -> (Q.selTokenBudget _),
    // text analysis
    "txt_langid" -> (Q.txtLangId _),
    "txt_quality" -> (Q.txtQuality _),
    "txt_tokens" -> (Q.txtTokens _),
    "txt_fingerprint" -> (Q.txtFingerprint _),
    "txt_repetition" -> (Q.txtRepetition _),
    "txt_pii_scrub" -> (Q.txtPiiScrub _),
    // multimodal plumbing
    "mm_decode_meta" -> (Q.mmDecodeMeta _),
    "mm_frame_resize" -> (Q.mmFrameResize _))

  def oracleSql: Map[String, String] = Map(
    "src_scan_pushdown" ->
      "SELECT doc_id, n_chars, source FROM documents WHERE n_chars > 300",
    "src_iterable" ->
      "SELECT i AS id, (i*7) % 13 AS v FROM range(0, 1000) t(i)",
    "flt_values_match" ->
      "SELECT doc_id, lang, source FROM documents WHERE lower(lang) IN ('en','de') AND source IN ('src0','src1','src2')",
    "flt_values_exclude" ->
      "SELECT doc_id, lang, source FROM documents WHERE NOT (lang IN ('en','de') AND source IN ('src0','src1','src2'))",
    "flt_regex" ->
      "SELECT event_id, event_type FROM events WHERE regexp_matches(event_type, '^(sign|purch)')",
    "flt_condition_algebra" ->
      "SELECT event_id, user_id, event_type FROM events WHERE (event_type = 'purchase' AND value > 100.0) OR (NOT (user_id < 10) AND event_type <> 'error')",
    "flt_contains" ->
      "SELECT event_id, user_id, event_type FROM events WHERE contains(event_type, 'urch') OR (contains(props, '7') AND user_id < 5)",
    "src_api" ->
      "SELECT source, CAST(i AS INT) AS row_id, CAST((length(source)*31 + i*7) % 13 AS INT) AS v FROM (SELECT DISTINCT source FROM documents), (SELECT UNNEST(generate_series(0, 49)) AS i)",
    "flt_schema_enforcer" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events WHERE event_id % 13 <> 0",
    "src_sql" ->
      "SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source",
    "src_ttl_commands" ->
      "SELECT source AS object_type, CAST(24*length(source) AS INT) AS expiry_in_hours, CAST(100 AS INT) AS batch_size FROM (SELECT DISTINCT source FROM documents)",
    "src_csv" ->
      "SELECT doc_id, n_chars, lang, source FROM documents",
    "src_jsonl" ->
      "SELECT doc_id, n_chars, lang, source FROM documents",
    "src_yaml" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id < 50",
    "src_txt" ->
      "SELECT CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source AS line FROM documents",
    "tfm_jsonpath" ->
      """WITH d AS (SELECT doc_id, to_json({'meta': {'lang': lang, 'words': string_split(text, ' ')}}) AS j
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  json_extract_string(j, '$.meta.lang') AS jp_lang,
        |  json_extract_string(j, '$.meta.words[1]') AS jp_w1,
        |  CAST(json_extract(j, '$.meta.words') AS VARCHAR) AS jp_words
        |FROM d""".stripMargin,
    "tfm_multi_pass" ->
      """SELECT 'Document' AS node_type, 'doc-' || CAST(doc_id AS VARCHAR) AS node_key, CAST(n_chars AS BIGINT) AS prop FROM documents
        |UNION ALL
        |SELECT 'Language' AS node_type, lower(lang) AS node_key, CAST(NULL AS BIGINT) AS prop FROM (SELECT DISTINCT lang FROM documents)""".stripMargin,
    "tfm_interpreter_full" ->
      """SELECT 'Word' AS node_type, lower(unnest(string_split(text, ' '))) AS node_key,
        |  'APPEARS_IN' AS rel_type, 'doc-' || CAST(doc_id AS VARCHAR) AS to_key, lower(lang) AS prop_lang
        |FROM documents WHERE doc_id < 30""".stripMargin,
    "tfm_value_projection" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS word, lang FROM documents WHERE doc_id < 50",
    "tfm_expand_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events",
    "tfm_switch" ->
      "SELECT event_id, CAST(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2))*2 WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2))+10 ELSE CAST(value AS DECIMAL(18,2)) END AS DOUBLE) AS routed_value FROM events",
    "tfm_find_many_zip" ->
      "SELECT doc_id, unnest(['lang','source']) AS k, unnest([lang, source]) AS v FROM documents WHERE doc_id < 100",
    "tfm_interpret_source_node" ->
      "SELECT 'Document' AS node_type, lower(source || '-' || CAST(doc_id AS VARCHAR)) AS node_key, n_chars AS prop_n_chars, lower(lang) AS prop_lang FROM documents",
    "tfm_interpret_relationship" ->
      "SELECT DISTINCT 'doc-' || CAST(doc_id AS VARCHAR) AS from_key, 'IN_LANGUAGE' AS rel_type, lower(lang) AS to_key FROM documents",
    "exp_format" ->
      "SELECT doc_id, source || ':' || lang || ':' || CAST(n_chars AS VARCHAR) AS formatted FROM documents",
    "exp_regex_extract" ->
      "SELECT event_id, NULLIF(regexp_extract(event_type, '^([a-z]+)u', 1), '') AS g1 FROM events",
    "exp_cast" ->
      "SELECT doc_id, CAST(n_chars AS VARCHAR) AS as_str, CAST(n_chars AS DOUBLE) AS as_double, (n_chars % 2 = 0) AS as_bool FROM documents",
    "exp_normalize" ->
      "SELECT doc_id, upper(lang) AS upper_lang, trim('  ' || source || '  ') AS trimmed, regexp_replace(source || '...', '\\.+$', '') AS no_dots FROM documents",
    "exp_mapping" ->
      "SELECT doc_id, CASE lang WHEN 'en' THEN 'english' WHEN 'de' THEN 'german' WHEN 'es' THEN 'spanish' WHEN 'fr' THEN 'french' WHEN 'zh' THEN 'chinese' ELSE 'unknown' END AS lang_name FROM documents",
    "dbn_debounce_last_wins" ->
      "SELECT user_id, event_type, event_id AS last_event_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) rn FROM events) WHERE rn = 1",
    "dbn_upsert_eager" ->
      "SELECT doc_id, COALESCE(b_n_chars, n_chars) AS n_chars, COALESCE(b_lang, lang) AS lang FROM (SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 3 <> 0) a FULL JOIN (SELECT doc_id, n_chars*10 AS b_n_chars, 'xx' AS b_lang FROM documents WHERE doc_id % 2 = 0) b USING (doc_id)",
    "dbn_match_only" ->
      "SELECT doc_id, COALESCE(b_n_chars, n_chars) AS n_chars FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 <> 0) a LEFT JOIN (SELECT doc_id, n_chars*10 AS b_n_chars FROM documents WHERE doc_id % 2 = 0) b USING (doc_id)",
    "dbn_ttl" ->
      "SELECT event_id, user_id FROM events WHERE ts >= TIMESTAMP '2024-03-01 00:00:00'",
    "agg_pricing" ->
      "SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, COUNT(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' GROUP BY 1, 2",
    "join_revenue" ->
      "SELECT o_orderkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' GROUP BY 1 HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) > 100000.0",
    "win_running" ->
      "SELECT l_suppkey, l_orderkey, l_linenumber, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty FROM lineitem WHERE l_suppkey < 20",
    "maint_compact" -> MaintPipelines.baseOracle,
    "maint_zorder" -> MaintPipelines.baseOracle,
    "maint_hilbert" -> MaintPipelines.baseOracle,
    "maint_expire" -> MaintPipelines.baseOracle,
    "maint_time_travel" -> MaintPipelines.baseOracle,
    "maint_copy" -> MaintPipelines.baseOracle,
    "maint_table_source" -> MaintPipelines.tableSourceOracle,
    "maint_merge" -> MaintPipelines.mergeOracle,
    // same end state as maint_merge — the partitioned table must converge to
    // identical content; the partition/pruning assertions are inside the query
    "maint_partitioned" -> MaintPipelines.mergeOracle,
    "maint_concurrent_merge" -> MaintPipelines.concurrentMergeOracle,
    "maint_merge_match_only" -> MaintPipelines.mergeMatchOnlyOracle,
    "maint_merge_create" -> MaintPipelines.mergeCreateOracle,
    "maint_hooks" -> MaintPipelines.mergeHooksOracle,
    "maint_merge_fuzzy" -> MaintPipelines.mergeFuzzyOracle,
    "maint_pipeline_yaml" -> MaintPipelines.baseOracle,
    "maint_schema_evolution" -> MaintPipelines.schemaEvolutionOracle,
    "maint_migrations" -> MaintPipelines.migrationsOracle,
    "maint_delete_mor" -> MaintPipelines.deleteMorOracle,
    "maint_wap" -> MaintPipelines.wapOracle,
    "maint_incremental" -> MaintPipelines.incrementalOracle,
    "maint_changelog" -> MaintPipelines.changelogOracle,
    "maint_changelog_append" -> MaintPipelines.changelogAppendOracle,
    "maint_stream_append" -> MaintPipelines.streamAppendOracle,
    // micro-batched MERGE converges to the one-shot MERGE state (ops are
    // doc-disjoint), so the oracle is the merge oracle verbatim
    "maint_stream_merge" -> MaintPipelines.mergeOracle,
    // MoR streaming converges to the same end state as the one-shot merge
    "maint_stream_merge_mor" -> MaintPipelines.mergeOracle,
    "maint_delete" -> MaintPipelines.deleteOracle,
    "stream_dedup" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    "stream_window_counts" ->
      """SELECT date_trunc('day', ts) AS window_start, event_type, COUNT(*) AS cnt
        |FROM events
        |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "ddp_exact" ->
      "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents GROUP BY text",
    "ddp_incremental" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
        |FROM documents b WHERE doc_id >= 250
        |  AND NOT EXISTS (SELECT 1 FROM documents c WHERE c.doc_id < 250 AND c.text = b.text)
        |GROUP BY text""".stripMargin,
    "ddp_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-4, 0)+1),
        |       i -> array_to_string(ws[i:least(i+3, len(ws))], ' '))) AS gs FROM w),
        |ev AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 97 = 13),
        |corp AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 97 <> 13)
        |SELECT doc_id, count(*) AS matched_ngrams FROM corp JOIN ev USING (gram) GROUP BY doc_id""".stripMargin,
    "ddp_jaccard_pairs" ->
      """WITH ws AS (SELECT doc_id, lang, source, list_distinct(string_split(lower(trim(text)), ' ')) AS w FROM documents WHERE doc_id < 300)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE), 4) AS jaccard
        |FROM ws a JOIN ws b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE) >= 0.5""".stripMargin,
    "txt_langid" ->
      """WITH s AS (SELECT doc_id, ' ' || text || ' ' AS t FROM documents),
        |c AS (SELECT doc_id,
        |  CAST((length(t)-length(replace(t,' the ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' and ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' of ','')))/4 AS INT) AS en,
        |  CAST((length(t)-length(replace(t,' der ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' und ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' die ','')))/5 AS INT) AS de,
        |  CAST((length(t)-length(replace(t,' el ','')))/4 AS INT)+CAST((length(t)-length(replace(t,' los ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' una ','')))/5 AS INT) AS es,
        |  CAST((length(t)-length(replace(t,' le ','')))/4 AS INT)+CAST((length(t)-length(replace(t,' les ','')))/5 AS INT)+CAST((length(t)-length(replace(t,' des ','')))/5 AS INT) AS fr
        |FROM s)
        |SELECT doc_id, CASE WHEN GREATEST(en,de,es,fr) = 0 THEN 'und'
        |  WHEN fr >= es AND fr >= en AND fr >= de THEN 'fr'
        |  WHEN es >= en AND es >= de THEN 'es'
        |  WHEN en >= de THEN 'en' ELSE 'de' END AS lang_guess FROM c""".stripMargin,
    "txt_quality" ->
      s"""WITH b AS (SELECT doc_id, text, ' ' || text || ' ' AS t,
         |  len(string_split(trim(text), ' ')) AS words FROM documents)
         |SELECT doc_id, CAST(words AS INT) AS n_words,
         |  ${ops.OracleSql.qualityExpr} AS quality
         |FROM b""".stripMargin,
    "pipeline_curate" -> ops.OracleSql.pipelineCurate(minQuality = 0.55, maxLen = 2048),
    // Spark truncates (rate*10000).cast(long); FLOOR (not CAST) mirrors that
    // in DuckDB, whose double->int cast rounds
    "smp_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 10000 <
        |  CAST(FLOOR((CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END) * 10000.0) AS BIGINT)""".stripMargin,
    "sel_token_budget" ->
      s"""WITH b AS (SELECT doc_id, text, ' ' || text || ' ' AS t,
         |  len(string_split(trim(text), ' ')) AS words, n_chars FROM documents),
         |q AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n, ${ops.OracleSql.qualityExpr} AS quality FROM b),
         |o AS (SELECT doc_id, n, COALESCE(CAST(SUM(n) OVER (ORDER BY quality DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off FROM q)
         |SELECT doc_id, n FROM o WHERE n > 0 AND off + n <= 100000""".stripMargin,
    "txt_tokens" ->
      "SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS ws_tokens, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS bpeish_tokens FROM documents",
    "txt_fingerprint" ->
      """WITH RECURSIVE f AS (
        |  SELECT doc_id, text AS pre, 1 AS i, CAST(0 AS BIGINT) AS acc FROM documents
        |  UNION ALL
        |  SELECT doc_id, pre, i + 1, (acc*131 + COALESCE(ascii(substring(pre, i, 1)), 0)) % 1000000007 FROM f WHERE i <= GREATEST(length(pre), 1)
        |)
        |SELECT doc_id, acc AS fp FROM f WHERE i = GREATEST(length(pre), 1) + 1""".stripMargin,
    "txt_repetition" ->
      """WITH b AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, len(ws) AS n,
        |  CASE WHEN len(ws) >= 2 THEN list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) ELSE [] END AS bg FROM b)
        |SELECT doc_id, CAST(n AS INT) AS n_words,
        |  ROUND(CAST(n - len(list_distinct(ws)) AS DOUBLE)/n, 4) AS dup_word_frac,
        |  ROUND(CAST(list_max(list_transform(list_distinct(ws), w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)/n, 4) AS top_word_frac,
        |  CASE WHEN n >= 2 THEN ROUND(CAST(list_max(list_transform(list_distinct(bg), w -> len(list_filter(bg, x -> x = w)))) AS DOUBLE)/(n-1), 4) ELSE NULL END AS top_bigram_frac
        |FROM c""".stripMargin,
    "txt_pii_scrub" ->
      """WITH p AS (SELECT doc_id, text || ' contact doc' || doc_id || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) + len(regexp_extract_all(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\b\d{3}-\d{4}\b')) AS INT) AS n_redactions,
        |  regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
        |FROM p""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
        |  CAST(strlen(text) AS INT) AS byte_len,
        |  CAST(16 + strlen(text) % 1920 AS INT) AS width,
        |  CAST(16 + (strlen(text)*7) % 1080 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 240 ELSE 1 END AS INT) AS n_frames
        |FROM documents""".stripMargin,
    "mm_frame_resize" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |  CAST(16 + strlen(text) % 1920 AS INT) AS w,
        |  CAST(16 + (strlen(text)*7) % 1080 AS INT) AS h,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 240 ELSE 1 END AS INT) AS nf
        |FROM documents)
        |SELECT media_id,
        |  CAST(i * GREATEST(CAST(FLOOR(nf/4.0) AS INT), 1) AS INT) AS frame_idx,
        |  GREATEST(CAST(FLOOR(CAST(w AS DOUBLE) * LEAST(GREATEST(w, h), 256) / GREATEST(w, h)) AS INT), 1) AS out_w,
        |  GREATEST(CAST(FLOOR(CAST(h AS DOUBLE) * LEAST(GREATEST(w, h), 256) / GREATEST(w, h)) AS INT), 1) AS out_h
        |FROM (SELECT media_id, w, h, nf, UNNEST(generate_series(0, LEAST(nf - 1, 3))) AS i FROM d)""".stripMargin,
    "ann_brute_topk" -> ops.OracleSql.bruteTopK(k = 10, queryFilter = "vec_id < 3"),
    // hash-based operators: the Spark impls use the engine-portable integer
    // hash family (TextOps.polyHash/seededHash, integer-quantized hyperplane
    // signatures), so DuckDB reproduces buckets and pairs exactly
    "ddp_simhash" -> ops.OracleSql.simhash(filter = "doc_id < 200"),
    "ddp_minhash_lsh" -> ops.OracleSql.minhashLsh(
      bands = 4, rowsPerBand = 3, shingleN = 3, threshold = 0.6),
    "ddp_components" -> ops.OracleSql.minhashComponents(
      bands = 4, rowsPerBand = 3, shingleN = 3, threshold = 0.6),
    "ddp_embed_cosine_dup" -> ops.OracleSql.embedCosineDup(planes = 4, threshold = 0.2),
    "ann_lsh_topk" -> ops.OracleSql.annLshTopK(planes = 6, k = 5, queryFilter = "id < 5"),
    // full-probe IVF is exact: the oracle is the brute-force ranking itself
    "ann_ivf_topk" -> ops.OracleSql.bruteTopK(k = 5, queryFilter = "vec_id < 5"),
    "ann_quantize_int8" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s,
        |    embedding FROM embeddings),
        |qq AS (
        |  SELECT vec_id, s,
        |    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / s) AS INT)) END AS qv
        |  FROM q)
        |SELECT vec_id, ROUND(s, 6) AS scale6,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_max(qv) AS INT) AS q_max
        |FROM qq""".stripMargin,
    "pack_chunks" ->
      """WITH o AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n,
        |    COALESCE(CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, n, off, UNNEST(generate_series(off // 4096, (off + n - 1) // 4096)) AS chunk_id
        |  FROM o WHERE n > 0)
        |SELECT chunk_id, COUNT(*) AS n_docs,
        |  CAST(SUM(LEAST(off + n, (chunk_id + 1) * 4096) - GREATEST(off, chunk_id * 4096)) AS BIGINT) AS n_tokens
        |FROM spans GROUP BY 1""".stripMargin)
}
