package graft

import graft.functions.StringSim.jaro_winkler
import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-checkable `oracleSql` where SQL-expressible.
  * Queries run against the driver's parquet tables in `dir`
  * (TESTDATA.md); the record-linkage pipeline itself is exercised on the
  * deterministic synthetic corpus (FIXTURES.md §1) by `entry` and the specs.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full blocking → scoring → CC → decisions run on the synthetic
    * repo-file corpus; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = SynthCorpus.corpus(spark)
    Pipeline.run(spark, files, SynthCorpus.aliasDict).decisions
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (scans, filters, aggregations — SURVEY §2.1/2.2/2.6)
    "q_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "q_filter_project" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .where($"o_orderstatus" === "F" && $"o_totalprice" > 1000.0)
        .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("price"))
        .orderBy($"o_orderkey")
    }),
    "q_join_agg" -> ((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"c_mktsegment")
    }),
    // window top-1 (reference best-entity top-1, O3 — SURVEY §2.8)
    "q_window_top1" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("best_price"))
        .orderBy($"o_custkey")
    }),
    // ---- text analysis over documents (training-data pipeline ops)
    "q_token_count" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"),
          length($"text").cast("long").as("n_chars2"))
        .orderBy($"doc_id")
    }),
    "q_quality_score" -> ((s, d) => {
      import s.implicits._
      // quality scoring: char length, token count, mean token length,
      // stop-ratio of a fixed common-token list
      val stops = Seq("the", "a", "data", "key", "value")
      t(s, d, "documents")
        .withColumn("toks", split($"text", " "))
        .select(
          $"doc_id",
          round(length($"text") / size($"toks"), 4).as("mean_tok_len"),
          round(
            size(filter($"toks", t => t.isin(stops.map(lit(_)): _*)))
              / size($"toks").cast("double"), 4).as("stop_ratio"))
        .orderBy($"doc_id")
    }),
    // exact dedup: hash-groupBy on content (dedup op #1)
    "q_exact_dedup" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy(md5($"text").as("h"))
        .agg(count(lit(1)).as("copies"), min($"doc_id").as("keeper"))
        .where($"copies" > 1)
        .orderBy($"h")
    }),
    // blocked pair generation: sort-merge self-join with l<r (J2/B4)
    "q_pairs_blocked" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
        .select($"doc_id", $"source", $"lang")
      val l = docs.select($"source", $"doc_id".as("l_id"), $"lang".as("l_lang"))
      val r = docs.select($"source", $"doc_id".as("r_id"), $"lang".as("r_lang"))
      l.join(r, Seq("source"))
        .where($"l_id" < $"r_id" && $"l_lang" === $"r_lang")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"source")
    }),
    // jaro-winkler custom expression vs DuckDB's built-in (F4)
    "q_jaro_winkler" -> ((s, d) => {
      import s.implicits._
      val p = t(s, d, "part").select($"p_partkey", $"p_name", $"p_brand")
      p.select($"p_partkey",
          round(jaro_winkler($"p_name", $"p_brand"), 6).as("jw"))
        .orderBy($"p_partkey")
    }),
    // bounded levenshtein (north_star pairing of F4)
    "q_levenshtein" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select($"p_partkey",
          levenshtein($"p_name", $"p_type").cast("long").as("lev"))
        .orderBy($"p_partkey")
    }),
    // n-gram (token 2-shingle) Jaccard near-dup over blocked doc pairs
    "q_ngram_jaccard" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
        .select($"doc_id", $"source",
          array_distinct(split($"text", " ")).as("toks"))
      val l = docs.select($"source", $"doc_id".as("l_id"), $"toks".as("l_toks"))
      val r = docs.select($"source", $"doc_id".as("r_id"), $"toks".as("r_toks"))
      l.join(r, Seq("source"))
        .where($"l_id" < $"r_id")
        .withColumn("raw",
          size(array_intersect($"l_toks", $"r_toks")).cast("double") /
            size(array_union($"l_toks", $"r_toks")))
        .where($"raw" >= 0.5) // filter on the RAW value (oracle does too)
        .select($"l_id", $"r_id", round($"raw", 4).as("jaccard"))
        .orderBy($"l_id", $"r_id")
    }),
    // brute-force cosine top-k similarity search over embeddings
    "q_embed_topk" -> ((s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings")
        .select($"vec_id", $"embedding",
          sqrt(aggregate(transform($"embedding", x => x * x),
            lit(0.0d), (a, x) => a + x)).as("norm"))
      val probe = e.where($"vec_id" < 3)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"norm".as("q_norm"))
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      e.crossJoin(broadcast(probe))
        .where($"vec_id" =!= $"q_id")
        .withColumn("cos",
          aggregate(zip_with($"embedding", $"q_emb", (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x) / ($"norm" * $"q_norm"))
        .withColumn("rn", row_number().over(w))
        .where($"rn" <= 5)
        .select($"q_id", $"vec_id", round($"cos", 4).as("cos"), $"rn")
        .orderBy($"q_id", $"rn")
    }),
    // running-window analytics (G10 PR-curve shape) over events
    "q_running_window" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("running_value", round(sum($"value").over(w), 4))
        .select($"user_id", $"event_id", $"running_value")
        .orderBy($"user_id", $"event_id")
    }),
    // language-ID heuristic (training-data op; explicit tie-break chain)
    "q_langid" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", TextAnalysis.langId($"text").as("lang_pred"))
        .groupBy($"lang_pred").agg(count(lit(1)).as("n"))
        .orderBy($"lang_pred")
    }),
    // exact-dedup assignment incl. sha256 parity (Dedup.exact shape)
    "q_dedup_assign" -> ((s, d) => {
      import s.implicits._
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .select($"id".cast("long").as("doc_id"), $"keeper".cast("long").as("keeper"),
          $"copies", $"h")
        .orderBy($"doc_id")
    }),
    // deterministic sampling O6: md5-ordered top-100
    "q_det_sample" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          md5(concat_ws(" ", $"l_orderkey", $"l_linenumber")).as("mk"))
        .orderBy($"mk").limit(100)
    }),
    // PR-curve window analytics G10 over events (label = click)
    "q_pr_curve" -> ((s, d) => {
      import s.implicits._
      val scored = t(s, d, "events")
        .select($"event_id".as("leftId"), $"event_id".as("rightId"),
          $"value".as("score"), ($"event_type" === "click").as("label"))
      Reports.prCurve(scored)
        .select($"rank", round($"score", 4).as("score"),
          round($"precision", 6).as("precision"), round($"recall", 6).as("recall"),
          round($"precisionAtBest", 6).as("p_best"))
        .orderBy($"rank")
    }),
    // back-off string generator P5: expanded string = type + name (4 words)
    "q_backoff" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select($"p_partkey",
          split($"p_name", "\\s+").getItem(1).as("name"),
          concat($"p_type", lit(" "), $"p_name", lit(" "), $"p_brand").as("es"))
        .select($"p_partkey",
          explode(Aliases.backoffStrings($"name", $"es")).as("backoff"))
        .orderBy($"p_partkey", $"backoff")
    }),
    // ---- non-SQL-expressible ops (rows-only driver check)
    // simhash fingerprints + near-dup groups over documents
    "q_simhash_dedup" -> ((s, d) => {
      import s.implicits._
      Dedup.simhash(t(s, d, "documents"), "doc_id", "text", maxHamming = 3)
        .groupBy($"dupGroup").agg(count(lit(1)).as("members"))
    }),
    // minhash-LSH near-dup groups (dedup op #2)
    "q_minhash_dedup" -> ((s, d) => {
      import s.implicits._
      Dedup.minhashLsh(t(s, d, "documents"), "doc_id", "text")
        .groupBy($"dupGroup").agg(count(lit(1)).as("members"))
    }),
    // LSH ANN top-k (scale path of q_embed_topk)
    "q_lsh_topk" -> ((s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings")
      SimilaritySearch.lshTopK(e, e.where($"vec_id" < 3), "vec_id", "embedding", 5)
    }),
    // quality + fingerprint text analysis bundle
    "q_text_analysis" -> ((s, d) => {
      import s.implicits._
      TextAnalysis.analyze(t(s, d, "documents"), "text")
        .select($"doc_id", $"lang_pred", $"quality", $"n_tokens_ws",
          $"n_tokens_bpe", size($"fp").as("fp_len"))
    }),
    // multimodal plumbing: synthetic media -> batched feature extraction
    "q_multimodal_features" -> ((s, _) => {
      Multimodal.extractFeatures(Multimodal.synth(s, 256)).toDF()
    }),
    // minhash-LSH block keys over documents (B1 reframing)
    "q_minhash_blocks" -> ((s, d) => {
      import s.implicits._
      val conf = GraftConf()
      val docs = t(s, d, "documents")
        .withColumn("tokens", filter(split(lower($"text"), "[^a-z0-9]+"), x => length(x) > 0))
        .withColumn("bands",
          graft.functions.VecFunctions.minhash_bands(
            Mentions.shingleHashes($"tokens", conf.shingleK),
            conf.minHashes, conf.bands, conf.seed))
      docs.select($"doc_id", explode($"bands").as("band"))
        .groupBy($"band").agg(count(lit(1)).as("n"))
        .where($"n" > 1)
    }),
    // connected components on the documents near-dup graph (C2)
    "q_connected_components" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
        .select($"doc_id".cast("string").as("id"), $"source",
          array_distinct(split($"text", " ")).as("toks"))
      val l = docs.select($"source", $"id".as("src"), $"toks".as("l_toks"))
      val r = docs.select($"source", $"id".as("dst"), $"toks".as("r_toks"))
      val edges = l.join(r, Seq("source"))
        .where($"src" < $"dst")
        .where(size(array_intersect($"l_toks", $"r_toks")).cast("double") /
          size(array_union($"l_toks", $"r_toks")) >= 0.5)
        .select($"src", $"dst")
      ConnectedComponents.run(docs.select($"id"), edges)
        .groupBy($"component").agg(count(lit(1)).as("members"))
    }),
    // full pipeline on the synthetic corpus (smoke within queries)
    "q_pipeline_decisions" -> ((s, _) => {
      Pipeline.run(s, SynthCorpus.corpus(s), SynthCorpus.aliasDict).decisions
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_project" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_top1" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars2
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id,
        |  round(length(text) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS mean_tok_len,
        |  round(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the', 'a', 'data', 'key', 'value')))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_exact_dedup" ->
      """SELECT md5(text) AS h, count(*) AS copies, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "q_pairs_blocked" ->
      """SELECT l.source AS source, count(*) AS n_pairs
        |FROM documents l JOIN documents r ON l.source = r.source
        |WHERE l.doc_id < r.doc_id AND l.lang = r.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_jaro_winkler" ->
      """SELECT p_partkey, round(jaro_winkler_similarity(p_name, p_brand), 6) AS jw
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_levenshtein" ->
      """SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS t
        |  FROM documents)
        |SELECT l.doc_id AS l_id, r.doc_id AS r_id,
        |  round(CAST(len(list_intersect(l.t, r.t)) AS DOUBLE)
        |    / len(list_distinct(list_concat(l.t, r.t))), 4) AS jaccard
        |FROM toks l JOIN toks r ON l.source = r.source
        |WHERE l.doc_id < r.doc_id
        |  AND CAST(len(list_intersect(l.t, r.t)) AS DOUBLE)
        |    / len(list_distinct(list_concat(l.t, r.t))) >= 0.5
        |ORDER BY l_id, r_id""".stripMargin,
    "q_embed_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
        |  FROM embeddings),
        |probe AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm
        |          FROM e WHERE vec_id < 3),
        |pairs AS (
        |  SELECT probe.q_id, e.vec_id,
        |    list_sum(list_transform(list_zip(e.embedding, probe.q_emb),
        |      p -> CAST(p[1] AS DOUBLE) * p[2])) / (e.norm * probe.q_norm) AS cos_raw
        |  FROM e CROSS JOIN probe WHERE e.vec_id != probe.q_id)
        |SELECT q_id, vec_id, round(cos_raw, 4) AS cos, rn FROM (
        |  SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS INT) AS rn
        |  FROM pairs) WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "q_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |      t -> t IN ('the','and','of','to','is','in','that','with'))) AS en,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |      t -> t IN ('el','la','de','que','y','los','en','una'))) AS es,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |      t -> t IN ('der','die','das','und','ist','nicht','mit','ein'))) AS de,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |      t -> t IN ('le','la','les','de','et','est','une','que'))) AS fr
        |  FROM documents)
        |SELECT lang_pred, count(*) AS n FROM (
        |  SELECT CASE WHEN greatest(en, es, de, fr) = 0 THEN 'und'
        |    WHEN en >= es AND en >= de AND en >= fr THEN 'en'
        |    WHEN es >= de AND es >= fr THEN 'es'
        |    WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred FROM s)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_assign" ->
      """WITH g AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |k AS (SELECT h, min(doc_id) AS keeper, count(*) AS copies FROM g GROUP BY 1)
        |SELECT g.doc_id, k.keeper, k.copies, g.h
        |FROM g JOIN k ON g.h = k.h ORDER BY g.doc_id""".stripMargin,
    "q_det_sample" ->
      """SELECT l_orderkey, l_linenumber,
        |  md5(concat_ws(' ', l_orderkey, l_linenumber)) AS mk
        |FROM lineitem ORDER BY mk LIMIT 100""".stripMargin,
    "q_pr_curve" ->
      """WITH scored AS (
        |  SELECT event_id AS l, value AS score, event_type = 'click' AS label
        |  FROM events),
        |running AS (
        |  SELECT l, score,
        |    count(*) OVER w AS rank,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) OVER w AS tp,
        |    (SELECT count(*) FROM scored WHERE label) AS npos
        |  FROM scored
        |  WINDOW w AS (ORDER BY score DESC, l
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |curve AS (
        |  SELECT *, CAST(tp AS DOUBLE)/rank AS prec,
        |    max(CAST(tp AS DOUBLE)/rank) OVER (ORDER BY score DESC, l
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_best_raw
        |  FROM running)
        |SELECT rank, round(score, 4) AS score, round(prec, 6) AS precision,
        |  round(CAST(tp AS DOUBLE)/greatest(npos, 1), 6) AS recall,
        |  round(p_best_raw, 6) AS p_best
        |FROM curve ORDER BY rank""".stripMargin,
    "q_backoff" ->
      """WITH w AS (
        |  SELECT p_partkey,
        |    split_part(p_name, ' ', 2) AS name,
        |    p_type || ' ' || p_name || ' ' || p_brand AS es,
        |    string_split_regex(p_type || ' ' || p_name || ' ' || p_brand, '\s+') AS ws
        |  FROM part),
        |spans AS (
        |  SELECT DISTINCT p_partkey, name, es,
        |    array_to_string(ws[st.s : st.s + l.l - 1], ' ') AS backoff
        |  FROM w,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS l) l,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws) - l.l + 1)) AS s) st)
        |SELECT p_partkey, backoff FROM spans
        |WHERE len(string_split_regex(backoff, '\s+'))
        |    >= len(string_split_regex(name, '\s+')) + 1
        |  AND contains(lower(backoff), lower(name)) AND backoff != es
        |ORDER BY p_partkey, backoff""".stripMargin,
    "q_running_window" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin
  )
}
