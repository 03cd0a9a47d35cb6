package graft.coverage

import graft.{Q, Tables}
import graft.Queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-5 pipeline additions: the two data-SELECTION mechanisms a
  * 100 TB pretraining corpus applies after filtering/dedup — DSIR-style
  * hashed-n-gram importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling") and CCNet-style
  * LM-perplexity bucketing (Wenzek et al. 2020). Both reduce to two hash
  * aggregates plus a broadcast of a BOUNDED model table (64 feature
  * buckets / the reference-corpus vocabulary), so the per-document pass
  * stays map-side at any corpus size; the only global step is the final
  * rank split, which at 100 TB becomes an approx-quantile threshold
  * computed on a sample (exact ntile here keeps it oracle-checkable).
  * All log-probability math is quantized per term (floor(ln·1e6) as
  * BIGINT) BEFORE summation so the result is bit-stable regardless of
  * aggregation order — the established q_pipe_unigram_lm contract. */
object Pipeline6Queries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")

  /** DSIR importance weights over hashed bigram features: target = the
    * English subset (the quality proxy), raw = the whole corpus. Each
    * bigram hashes into one of 64 buckets; per-bucket importance is the
    * smoothed log-ratio ln[(nt+1)(R+64) / (nr+1)(T+64)] and a document's
    * weight is the sum over its feature OCCURRENCES. The 64-row weight
    * table is broadcast — the per-doc scoring join never shuffles the
    * corpus; `selected` marks the top importance quartile (ntile with
    * doc_id tie-break = the deterministic stand-in for Gumbel resampling). */
  val qPipeDsir: Q = Q(
    run = (s, dir) => {
      val pairs = docs(s, dir).select(col("doc_id"), col("lang"),
          explode(zip_with(
            expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
            expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
            (a, b) => concat(a, lit(" "), b))).as("pair"))
        .withColumn("b", hashStr(col("pair")) % 64)
      val raw = pairs.groupBy(col("b")).agg(count(lit(1)).as("nr"))
      val tgt = pairs.filter(col("lang") === "en").groupBy(col("b")).agg(count(lit(1)).as("nt"))
      val totals = pairs.agg(
        count(lit(1)).as("tr"),
        count(when(col("lang") === "en", 1)).as("tt"))
      val feat = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("nt"))
        .crossJoin(broadcast(totals))
        .select(col("b"),
          floor(log(((col("nt") + 1) * (col("tr") + 64)).cast("double") /
                    ((col("nr") + 1) * (col("tt") + 64)).cast("double")) * 1000000.0)
            .cast("long").as("lr"))
      pairs.join(broadcast(feat), Seq("b"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_feats"), sum(col("lr")).cast("long").as("w_micro"))
        .withColumn("selected",
          ntile(4).over(Window.orderBy(col("w_micro").desc, col("doc_id"))) === 1)
        .orderBy(col("doc_id"))
    },
    oracle = Some(s"""
      WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      fb AS (SELECT doc_id, lang,
                    ${oHash("pair")} % 64 AS b
             FROM (SELECT doc_id, lang,
                          unnest(list_transform(generate_series(1, len(ws) - 1),
                                                i -> ws[i] || ' ' || ws[i + 1])) AS pair
                   FROM toks)),
      raw AS (SELECT b, COUNT(*) AS nr FROM fb GROUP BY b),
      tgt AS (SELECT b, COUNT(*) AS nt FROM fb WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT COUNT(*) AS tr, COUNT(*) FILTER (lang = 'en') AS tt FROM fb),
      feat AS (SELECT raw.b,
                      CAST(FLOOR(ln(CAST((COALESCE(nt, 0) + 1) * (tr + 64) AS DOUBLE)
                                    / CAST((nr + 1) * (tt + 64) AS DOUBLE)) * 1000000.0) AS BIGINT) AS lr
               FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
      w AS (SELECT doc_id, lang, COUNT(*) AS n_feats, CAST(SUM(lr) AS BIGINT) AS w_micro
            FROM fb JOIN feat ON fb.b = feat.b GROUP BY doc_id, lang)
      SELECT doc_id, lang, n_feats, w_micro,
             (ntile(4) OVER (ORDER BY w_micro DESC, doc_id) = 1) AS selected
      FROM w ORDER BY doc_id"""))

  /** CCNet-style perplexity bucketing: a unigram LM with add-1 smoothing
    * is fit on the reference subset (lang='en' — CCNet's Wikipedia LM),
    * every document is scored by its per-word cross-entropy under that
    * LM (OOV words get the smoothing floor 1/(N+V)), and the corpus is
    * split into head/middle/tail terciles of ascending cross-entropy —
    * CCNet trains on head+middle (`kept`). The LM table is bounded by
    * the REFERENCE vocabulary (not the corpus), so the scoring join is a
    * broadcast; cross-entropy is integer micro-nats (per-word quantized
    * log-probs, truncating positive division — both engines agree). */
  val qPipeCcnetBucket: Q = Q(
    run = (s, dir) => {
      val w = docs(s, dir).select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      val ref = w.filter(col("lang") === "en")
      val counts = ref.groupBy(col("w")).agg(count(lit(1)).as("nw"))
      val stats = ref.agg(count(lit(1)).as("n_ref"), countDistinct(col("w")).as("v_ref"))
      w.join(broadcast(counts), Seq("w"), "left").na.fill(0L, Seq("nw"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("lang"),
          floor(log((col("nw") + 1).cast("double") /
                    (col("n_ref") + col("v_ref")).cast("double")) * 1000000.0)
            .cast("long").as("lp"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_words"),
             expr("CAST((-sum(lp)) DIV count(1) AS BIGINT)").as("ce_micro"))
        .withColumn("bucket",
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            ntile(3).over(Window.orderBy(col("ce_micro"), col("doc_id")))))
        .withColumn("kept", col("bucket") =!= "tail")
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      ref AS (SELECT w FROM w WHERE lang = 'en'),
      counts AS (SELECT w, COUNT(*) AS nw FROM ref GROUP BY w),
      stats AS (SELECT COUNT(*) AS n_ref, COUNT(DISTINCT w) AS v_ref FROM ref),
      scored AS (
        SELECT doc_id, lang,
               CAST(FLOOR(ln(CAST(COALESCE(nw, 0) + 1 AS DOUBLE)
                             / CAST(n_ref + v_ref AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
        FROM w LEFT JOIN counts USING (w), stats),
      ce AS (SELECT doc_id, lang, COUNT(*) AS n_words,
                    CAST((-SUM(lp)) // COUNT(*) AS BIGINT) AS ce_micro
             FROM scored GROUP BY doc_id, lang),
      b AS (SELECT *, ['head', 'middle', 'tail'][ntile(3) OVER (ORDER BY ce_micro, doc_id)] AS bucket
            FROM ce)
      SELECT doc_id, lang, n_words, ce_micro, bucket, (bucket <> 'tail') AS kept
      FROM b ORDER BY doc_id"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_pipe_dsir" -> qPipeDsir,
    "q_pipe_ccnet_bucket" -> qPipeCcnetBucket,
  )
}
