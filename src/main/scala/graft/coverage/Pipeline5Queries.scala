package graft.coverage

import graft.{Q, Tables}
import graft.Queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 pipeline additions: the dataset-assembly endgame steps a
  * 100 TB training corpus runs after filtering/dedup — the deterministic
  * train/val/test split and the output shard manifest. Both are pure
  * map-side hash assignment + one aggregate: no shuffle beyond the final
  * group-by, replayable on any cluster size (no RNG state, same rows →
  * same split on 1 or 1000 executors). */
object Pipeline5Queries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")

  /** Deterministic stratified train/val/test split — 90/5/5 by document
    * hash, audited per (source, split): counts and char volume. The audit
    * row set is what a data-engineering review signs off on before a
    * training run; determinism (hash-gated, not RNG) makes the split
    * reproducible and leak-checkable forever after. */
  val qPipeSplit: Q = Q(
    run = (s, dir) =>
      docs(s, dir)
        .withColumn("hv", hashStr(concat(lit("split_"), col("doc_id").cast("string"))) % 100)
        .withColumn("split",
          when(col("hv") < 90, lit("train")).when(col("hv") < 95, lit("val")).otherwise(lit("test")))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("n_chars_total"),
             min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"), col("split")),
    oracle = Some(s"""
      WITH h AS (SELECT doc_id, source, n_chars,
                        ${oHash("'split_' || doc_id")} % 100 AS hv
                 FROM documents),
           sp AS (SELECT *, CASE WHEN hv < 90 THEN 'train'
                                 WHEN hv < 95 THEN 'val'
                                 ELSE 'test' END AS split FROM h)
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      FROM sp GROUP BY source, split ORDER BY source, split"""))

  /** Output shard manifest — hash-assign every document to one of 16
    * output shards and emit the per-shard manifest row (doc count, char
    * volume, id fingerprint). At 100 TB this is `repartition(shard)` +
    * `write.partitionBy(shard)`; the manifest aggregate is the bookkeeping
    * a tokenizer fleet consumes. The fingerprint (sum of doc hashes) makes
    * shard CONTENT — not just counts — comparable across reruns. */
  val qPipeShards: Q = Q(
    run = (s, dir) =>
      docs(s, dir)
        .withColumn("shard", (hashStr(concat(lit("shard_"), col("doc_id").cast("string"))) % 16).cast("int"))
        // modular residues keep the SUM inside BIGINT at any corpus size
        // (ANSI overflow at ~9e12 rows even then — far past any shard)
        .withColumn("dh", hashStr(col("text")) % 1000003L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("n_chars_total"),
             sum(col("dh")).cast("long").as("content_fp"))
        .orderBy(col("shard")),
    oracle = Some(s"""
      SELECT CAST(${oHash("'shard_' || doc_id")} % 16 AS INT) AS shard,
             COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
             CAST(SUM(${oHash("text")} % 1000003) AS BIGINT) AS content_fp
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Adjacent token-pair statistics — the counting kernel of BPE-style
    * vocabulary induction (merge candidates = most frequent adjacent
    * pairs): per document, zip the token sequence with its own tail, then
    * one global hash-agg; top-100 by (count, pair). Map-side explode +
    * partial agg — the same one-shuffle shape at 100 TB, where this runs
    * per merge round over the whole corpus. Tokenization contract shared
    * with q_pipe_tokens (split on single space). */
  val qPipeBigramStats: Q = Q(
    run = (s, dir) => {
      docs(s, dir)
        .select(explode(zip_with(
          expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
          expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(100)
    },
    oracle = Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
      pairs AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                             i -> ws[i] || ' ' || ws[i + 1])) AS pair
                FROM toks)
      SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair
      ORDER BY cnt DESC, pair LIMIT 100"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_pipe_split" -> qPipeSplit,
    "q_pipe_shards" -> qPipeShards,
    "q_pipe_bigram_stats" -> qPipeBigramStats,
  )
}
