package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4.2 / the 100 TB design rule
  * "skewed keys → salting or AQE skew-join").
  *
  * The hot-key hazard: a shuffle hash/sort-merge join sends every row of a
  * key to ONE reducer — a single hot key serializes the join. Salting
  * splits each left key into `factor` sub-keys deterministically (hash of
  * the whole row, not rand() — replayable) and replicates the right side
  * `factor`× so every sub-key still finds its match. Result is identical to
  * the plain join; the hot key now spreads over `factor` reducers.
  *
  * Spark's AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) does this adaptively for sort-merge joins; this operator is the
  * explicit form for when the skew is known up front or the join shape
  * isn't AQE-eligible (e.g. inside streaming foreachBatch). */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(factor)))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
