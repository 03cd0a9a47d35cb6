package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, session_window, window}

/** Flink Table-API DSL facade — the PROGRAMMATIC third of the reference's
  * API surface (§1.1 Table, alongside SQL and DataStream):
  * `flink-table-api-java/.../api/Table.java` (select/filter/groupBy/
  * window/join/union/orderBy/fetch/addColumns/renameColumns/dropColumns)
  * and the window builders `Tumble.java`/`Slide.java`/`Session.java`
  * (`Tumble over 10.minutes on 'ts as 'w`).
  *
  * Spark-first: every method is sugar over the equivalent DataFrame
  * call — the facade adds ZERO runtime surface; Catalyst plans the result
  * exactly as if the user had written DataFrame code (asserted in
  * TableApiSpec). Expressions are Spark `Column`s (the analog of Flink's
  * Scala-implicit Expression DSL). Window aliases resolve to the Spark
  * window struct, so `$"w.start"` / `$"w.end"` work in the post-window
  * select exactly like Flink's `'w.start` / `'w.end`.
  */
final class GTable(val df: DataFrame) {

  def select(cols: Column*): GTable = new GTable(df.select(cols: _*))
  def filter(cond: Column): GTable = new GTable(df.filter(cond))
  def where(cond: Column): GTable = filter(cond)
  def as(aliases: String*): GTable = new GTable(df.toDF(aliases: _*))
  def distinct(): GTable = new GTable(df.distinct())

  def groupBy(keys: Column*): GroupedGTable = new GroupedGTable(df, keys)
  def window(w: GroupWindow): WindowedGTable = new WindowedGTable(df, w)

  // Table.addColumns / renameColumns / dropColumns (1.12 API additions)
  def addColumns(cols: (String, Column)*): GTable =
    new GTable(cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })
  def renameColumns(renames: (String, String)*): GTable =
    new GTable(renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  def dropColumns(names: String*): GTable = new GTable(df.drop(names: _*))

  def join(other: GTable, cond: Column): GTable = new GTable(df.join(other.df, cond))
  def join(other: GTable, cond: Column, joinType: String): GTable =
    new GTable(df.join(other.df, cond, joinType))
  def leftOuterJoin(other: GTable, cond: Column): GTable = join(other, cond, "left_outer")
  def fullOuterJoin(other: GTable, cond: Column): GTable = join(other, cond, "full_outer")

  def unionAll(other: GTable): GTable = new GTable(df.unionByName(other.df))
  def union(other: GTable): GTable = new GTable(df.unionByName(other.df).distinct())
  def minus(other: GTable): GTable = new GTable(df.except(other.df))
  def minusAll(other: GTable): GTable = new GTable(df.exceptAll(other.df))
  def intersect(other: GTable): GTable = new GTable(df.intersect(other.df))
  def intersectAll(other: GTable): GTable = new GTable(df.intersectAll(other.df))

  def orderBy(cols: Column*): GTable = new GTable(df.orderBy(cols: _*))
  def fetch(n: Int): GTable = new GTable(df.limit(n))
  def offset(n: Int): GTable = new GTable(df.offset(n))

  // -------- FLIP-29 row-based operations (Table.map/flatMap, 1.12 API) ----
  // Ref flink-table-api-java Table.java map(Expression)/flatMap(Expression):
  // the call's composite result becomes the row. Spark-first: the argument
  // is a Column of STRUCT (map) or ARRAY<STRUCT> (flatMap) — typically a
  // registered scalar/table function call — and the struct fields expand to
  // the output schema. Codegen-friendly: a plain Project (+ Generate for
  // flatMap), no lambda execution on the driver.

  /** `table.map(call(f, $"c"))` — one composite scalar call per row. */
  def map(call: Column): GTable =
    new GTable(df.select(call.as("__r")).select(col("__r.*")))

  /** `table.flatMap(call(tf, $"c"))` — a table-function call; each element
    * of the returned array becomes an output row. */
  def flatMap(call: Column): GTable =
    new GTable(df.select(org.apache.spark.sql.functions.explode(call).as("__r"))
      .select(col("__r.*")))

  def toDataFrame: DataFrame = df
}

object GTable {
  def apply(df: DataFrame): GTable = new GTable(df)
}

private[table] object GroupedSelect {
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
  import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The output name Spark would give `c`, derived from the EXPRESSION
    * TREE (an Alias node, the leaf of a qualified/struct reference), never
    * from the rendered string — an expression whose printout contains a
    * literal " AS " must not misfire. */
  def outName(c: Column): String = ColumnBridge.convertedExpression(c) match {
    case a: Alias => a.name
    case u: UnresolvedAttribute => u.nameParts.last
    case UnresolvedExtractValue(_, Literal(f, _)) => String.valueOf(f)
    case ne: NamedExpression => ne.name
    case other => other.sql
  }

  /** Flink's grouped `select` lists keys and aggregates together; Spark's
    * `agg` auto-prepends the grouping columns, so each select item is
    * tagged with a positional alias, projected back in user order, and
    * renamed to its natural name. */
  def lower(df: DataFrame, keys: Seq[Column], cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "grouped select needs at least one select item")
    val tagged = cols.zipWithIndex.map { case (c, i) => c.as(s"__gsel_$i") }
    df.groupBy(keys: _*).agg(tagged.head, tagged.tail: _*)
      .select(cols.indices.map(i => col(s"__gsel_$i")): _*)
      .toDF(cols.map(outName): _*)
  }
}

/** `groupBy('a).select('a, 'b.sum as "total")`. */
final class GroupedGTable(df: DataFrame, keys: Seq[Column]) {
  def select(cols: Column*): GTable = new GTable(GroupedSelect.lower(df, keys, cols))

  // FLIP-29 grouped row-based ops — ref Table.java aggregate(Expression) /
  // flatAggregate(Expression) (the Top2 TableAggregateFunction example).
  // `call` is an aggregate expression producing a STRUCT (aggregate) or an
  // ARRAY<STRUCT> (flatAggregate — each element emitted as a row, the
  // multi-row-per-group contract); grouping keys are prepended.

  /** `groupBy('k).aggregate(call(agg, $"v"))` — one struct row per group. */
  def aggregate(call: Column): GTable = {
    val d = df.groupBy(keys: _*).agg(call.as("__r"))
    new GTable(d.select(keys.map(k => col(GroupedSelect.outName(k))) :+ col("__r.*"): _*))
  }

  /** `groupBy('k).flatAggregate(call(top2, $"v"))` — emits every element of
    * the aggregated array as an output row (Top-N-per-group shape). The
    * aggregate runs with map-side partials; only groups shuffle. */
  def flatAggregate(call: Column): GTable = {
    val d = df.groupBy(keys: _*).agg(call.as("__a"))
      .select(keys.map(k => org.apache.spark.sql.functions.col(GroupedSelect.outName(k))) :+
        org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.col("__a")).as("__r"): _*)
    new GTable(d.select(keys.map(k => col(GroupedSelect.outName(k))) :+ col("__r.*"): _*))
  }
}

/** Group-window builders — ref Tumble/Slide/Session builder classes
  * (`Tumble.over(lit(10).minutes).on($("ts")).as("w")`). Durations are
  * Spark interval strings ("10 minutes"), the same spelling the SQL
  * dialect layer produces. */
sealed trait GroupWindow {
  def alias: String
  /** The Spark grouping expression this window lowers to. */
  def groupingCol: Column
}
final case class TumbleWindow(on: String, size: String, alias: String) extends GroupWindow {
  def groupingCol: Column = window(col(on), size).as(alias)
}
final case class SlideWindow(on: String, size: String, slide: String, alias: String) extends GroupWindow {
  def groupingCol: Column = window(col(on), size, slide).as(alias)
}
final case class SessionWindow(on: String, gap: String, alias: String) extends GroupWindow {
  def groupingCol: Column = session_window(col(on), gap).as(alias)
}

object Tumble {
  def over(size: String): TumbleOver = TumbleOver(size)
  final case class TumbleOver(size: String) { def on(c: String): TumbleOn = TumbleOn(size, c) }
  final case class TumbleOn(size: String, on: String) { def as(a: String): TumbleWindow = TumbleWindow(on, size, a) }
}
object Slide {
  def over(size: String): SlideOver = SlideOver(size)
  final case class SlideOver(size: String) { def every(slide: String): SlideEvery = SlideEvery(size, slide) }
  final case class SlideEvery(size: String, slide: String) { def on(c: String): SlideOn = SlideOn(size, slide, c) }
  final case class SlideOn(size: String, slide: String, on: String) { def as(a: String): SlideWindow = SlideWindow(on, size, slide, a) }
}
object Session {
  def withGap(gap: String): SessionGap = SessionGap(gap)
  final case class SessionGap(gap: String) { def on(c: String): SessionOn = SessionOn(gap, c) }
  final case class SessionOn(gap: String, on: String) { def as(a: String): SessionWindow = SessionWindow(on, gap, a) }
}

/** Over (analytic) window builder — ref `Over.java` / `OverWindow.java`:
  * `Over partitionBy 'a orderBy 'ts preceding 10.rows as 'w` then
  * `'b.sum over 'w` in select. Lowers to Spark's `WindowSpec`; the
  * `over(w)` spelling is `expr.over(w.spec)` (exposed via [[OverWindow
  * .apply]] so `w(sum(col))` reads close to Flink's postfix form).
  * UNBOUNDED_ROW / UNBOUNDED_RANGE / CURRENT_ROW follow the reference's
  * frame constants. */
object Over {
  val UNBOUNDED: Long = Long.MinValue
  def partitionBy(cols: Column*): OverPartitioned = OverPartitioned(cols)
  final case class OverPartitioned(parts: Seq[Column]) {
    def orderBy(cols: Column*): OverOrdered = OverOrdered(parts, cols)
  }
  final case class OverOrdered(parts: Seq[Column], order: Seq[Column]) {
    private def base = org.apache.spark.sql.expressions.Window
      .partitionBy(parts: _*).orderBy(order: _*)
    /** ROWS frame: trailing n rows (UNBOUNDED for the full history). */
    def precedingRows(n: Long): OverWindow =
      OverWindow(base.rowsBetween(
        if (n == UNBOUNDED) org.apache.spark.sql.expressions.Window.unboundedPreceding else -n,
        org.apache.spark.sql.expressions.Window.currentRow))
    /** RANGE frame over the (numeric) order value. */
    def precedingRange(n: Long): OverWindow =
      OverWindow(base.rangeBetween(
        if (n == UNBOUNDED) org.apache.spark.sql.expressions.Window.unboundedPreceding else -n,
        org.apache.spark.sql.expressions.Window.currentRow))
    /** Default frame (RANGE UNBOUNDED PRECEDING — the reference's default). */
    def as(unused: String): OverWindow = OverWindow(base.rangeBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow))
  }
}
final case class OverWindow(spec: org.apache.spark.sql.expressions.WindowSpec) {
  /** `w(sum('b))` ≈ Flink's `'b.sum over 'w`. */
  def apply(agg: Column): Column = agg.over(spec)
  def as(unused: String): OverWindow = this
}

/** `table.window(Tumble over ... as 'w).groupBy('w, 'a).select(...)` —
  * the window alias among the groupBy keys is replaced by the lowered
  * window expression; `w.start`/`w.end` are the struct fields of the
  * grouping column, projected AFTER the aggregate (where the aliased
  * grouping struct is in scope), exactly Flink's `'w.start` semantics. */
final class WindowedGTable(df: DataFrame, w: GroupWindow) {
  def groupBy(keys: Column*): WindowedGroupedGTable = {
    val lowered = keys.map { k =>
      // the alias column stands for the window assigner itself
      if (k.toString == w.alias || k.toString == s"`${w.alias}`") w.groupingCol else k
    }
    new WindowedGroupedGTable(df, lowered, w.alias)
  }
}

final class WindowedGroupedGTable(df: DataFrame, keys: Seq[Column], alias: String) {
  def select(cols: Column*): GTable = {
    import org.apache.spark.sql.functions.{col, count, lit}
    require(cols.nonEmpty, "windowed select needs at least one select item")
    def isWinRef(c: Column): Boolean = c.toString.startsWith(alias + ".")
    // aggregate the non-window-field items (positionally tagged); the
    // grouping struct `alias` survives in the agg output, so the window
    // fields project afterwards. A select list of ONLY window-field refs
    // (`select('w.start, 'w.end)`) still needs one aggregate for Spark's
    // agg() call — synthesize a discarded count placeholder.
    val tagged0 = cols.zipWithIndex.collect {
      case (c, i) if !isWinRef(c) => c.as(s"__gsel_$i")
    }
    val tagged = if (tagged0.nonEmpty) tagged0 else Seq(count(lit(1)).as("__gsel_placeholder"))
    val agged = df.groupBy(keys: _*).agg(tagged.head, tagged.tail: _*)
    val ordered = cols.zipWithIndex.map { case (c, i) =>
      if (isWinRef(c)) {
        val s = c.toString
        val ref = { val j = s.lastIndexOf(" AS "); if (j >= 0) s.substring(0, j) else s }
        col(ref).as(GroupedSelect.outName(c))
      } else col(s"__gsel_$i").as(GroupedSelect.outName(c))
    }
    new GTable(agged.select(ordered: _*))
  }
}
