package graft.coverage

import graft.{Q, Tables}
import graft.sql.EngineEnv
import org.apache.spark.sql.functions._

/** Round-6 DDL coverage: table/view property mutation read-back.
  *
  * Ref flink-sql-parser ddl package — SqlAlterTableProperties.java (ALTER
  * TABLE t SET ('k'='v') re-points connector options live),
  * SqlAlterViewProperties.java (catalog-metadata-only view props), and
  * SqlAlterViewAs.java (redefine the view's query in place). All three are
  * driven through one oracle-gated query whose legs only hash-match if the
  * mutations actually took effect on read-back.
  */
object Round6Queries {

  private def san(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** ALTER TABLE SET switches BOTH path and format (parquet dir A → orc
    * dir B) and the very next read must see B's rows through the orc
    * reader; ALTER VIEW AS swaps the view body (F-filter → P-filter);
    * ALTER VIEW SET records catalog props and must leave the (redefined)
    * view readable. Legs: before=F via parquet, after=O via orc,
    * view=P via the redefined view. */
  val qSqlAlterSet: Q = Q(
    run = (s, dir) => {
      val scratch = graft.streaming.StreamOps.scratchRoot + s"/alterset_${san(dir)}"
      val orders = Tables.load(s, dir, "orders")
      orders.filter(col("o_orderstatus") === "F")
        .coalesce(1).write.mode("overwrite").parquet(s"$scratch/a")
      orders.filter(col("o_orderstatus") === "O")
        .coalesce(1).write.mode("overwrite").orc(s"$scratch/b")
      val e = new EngineEnv(s)
      e.executeSql(s"""
        CREATE TABLE alt_t (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE
        ) WITH ('connector'='filesystem', 'path'='$scratch/a', 'format'='parquet')""")
      val agg = """SELECT '%s' AS leg, COUNT(*) AS n,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
                   FROM %s"""
      val before = e.sqlQuery(agg.format("before", "alt_t"))
      e.executeSql(s"ALTER TABLE alt_t SET ('path'='$scratch/b', 'format'='orc')")
      val after = e.sqlQuery(agg.format("after", "alt_t"))
      e.executeSql("CREATE VIEW alt_v AS SELECT * FROM alt_t WHERE 1 = 0")
      e.executeSql(s"""
        CREATE TABLE full_t (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE
        ) WITH ('connector'='filesystem', 'path'='$dir/orders.parquet', 'format'='parquet')""")
      e.executeSql("ALTER VIEW alt_v AS SELECT * FROM full_t WHERE o_orderstatus = 'P'")
      e.executeSql("ALTER VIEW alt_v SET ('comment'='redefined', 'owner'='graft')")
      require(e.viewProperties("alt_v") ==
        Map("comment" -> "redefined", "owner" -> "graft"), "view props not recorded")
      val view = e.sqlQuery(agg.format("view", "alt_v"))
      before.union(after).union(view).orderBy(col("leg"))
    },
    oracle = Some("""
      WITH agg AS (
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
        FROM orders GROUP BY o_orderstatus)
      SELECT 'before' AS leg, n, total_c FROM agg WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'after' AS leg, n, total_c FROM agg WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'view' AS leg, n, total_c FROM agg WHERE o_orderstatus = 'P'
      ORDER BY leg"""))

  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q_sql_alter_set" -> qSqlAlterSet)
}
