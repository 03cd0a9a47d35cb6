package graft
class DbgSpec extends SparkTestBase {
  test("dbg evolve exact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_evolve_dbg2").toString
    Seq(
      """{"before":null,"after":{"k":1,"v":5},"op":"c"}""",
      """{"before":null,"after":{"k":2,"v":6,"w":60},"op":"c"}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val e = new graft.sql.EngineEnv(s)
    e.executeSql(s"""
      CREATE TABLE evo (k BIGINT, v BIGINT)
      WITH ('connector'='filesystem', 'path'='$dir', 'format'='debezium-json')""")
    e.executeSql("ALTER TABLE evo ADD COLUMNS (w BIGINT)")
    e.sqlQuery("SELECT k, w FROM evo ORDER BY k").show(false)
  }
}
