package graft

import org.apache.spark.sql.functions._

/** Round-10 specs: the iterative graph loops' shuffle width follows the
  * session conf (r9 VERDICT #3 — the loops used to hardcode
  * spark.sql.shuffle.partitions=4/8, capping the partitioned fallback's
  * every per-iteration exchange at toy parallelism on exactly the
  * cluster-sized graphs the fallback exists for). Contract: ambient width
  * by default, `graft.graph.loopShufflePartitions` narrows it for one
  * loop, and the override is restored afterwards. */
class Round10Spec extends SparkTestBase {

  private def lcgEdges(n: Int) = {
    val s = spark
    import s.implicits._
    var x = 11L
    val buf = scala.collection.mutable.ListBuffer[(Long, Long)]()
    for (a <- 0 until n; b <- a + 1 until n) {
      x = (x * 1103515245L + 12345L) % 2147483648L
      if (x % 10 < 3) buf += ((a.toLong, b.toLong))
    }
    buf.toSeq.toDF("src", "dst")
  }

  /** Output frame of a loop = the last iteration's shuffle, so its
    * partition count IS the loop's exchange width (AQE off so no
    * post-shuffle coalesce hides it). */
  private def loopWidth(parts: Option[String], ambient: String): Int = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", ambient)
    conf.set("graft.graph.broadcastMaxRows", "0") // force the partitioned path
    parts.foreach(conf.set("graft.graph.loopShufflePartitions", _))
    try graft.operators.GraphOps.pageRank(lcgEdges(40), iters = 2).rdd.getNumPartitions
    finally {
      conf.unset("graft.graph.broadcastMaxRows")
      conf.unset("graft.graph.loopShufflePartitions")
      conf.set("spark.sql.shuffle.partitions", prev)
      conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("graph loop shuffle width follows the ambient conf when the knob is unset") {
    assert(loopWidth(None, ambient = "5") == 5)
    assert(loopWidth(None, ambient = "7") == 7)
  }

  test("graft.graph.loopShufflePartitions narrows the loop width and is restored") {
    assert(loopWidth(Some("3"), ambient = "7") == 3)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4",
      "loop override leaked into the session conf")
  }

  /** The avgDigits oracle emulation (TpcdsVerbatim2Queries): the HUGEINT
    * (2A+n)//(2n) mean with A = |unscaled sum|·10⁴ must be EXACTLY Spark's
    * avg(DECIMAL(p,s)) → DECIMAL(p+4,s+4), digit for digit including the
    * java/python-BigDecimal scientific renders. The fixtures exercise the
    * fixed-point and '0E-10' zero arms (q_tpcds_v18 has real zero-coupon
    * groups); the sign, half-up-tie, and tiny-scientific arms are pinned
    * here on crafted operands — a double-based oracle rounds the .5 tie
    * cases wrong, and HALF_UP must go AWAY from zero for negative means. */
  test("avgDigits oracle emulation matches Spark's decimal avg digit-for-digit") {
    // BigInt transliteration of the SQL avgDigits emits (same arithmetic,
    // DuckDB // == BigInt / for the non-negative operands used)
    def emulate(vals: Seq[BigDecimal], inScale: Int, outScale: Int): String = {
      val su = vals.map(v => (v * BigDecimal(BigInt(10).pow(inScale))).toBigInt).sum
      val n = BigInt(vals.size)
      val shift = BigInt(10).pow(outScale - inScale)
      val p = BigInt(10).pow(outScale)
      val u = (BigInt(2) * su.abs * shift + n) / (BigInt(2) * n)
      val sign = if (su < 0) "-" else ""
      if (u == 0) { if (outScale <= 6) "0." + "0" * outScale else s"0E-$outScale" }
      else if (outScale > 6 && u < shift) {
        val d = u.toString
        sign + d.head + (if (d.length > 1) "." + d.tail else "") + "E-" + (outScale + 1 - d.length)
      } else sign + (u / p) + "." + (u % p).toString.reverse.padTo(outScale, '0').reverse
    }
    // the driver hashes PYTHON str() of the parquet-read decimal, which
    // follows java BigDecimal.toString's scientific rule (adjusted
    // exponent < -6 → 'd.dddE-k'; zero at scale>6 → '0E-10') — NOT
    // Spark's CAST-TO-STRING, which renders plain ('0.0000005000'); so
    // the pin collects the decimal value and renders it java-side.
    def sparkAvg(vals: Seq[String], decl: String): String =
      spark.sql(s"SELECT avg(CAST(v AS $decl)) FROM VALUES " +
        vals.map(v => s"($v)").mkString(",") + " t(v)").head().getDecimal(0).toString
    val cases: Seq[(Seq[String], Int, Int)] = Seq(
      (Seq("0.01") ++ Seq.fill(31)("0.00"), 2, 6),           // exact .5 tie → half-up
      (Seq("-0.01") ++ Seq.fill(31)("0.00"), 2, 6),          // negative tie → away from zero
      (Seq("-1.37", "-2.41", "-0.05"), 2, 6),                // plain negative mean
      (Seq.fill(3)("0.00"), 2, 6),                           // zero at scale 6 → fixed-point
      (Seq("1", "0", "0"), 2, 6),                            // repeating 1/3
      (Seq("0.000001", "0.000000"), 6, 10),                  // 5E-7 → scientific '5.000E-7'
      (Seq("0.000001") ++ Seq.fill(9)("0.000000"), 6, 10),   // 1E-7 → '1.000E-7'
      (Seq.fill(4)("0.000000"), 6, 10),                      // zero at scale 10 → '0E-10'
      (Seq("-0.000001", "0.000000"), 6, 10),                 // negative scientific
      (Seq("99999.99", "99999.97"), 2, 6))                   // widest DECIMAL(7,2) operands
    for ((vals, is, os) <- cases) {
      val decl = if (is == 2) "DECIMAL(7,2)" else "DECIMAL(12,6)"
      val got = sparkAvg(vals, decl)
      val want = emulate(vals.map(BigDecimal(_)), is, os)
      assert(got == want, s"avg($vals) as $decl: spark=$got emulated=$want")
    }
  }
}
