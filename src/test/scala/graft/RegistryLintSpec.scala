package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Source-level registry lint (round-11 lesson, deferred item #3).
  *
  * `Queries.all` throws at init on a CROSS-module name collision, but a
  * duplicate key WITHIN one module's `Map(...)` literal is unreachable at
  * runtime: Scala's Map constructor dedups before `.size` is observable,
  * so the earlier entry silently vanishes and the corpus shrinks by one
  * with zero signal. Catch that class at the source level: within any one
  * coverage file, a quoted query name must be bound (`"name" ->`) at most
  * once. (SparkEntry needs no lint: it derives `queries`/`oracleSql`
  * programmatically from the guarded registry.)
  */
class RegistryLintSpec extends AnyFunSuite {

  // Any line-leading quoted identifier bound with `->` — registry entries
  // (and the view-template Seqs) are written one binding per line, while
  // non-registry pair syntax (`.renameColumns("a" -> "b")`, oracle patch
  // pairs) is mid-line or contains spaces. The r12 `q[a-z0-9_]+` shape
  // silently exempted any future binding not starting with 'q' (ADVICE
  // r12): anchor on line position instead of the name's first letter.
  private val Key = """(?m)^\s*"([A-Za-z][A-Za-z0-9_]*)"\s*->""".r

  private def bindings(path: java.nio.file.Path): Seq[String] =
    Key.findAllMatchIn(Files.readString(path)).map(_.group(1)).toSeq

  test("no coverage module binds the same query name twice in one file") {
    val dir = Paths.get("src/main/scala/graft/coverage")
    val offenders = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val dups = bindings(p).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => s"$k (×${vs.size})"
        }
        if (dups.isEmpty) None else Some(s"${p.getFileName}: ${dups.mkString(", ")}")
      }.toList
    assert(offenders.isEmpty,
      s"duplicate query-name bindings within a module (Map dedups them SILENTLY):\n  " +
        offenders.mkString("\n  "))
  }

  test("no unannotated coalesce(1) write funnels (VERDICT r14 #2)") {
    // A `.coalesce(1).write` on an sf-scaled staging path serializes the
    // whole table through ONE task (q_cdc_metadata's 11.1x sf1 ratio was
    // exactly this). Staging writes are partition-parallel by default;
    // the rare legitimate single-file sites (one-file-per-trigger-batch
    // stream staging) must say so with a `single-file:` comment within
    // the 4 lines above the call.
    val root = Paths.get("src/main/scala/graft")
    val offenders = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = Files.readString(p).linesIterator.toVector
        lines.zipWithIndex.collect {
          case (l, i) if l.contains(".coalesce(1).write") &&
            !lines.slice(math.max(0, i - 4), i + 1).exists(_.contains("single-file:")) =>
            s"${root.relativize(p)}:${i + 1}"
        }
      }.toList
    assert(offenders.isEmpty,
      s"unannotated coalesce(1) write funnel (single-task serialization at scale):\n  " +
        offenders.mkString("\n  "))
  }

  test("repo leakcheck tool reports zero hits (VERDICT r14 #4: stays aligned with the driver)") {
    // Spark-bundled public deps (jackson, commons-*) are allowlisted in
    // the tool; anything else TLD-rooted still flags. Output goes to /tmp
    // so the test never clobbers the driver's LEAKCHECK.json artifact.
    import scala.sys.process._
    val outBuf = new StringBuilder
    val rc = Process(Seq("python3", "tools/leakcheck.py", ".",
      s"${System.getProperty("java.io.tmpdir")}/leakcheck_test.json"))
      .!(ProcessLogger(l => outBuf.append(l).append('\n')))
    assert(rc == 0, s"tools/leakcheck.py found hits — adjudicate or allowlist:\n$outBuf")
  }

  test("the lint's own extraction sees the registry (sanity floor)") {
    // If the regex or paths rot, the scans above would pass vacuously —
    // pin that the coverage scan sees at least as many bindings as the
    // runtime registry has entries.
    val dir = Paths.get("src/main/scala/graft/coverage")
    val n = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).map(bindings(_).size).sum
    assert(n >= Queries.all.size,
      s"coverage-source scan found $n bindings < ${Queries.all.size} registry entries")
  }
}
