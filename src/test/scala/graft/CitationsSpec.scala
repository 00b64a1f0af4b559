package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Citation integrity: every artifact the main sources CITE must exist.
  *
  * Round 11 shipped scaladoc claiming "CusumTwinSpec drives one series
  * through both paths" when no such spec existed, and cited a "PLANS.md
  * round 11" sweep that was never written — documentation⇄artifact
  * drift that cost a round of audit trust. This spec turns that failure
  * mode into a red test:
  *
  *  - every `FooSpec` named anywhere in src/main (scaladoc, comments,
  *    code) must exist as a test source file, and
  *  - every "PLANS.md round N" citation must resolve to a round-N
  *    section header in PLANS.md.
  *
  * Pure filesystem checks — no SparkSession, runs in milliseconds.
  */
class CitationsSpec extends AnyFunSuite {

  private val repoRoot: Path = {
    // sbt runs tests with user.dir = the project base directory
    val cwd = Paths.get(sys.props("user.dir"))
    require(Files.exists(cwd.resolve("build.sbt")),
      s"expected to run from the sbt project root, got $cwd")
    cwd
  }

  private def scalaFiles(dir: Path): Seq[Path] = {
    val stream = Files.walk(dir)
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
    finally stream.close() // Files.walk holds directory handles open
  }

  private lazy val mainTexts: Seq[(Path, String)] =
    scalaFiles(repoRoot.resolve("src/main/scala"))
      .map(p => p -> Files.readString(p))

  test("every *Spec cited in src/main exists in the test tree") {
    val exist: Set[String] =
      scalaFiles(repoRoot.resolve("src/test/scala"))
        .map(_.getFileName.toString.stripSuffix(".scala"))
        .toSet
    // names ending in Spec that are Spark/JDK API, not our tests —
    // grows only if main code legitimately uses such a type
    val apiAllowlist = Set("WindowSpec")
    val citePattern = """\b[A-Z][A-Za-z0-9]*Spec\b""".r
    val missing = for {
      (path, text) <- mainTexts
      name <- citePattern.findAllIn(text).toSeq.distinct
      if !exist.contains(name) && !apiAllowlist.contains(name)
    } yield s"$path cites $name"
    assert(missing.isEmpty,
      s"\nphantom spec citations (write the spec or fix the name):\n  " +
        missing.mkString("\n  "))
  }

  test("every 'PLANS.md round N' citation resolves to a PLANS.md record") {
    val plans = Files.readString(repoRoot.resolve("PLANS.md"))
    // section headers look like "## Round-12 (cont.): ..." or
    // "## Round-11 (backfilled in round 12): ..."
    val recordedRounds: Set[Int] =
      """(?m)^##\s*Round.?(\d+)""".r
        .findAllMatchIn(plans).map(_.group(1).toInt).toSet
    val citePattern = """PLANS\.md round (\d+)""".r
    val unresolved = for {
      (path, text) <- mainTexts
      m <- citePattern.findAllMatchIn(text)
      n = m.group(1).toInt
      if !recordedRounds.contains(n)
    } yield s"$path cites PLANS.md round $n (recorded rounds: ${recordedRounds.toSeq.sorted.mkString(",")})"
    assert(unresolved.isEmpty,
      s"\nphantom PLANS.md citations (write the record before citing it):\n  " +
        unresolved.mkString("\n  "))
  }
}
