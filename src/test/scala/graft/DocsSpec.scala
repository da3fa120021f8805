package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift tripwire: SURVEY.md §8's coverage matrix is hand-maintained and
  * silently dropped six keys during round 10. This pins it to the code: the
  * matrix must list exactly `SparkEntry.defs.keySet`, so adding a key without
  * its matrix row (or leaving a stale row) fails the suite instead of lying
  * to the coverage audit.
  */
class DocsSpec extends AnyFunSuite {

  test("SURVEY.md §8 matrix lists exactly the implemented query keys") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val row = """(?m)^\| `([a-z0-9_]+)` \| [a-zA-Z.]+ \| duckdb-hash \|$""".r
    val matrix = row.findAllMatchIn(survey).map(_.group(1)).toSet
    val code = SparkEntry.defs.keySet
    val missing = code -- matrix
    val stale = matrix -- code
    assert(missing.isEmpty && stale.isEmpty,
      s"matrix missing=${missing.toSeq.sorted} stale=${stale.toSeq.sorted}")
  }

  test("SURVEY.md §8 header's key COUNT matches the code (prose counters " +
    "drifted for three rounds before this pin)") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val header = """(?m)^## 8\..*?(\d+) keys as of round (\d+)""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY §8 header must state '<N> keys as of round <R>'"))
    assert(header.group(1).toInt == SparkEntry.defs.size,
      s"SURVEY §8 header says ${header.group(1)} keys; code has " +
        s"${SparkEntry.defs.size} — update the header (and the round number)")
  }

  private def read(p: String): String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
    java.nio.charset.StandardCharsets.UTF_8)

  // the live counts the prose claims: test registrations and CONCRETE
  // suites (sbt's "Suites: completed N" — an abstract base like SparkSpec
  // is a file but never a suite, the round-18 verdict's 20-vs-19 drift)
  private lazy val (liveTests, liveSuites) = {
    val dir = java.nio.file.Paths.get("src/test/scala/graft")
    val files = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith("Spec.scala"))
    val tests = files.map(f =>
      """(?m)^\s*test\(""".r.findAllIn(read(f)).size).sum
    val suites = files.count(f =>
      """(?m)^class\s+\w+Spec\s+extends""".r.findFirstIn(read(f)).isDefined)
    (tests, suites)
  }

  test("SURVEY.md §8 BODY counters match the code (the round-17 verdict " +
    "caught the body saying 253 while the pinned header said 261)") {
    val survey = read("SURVEY.md")
    val body = """ALL keys are oracled \((\d+) as of round""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY §8 body must state 'ALL keys are oracled (<N> as of round'"))
    assert(body.group(1).toInt == SparkEntry.defs.size,
      s"SURVEY §8 body says ${body.group(1)} keys; code has ${SparkEntry.defs.size}")
    val t = """(\d+) ScalaTests across (\d+) suites""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY §8 must state '<N> ScalaTests across <M> suites'"))
    assert(t.group(1).toInt == liveTests && t.group(2).toInt == liveSuites,
      s"SURVEY says ${t.group(1)} tests/${t.group(2)} suites; " +
        s"live count is $liveTests/$liveSuites")
  }

  test("README.md key/test counters match the code (drifted to 'round 13' " +
    "values twice before this pin)") {
    val readme = read("README.md")
    val k = """(\d+) query keys""".r.findFirstMatchIn(readme)
      .getOrElse(fail("README must state '<N> query keys'"))
    assert(k.group(1).toInt == SparkEntry.defs.size,
      s"README says ${k.group(1)} query keys; code has ${SparkEntry.defs.size}")
    val t = """(\d+) tests across\s+(\d+) suites""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README must state '<N> tests across <M> suites'"))
    assert(t.group(1).toInt == liveTests && t.group(2).toInt == liveSuites,
      s"README says ${t.group(1)} tests/${t.group(2)} suites; " +
        s"live count is $liveTests/$liveSuites")
    assert(!"""## Architecture \(round""".r.findFirstIn(readme).isDefined,
      "README's architecture header must not carry a (stale) round stamp")
  }
}
