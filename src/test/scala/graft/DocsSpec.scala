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
}
