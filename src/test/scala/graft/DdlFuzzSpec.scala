package graft

import graft.sql.DorisDdl

/** Statement-sequence fuzz of the DDL front-end (SURVEY §3.1): random
  * INSERT / UPDATE / DELETE / INSERT OVERWRITE / TRUNCATE sequences —
  * issued as SQL TEXT ONLY — against an in-memory reference model of the
  * documented UNIQUE-key semantics. The fixed DdlSpec shapes pin each
  * statement in isolation; this reaches the INTERACTIONS (an UPDATE whose
  * predicate reads a column a prior UPDATE rewrote, a DELETE whose keys a
  * later load revives, an OVERWRITE that must clear standing delete
  * predicates, a TRUNCATE mid-sequence whose dropped view a reload
  * recreates). Seeded like KeyModelsSpec's merge-rule fuzz — deterministic
  * run-to-run.
  */
class DdlFuzzSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val nSeqs = 10
  private val opsPerSeq = 7
  private val keyDomain = 8

  test("UNIQUE-key statement sequences match the reference model (fuzz)") {
    val rnd = new scala.util.Random(29)
    for (seqNo <- 1 to nSeqs) {
      val ddl = new DorisDdl(spark)
      ddl.execute(
        """CREATE TABLE fz (k BIGINT, v DOUBLE, tag VARCHAR(4))
          |UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      var model = Map.empty[Long, (Double, String)]
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]

      for (_ <- 1 to opsPerSeq) rnd.nextInt(6) match {
        case 0 | 1 => // upsert load: last write per key wins
          val n = 1 + rnd.nextInt(4)
          val ks = rnd.shuffle((0 until keyDomain).toList).take(n)
          val rows = ks.map(k =>
            (k.toLong, rnd.nextInt(100).toDouble, s"t${rnd.nextInt(3)}"))
          val values = rows
            .map { case (k, v, t) => s"($k, $v, '$t')" }.mkString(", ")
          val st = s"INSERT INTO fz VALUES $values"
          trace += st; ddl.execute(st)
          rows.foreach { case (k, v, t) => model += k -> ((v, t)) }
        case 2 => // UPDATE over the current visible state
          val m = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          val st = s"UPDATE fz SET v = v + 100, tag = 'up' WHERE k % $m = $r"
          trace += st; ddl.execute(st)
          model = model.map { case (k, (v, t)) =>
            if (k % m == r) k -> ((v + 100, "up")) else k -> ((v, t))
          }
        case 3 => // versioned DELETE: later loads must survive it
          val m = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          val st = s"DELETE FROM fz WHERE k % $m = $r"
          trace += st; ddl.execute(st)
          model = model.filter { case (k, _) => k % m != r }
        case 4 => // TRUNCATE: schema survives, data and deletes do not
          trace += "TRUNCATE TABLE fz"; ddl.execute("TRUNCATE TABLE fz")
          model = Map.empty
        case 5 => // full INSERT OVERWRITE: replaces data, clears deletes
          val k = rnd.nextInt(keyDomain)
          val st = s"INSERT OVERWRITE TABLE fz SELECT $k, 7.0, 'ow'"
          trace += st; ddl.execute(st)
          model = Map(k.toLong -> ((7.0, "ow")))
      }

      val got =
        if (!spark.catalog.tableExists("fz")) Seq.empty // truncated, no reload
        else ddl.sql("SELECT k, v, tag FROM fz ORDER BY k")
          .as[(Long, Double, String)].collect().toSeq
      val want = model.toSeq.map { case (k, (v, t)) => (k, v, t) }.sortBy(_._1)
      assert(got == want,
        s"sequence $seqNo diverged\nstatements:\n  ${trace.mkString("\n  ")}" +
          s"\nengine: $got\nmodel:  $want")
      // leave no temp views behind for the next sequence
      ddl.execute("DROP TABLE fz")
    }
  }
}
