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

  // GRAFT_FUZZ_SEQS overrides the per-alphabet sequence count for one-off
  // deep sweeps (e.g. 200+); the committed default keeps the suite fast
  private val nSeqs = sys.env.get("GRAFT_FUZZ_SEQS").map(_.toInt).getOrElse(10)
  private val opsPerSeq = 7
  private val keyDomain = 8

  test("UNIQUE-key statement sequences match the reference model (fuzz)") {
    val rnd = new scala.util.Random(29)
    for (seqNo <- 1 to nSeqs) {
      val ddl = track(new DorisDdl(spark))
      ddl.execute(
        """CREATE TABLE fz (k BIGINT, v DOUBLE, tag VARCHAR(4))
          |UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      // static side table for the multi-table DML ops (UPDATE ... FROM /
      // DELETE ... USING): a random key->weight lookup, fixed per sequence
      val side = (0 until keyDomain)
        .map(k => k.toLong -> rnd.nextInt(50).toDouble).toMap
      ddl.execute(
        """CREATE TABLE fzs (r BIGINT, w DOUBLE)
          |UNIQUE KEY(r) DISTRIBUTED BY HASH(r) BUCKETS 2""".stripMargin)
      ddl.execute("INSERT INTO fzs VALUES " +
        side.toSeq.sortBy(_._1).map { case (r, w) => s"($r, $w)" }
          .mkString(", "))
      var model = Map.empty[Long, (Double, String)]
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]

      for (_ <- 1 to opsPerSeq) rnd.nextInt(8) match {
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
        case 6 => // multi-table UPDATE ... FROM: CDC-apply from the lookup
          val x = rnd.nextInt(50)
          val st = s"UPDATE fz SET v = fzs.w, tag = 'cdc' FROM fzs " +
            s"WHERE fz.k = fzs.r AND fzs.w >= $x"
          trace += st; ddl.execute(st)
          model = model.map { case (k, (v, t)) =>
            side.get(k).filter(_ >= x) match {
              case Some(w) => k -> ((w, "cdc"))
              case None => k -> ((v, t))
            }
          }
        case 7 => // multi-table DELETE ... USING: delete by lookup join
          val x = rnd.nextInt(50)
          val st = s"DELETE FROM fz USING fzs " +
            s"WHERE fz.k = fzs.r AND fzs.w < $x"
          trace += st; ddl.execute(st)
          model = model.filter { case (k, _) =>
            !side.get(k).exists(_ < x)
          }
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
      ddl.execute("DROP TABLE fzs")
    }
  }

  // Round-15 alphabet extension: DROP PARTITION (rejecting hole), light ADD
  // COLUMN (default backfill gated on addedVer), CTAS-with-key-model, and
  // TRUNCATE, interleaved on a PARTITIONED UNIQUE table — the statements
  // whose isolated semantics the new DdlSpec pins fix must also hold under
  // random orderings (a drop surviving a truncate, an insert straddling a
  // hole, an explicit NULL after a mid-sequence column add).
  test("partitioned sequences with DROP PARTITION / ADD COLUMN / CTAS " +
    "match the reference model (fuzz)") {
    val rnd = new scala.util.Random(31)
    val parts = Seq(("pa", 0L until 8L), ("pb", 8L until 16L),
      ("pc", 16L until 24L))
    def rangeOf(k: Long): String = parts.find(_._2.contains(k)).get._1
    for (seqNo <- 1 to math.max(12, nSeqs)) {
      val ddl = track(new DorisDdl(spark))
      ddl.execute(
        """CREATE TABLE fz2 (k BIGINT, v DOUBLE)
          |UNIQUE KEY(k)
          |PARTITION BY RANGE(k) (
          |  PARTITION pa VALUES LESS THAN ('8'),
          |  PARTITION pb VALUES LESS THAN ('16'),
          |  PARTITION pc VALUES LESS THAN ('24'))
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      // model value: (v, writtenPreAdd, explicit tag); a pre-add row reads
      // the DEFAULT 'old' once the column exists, a post-add row keeps its
      // explicit value INCLUDING an explicit NULL
      var model = Map.empty[Long, (Double, Boolean, Option[String])]
      var dropped = Set.empty[String]
      var tagAdded = false
      var vName = "v" // current name of the value column (RENAME COLUMN op)
      var vRetyped = false // heavy MODIFY ran: v reads back as BIGINT
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]

      try for (_ <- 1 to 10) rnd.nextInt(11) match {
        case 0 | 1 | 2 => // upsert load; a key in a dropped range fails ALL
          val n = 1 + rnd.nextInt(4)
          val ks = rnd.shuffle((0L until 24L).toList).take(n)
          val rows = ks.map { k =>
            val tagSpec =
              if (!tagAdded) "none"
              else if (rnd.nextInt(3) == 0) "null"
              else s"t${rnd.nextInt(3)}"
            (k, rnd.nextInt(100).toDouble, tagSpec)
          }
          val values = rows.map {
            case (k, v, "none") => s"($k, $v)"
            case (k, v, "null") => s"($k, $v, NULL)"
            case (k, v, t) => s"($k, $v, '$t')"
          }.mkString(", ")
          val cols = if (tagAdded) s"(k, $vName, tag)" else s"(k, $vName)"
          val st = s"INSERT INTO fz2 $cols VALUES $values"
          trace += st
          if (ks.exists(k => dropped.contains(rangeOf(k)))) {
            intercept[Exception](ddl.execute(st)) // hole rejects, all-or-nothing
          } else {
            ddl.execute(st)
            rows.foreach { case (k, v, tagSpec) =>
              val tag = tagSpec match {
                case "none" | "null" => None
                case t => Some(t)
              }
              model += k -> ((v, !tagAdded, tag))
            }
          }
        case 3 => // versioned DELETE
          val m = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          val st = s"DELETE FROM fz2 WHERE k % $m = $r"
          trace += st; ddl.execute(st)
          model = model.filter { case (k, _) => k % m != r }
        case 4 => // DROP PARTITION: a rejecting hole from here on
          val live = parts.map(_._1).filterNot(dropped.contains)
          if (live.nonEmpty) {
            val p = live(rnd.nextInt(live.size))
            val st = s"ALTER TABLE fz2 DROP PARTITION $p"
            trace += st; ddl.execute(st)
            dropped += p
            val range = parts.find(_._1 == p).get._2
            model = model.filter { case (k, _) => !range.contains(k) }
          }
        case 5 => // light ADD COLUMN mid-sequence (at most once)
          if (!tagAdded) {
            val st = "ALTER TABLE fz2 ADD COLUMN tag VARCHAR(4) DEFAULT 'old'"
            trace += st; ddl.execute(st)
            tagAdded = true
          }
        case 6 => // TRUNCATE: data and deletes go, schema AND holes survive
          trace += "TRUNCATE TABLE fz2"; ddl.execute("TRUNCATE TABLE fz2")
          model = Map.empty
        case 7 => // CTAS with UNIQUE KEY: snapshot must carry upsert semantics
          if (model.nonEmpty) {
            val st = "CREATE TABLE fzc UNIQUE KEY(k) " +
              s"DISTRIBUTED BY HASH(k) BUCKETS 1 AS SELECT k, $vName FROM fz2"
            trace += st; ddl.execute(st)
            ddl.execute(s"INSERT INTO fzc VALUES (${model.keys.min}, 777)")
            val got = ddl.sql(
              s"SELECT k, CAST($vName AS DOUBLE) AS v FROM fzc ORDER BY k")
              .as[(Long, Double)].collect().toSeq
            val want = (model.map { case (k, (v, _, _)) => (k, v) } +
              (model.keys.min -> 777.0)).toSeq.sortBy(_._1)
            assert(got == want,
              s"sequence $seqNo CTAS diverged\nstatements:\n  " +
                s"${trace.mkString("\n  ")}\nengine: $got\nmodel:  $want")
            ddl.execute("DROP TABLE fzc")
          }
        case 8 => // light RENAME COLUMN mid-sequence: reads/writes follow
          val next = s"v${trace.size}r"
          val st = s"ALTER TABLE fz2 RENAME COLUMN $vName $next"
          trace += st; ddl.execute(st)
          vName = next
        case 9 => // heavy MODIFY retype (rewrite job; values stay integral)
          if (!vRetyped) {
            val st = s"ALTER TABLE fz2 MODIFY COLUMN $vName BIGINT"
            trace += st; ddl.execute(st)
            vRetyped = true
          }
        case 10 => // atomic backfill swap: stage rebuilt rows, REPLACE.
          // Possibly EMPTY staging (the atomic partition wipe); the swap
          // replaces the partition's keys regardless of standing deletes
          // (a replace is a new publish), interleaving with every other op
          val live = parts.map(_._1).filterNot(dropped.contains)
          if (live.nonEmpty) {
            val p = live(rnd.nextInt(live.size))
            val range = parts.find(_._1 == p).get._2
            val spec = p match {
              case "pa" => "VALUES LESS THAN ('8')"
              case "pb" => "VALUES [('8'), ('16'))"
              case "pc" => "VALUES [('16'), ('24'))"
            }
            val tmp = s"tmp${trace.size}"
            val ks = rnd.shuffle(range.toList).take(rnd.nextInt(3))
            val rows = ks.map(k => (k, rnd.nextInt(100).toDouble))
            val sts = Seq(s"ALTER TABLE fz2 ADD TEMPORARY PARTITION $tmp $spec") ++
              (if (rows.isEmpty) Nil else {
                val cols = if (tagAdded) s"(k, $vName, tag)" else s"(k, $vName)"
                val values = rows.map { case (k, v) =>
                  if (tagAdded) s"($k, $v, 'sw')" else s"($k, $v)"
                }.mkString(", ")
                Seq(s"INSERT INTO fz2 TEMPORARY PARTITION ($tmp) $cols VALUES $values")
              }) ++
              Seq(s"ALTER TABLE fz2 REPLACE PARTITION ($p) " +
                s"WITH TEMPORARY PARTITION ($tmp)")
            sts.foreach { st => trace += st; ddl.execute(st) }
            model = model.filter { case (k, _) => !range.contains(k) }
            rows.foreach { case (k, v) =>
              model += k -> ((v, !tagAdded, if (tagAdded) Some("sw") else None))
            }
          }
      } catch { case e: Throwable if !e.isInstanceOf[org.scalatest.exceptions.TestFailedException] =>
        fail(s"sequence $seqNo threw ${e.getMessage}\nstatements:\n  " +
          trace.mkString("\n  "), e)
      }

      val exists = spark.catalog.tableExists("fz2")
      if (!tagAdded) {
        val got = if (!exists) Seq.empty
          else ddl.sql(s"SELECT k, CAST($vName AS DOUBLE) AS v FROM fz2 ORDER BY k")
            .as[(Long, Double)].collect().toSeq
        val want = model.toSeq.map { case (k, (v, _, _)) => (k, v) }.sortBy(_._1)
        assert(got == want,
          s"sequence $seqNo diverged\nstatements:\n  ${trace.mkString("\n  ")}" +
            s"\nengine: $got\nmodel:  $want")
      } else {
        val got = if (!exists) Seq.empty
          else ddl.sql(
            s"SELECT k, CAST($vName AS DOUBLE) AS v, tag FROM fz2 ORDER BY k")
            .as[(Long, Double, Option[String])].collect().toSeq
        val want = model.toSeq.map { case (k, (v, preAdd, tag)) =>
          (k, v, if (preAdd) Some("old") else tag)
        }.sortBy(_._1)
        assert(got == want,
          s"sequence $seqNo diverged\nstatements:\n  ${trace.mkString("\n  ")}" +
            s"\nengine: $got\nmodel:  $want")
      }
      ddl.execute("DROP TABLE fz2")
    }
  }

  // Round-15 second extension: LIST partitions + a GENERATED column on a
  // UNIQUE table — DROP PARTITION frees a value set (loads with it reject
  // all-or-nothing), ADD PARTITION re-covers freed values, UPDATE must
  // recompute the generated column, and the generated invariant
  // (v2 = round(v*2, 2)) must hold through every interleaving.
  test("LIST-partitioned sequences with a generated column match the " +
    "reference model (fuzz)") {
    val rnd = new scala.util.Random(37)
    val partsInit = Map("pa" -> Set("a"), "pb" -> Set("b"), "pc" -> Set("c", "d"))
    for (seqNo <- 1 to nSeqs) {
      val ddl = track(new DorisDdl(spark))
      ddl.execute(
        """CREATE TABLE fz3 (
          |  seg VARCHAR(4), k BIGINT, v DOUBLE,
          |  v2 DOUBLE AS (round(v * 2, 2))
          |) UNIQUE KEY(seg, k)
          |PARTITION BY LIST(`seg`) (
          |  PARTITION pa VALUES IN ('a'),
          |  PARTITION pb VALUES IN ('b'),
          |  PARTITION pc VALUES IN ('c', 'd'))
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      var parts = partsInit // live partition -> value set
      var nextPart = 0
      def covered: Set[String] = parts.values.flatten.toSet
      var model = Map.empty[(String, Long), Double]
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]

      try for (_ <- 1 to 10) rnd.nextInt(8) match {
        case 0 | 1 | 2 => // upsert load; any uncovered seg fails the WHOLE load
          val n = 1 + rnd.nextInt(3)
          val rows = (1 to n).map { _ =>
            (Seq("a", "b", "c", "d")(rnd.nextInt(4)),
              rnd.nextInt(4).toLong, rnd.nextInt(100).toDouble)
          }
          val values = rows.map { case (s0, k, v) => s"('$s0', $k, $v)" }
            .mkString(", ")
          val st = s"INSERT INTO fz3 (seg, k, v) VALUES $values"
          trace += st
          if (rows.exists(r => !covered.contains(r._1)))
            intercept[Exception](ddl.execute(st))
          else {
            ddl.execute(st)
            rows.foreach { case (s0, k, v) => model += (s0, k) -> v }
          }
        case 3 => // UPDATE: the generated column must recompute
          val m = 2 + rnd.nextInt(2)
          val r = rnd.nextInt(m)
          val st = s"UPDATE fz3 SET v = v + 100 WHERE k % $m = $r"
          trace += st; ddl.execute(st)
          model = model.map { case ((s0, k), v) =>
            ((s0, k), if (k % m == r) v + 100 else v)
          }
        case 4 => // versioned DELETE
          val m = 2 + rnd.nextInt(2)
          val r = rnd.nextInt(m)
          val st = s"DELETE FROM fz3 WHERE k % $m = $r"
          trace += st; ddl.execute(st)
          model = model.filter { case ((_, k), _) => k % m != r }
        case 5 => // DROP PARTITION: its values lose coverage
          if (parts.nonEmpty) {
            val p = parts.keys.toSeq.sorted.apply(rnd.nextInt(parts.size))
            val st = s"ALTER TABLE fz3 DROP PARTITION $p"
            trace += st; ddl.execute(st)
            val freed = parts(p)
            parts -= p
            model = model.filter { case ((s0, _), _) => !freed.contains(s0) }
          }
        case 6 => // ADD PARTITION re-covering one freed value
          val freed = Set("a", "b", "c", "d") -- covered
          if (freed.nonEmpty) {
            val v0 = freed.toSeq.sorted.apply(rnd.nextInt(freed.size))
            val pn = s"pn$nextPart"; nextPart += 1
            val st = s"ALTER TABLE fz3 ADD PARTITION $pn VALUES IN ('$v0')"
            trace += st; ddl.execute(st)
            parts += pn -> Set(v0)
          }
        case 7 => // TRUNCATE: data and deletes go, partitions survive
          trace += "TRUNCATE TABLE fz3"; ddl.execute("TRUNCATE TABLE fz3")
          model = Map.empty
      } catch { case e: Throwable if !e.isInstanceOf[org.scalatest.exceptions.TestFailedException] =>
        fail(s"sequence $seqNo threw ${e.getMessage}\nstatements:\n  " +
          trace.mkString("\n  "), e)
      }

      val got = if (!spark.catalog.tableExists("fz3")) Seq.empty
        else ddl.sql("SELECT seg, k, v, v2 FROM fz3 ORDER BY seg, k")
          .as[(String, Long, Double, Double)].collect().toSeq
      val want = model.toSeq.map { case ((s0, k), v) =>
        (s0, k, v, BigDecimal(v * 2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(r => (r._1, r._2))
      assert(got == want,
        s"sequence $seqNo diverged\nstatements:\n  ${trace.mkString("\n  ")}" +
          s"\nengine: $got\nmodel:  $want")
      ddl.execute("DROP TABLE fz3")
    }
  }

  test("concurrent loaders, colliding labels: each label publishes exactly " +
    "once (atomic claim), versions linearize, final state = winners' rows") {
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE clab (k BIGINT, v BIGINT, src VARCHAR(2))
        |UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    val nLabels = 10
    // both writers race the SAME label set; per label the row value
    // identifies the writer, so the surviving row names the claim winner
    def writer(w: String, tag: Long): Seq[Boolean] =
      (0 until nLabels).map { i =>
        try {
          ddl.execute(s"INSERT INTO clab WITH LABEL lab_$i " +
            s"VALUES ($i, ${i * 10 + tag}, '$w')")
          true
        } catch {
          case e: Exception
              if String.valueOf(e.getMessage).contains("already exists") =>
            false
        }
      }
    val fa = Future(writer("a", 1L))
    val fb = Future(writer("b", 2L))
    val (ra, rb) = (Await.result(fa, 5.minutes), Await.result(fb, 5.minutes))
    // the txn-label contract under interleaving: EXACTLY one writer
    // claims each label — never zero (lost label), never both (dup load)
    for (i <- 0 until nLabels)
      assert(ra(i) ^ rb(i), s"label lab_$i: writerA=${ra(i)} writerB=${rb(i)}")
    // one published load per label; versions distinct and strictly
    // increasing in publish order (the linearizable-publish contract)
    val loads = ddl.sql("SHOW LOAD FROM clab")
      .select("label", "version").as[(String, Long)].collect().toSeq
    assert(loads.map(_._1).sorted ==
      (0 until nLabels).map(i => s"lab_$i").sorted)
    assert(loads.map(_._2) == loads.map(_._2).sorted &&
      loads.map(_._2).distinct.size == nLabels, loads.toString)
    // final visible state: one row per key, and it is the claim winner's
    val rows = ddl.sql("SELECT k, v, src FROM clab ORDER BY k")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows.size == nLabels)
    rows.foreach { case (k, v, src) =>
      val wonByA = ra(k.toInt)
      assert(src == (if (wonByA) "a" else "b") &&
        v == k * 10 + (if (wonByA) 1L else 2L),
        s"key $k: got ($v, $src), winner=${if (wonByA) "a" else "b"}")
    }
    ddl.execute("DROP TABLE clab")
  }

  test("concurrent loaders, disjoint labels: every publish lands; the " +
    "final state is the full upsert union regardless of interleaving") {
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE cdis (k BIGINT, v BIGINT)
        |UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    val per = 8
    def writer(base: Int, w: String): Unit =
      (0 until per).foreach { i =>
        ddl.execute(s"INSERT INTO cdis WITH LABEL ${w}_$i " +
          s"VALUES (${base + i}, ${(base + i) * 7})")
      }
    val fa = Future(writer(0, "wa"))
    val fb = Future(writer(100, "wb"))
    Await.result(fa, 5.minutes); Await.result(fb, 5.minutes)
    val rows = ddl.sql("SELECT k, v FROM cdis ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    val want = ((0 until per).map(_.toLong) ++
      (0 until per).map(i => (100 + i).toLong)).map(k => (k, k * 7)).sorted
    assert(rows == want)
    // all 16 labels consumed, 16 distinct versions
    val loads = ddl.sql("SHOW LOAD FROM cdis")
      .select("version").as[Long].collect().toSeq
    assert(loads.size == 2 * per && loads.distinct.size == 2 * per)
    ddl.execute("DROP TABLE cdis")
  }

  // Round-18 alphabet: DDL racing DML. A writer streams INSERTs while a
  // DDL thread interleaves ADD PARTITION (forward bounds), one light ADD
  // COLUMN, and CREATE/DROP VIEW churn, and a reader polls both the table
  // and the churned view. The per-table publish lock plus per-statement
  // view re-registration must make every SUCCESS durable and every
  // FAILURE a named rejection — never a torn state, a lost row, or an
  // unexplained error.
  test("DDL racing DML: ADD PARTITION + ADD COLUMN + view churn vs " +
    "INSERT stream vs readers — successes durable, failures named (fuzz)") {
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE race (d DATE, k BIGINT, v BIGINT)
        |DUPLICATE KEY(d, k)
        |PARTITION BY RANGE(d) (
        |  PARTITION p1 VALUES LESS THAN ('2024-02-01'))
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    val nRows = 24
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def named(e: Throwable): Boolean = {
      val m = String.valueOf(e.getMessage)
      m.contains("not found") || m.contains("NOT_FOUND") ||
        m.contains("references invalid table") ||
        m.contains("unknown view") || m.contains("already exists") ||
        // the fail-closed refusal is a NAMED transient outcome while a
        // stale registration awaits its epoch-loop retraction — never a
        // silent read of dropped data (r20; the audit still pins that no
        // orphan SURVIVES at quiesce)
        m.contains("orphaned engine view")
    }
    val writer = Future {
      (0 until nRows).foreach { i =>
        // always inside p1's range: the INSERT itself must never fail,
        // whatever the DDL thread is doing
        try ddl.execute(
          s"INSERT INTO race (d, k, v) VALUES ('2024-01-${i % 28 + 1}', $i, ${i * 3})")
        catch { case e: Throwable =>
          unexpected.add(s"writer($i): $e")
        }
      }
    }
    val ddlThread = Future {
      (2 to 7).foreach { j =>
        try {
          ddl.execute(s"ALTER TABLE race ADD PARTITION p$j " +
            s"VALUES LESS THAN ('2024-0$j-15')")
          if (j == 4)
            ddl.execute("ALTER TABLE race ADD COLUMN w BIGINT DEFAULT '7'")
          ddl.execute("CREATE VIEW race_v AS SELECT k, v FROM race WHERE k >= 0")
          Thread.sleep(5)
          ddl.execute("DROP VIEW race_v")
        } catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"ddl($j): $e")
        }
      }
    }
    val reader = Future {
      (0 until 12).foreach { _ =>
        // the base table must ALWAYS read; the churned view may be absent
        // (named not-found) but must never poison the statement path
        try ddl.sql("SELECT count(*) AS n FROM race").head()
        catch { case e: Throwable => unexpected.add(s"reader(base): $e") }
        try ddl.sql("SELECT count(*) AS n FROM race_v").head()
        catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"reader(view): $e")
        }
        Thread.sleep(3)
      }
    }
    Await.result(writer, 5.minutes)
    Await.result(ddlThread, 5.minutes)
    Await.result(reader, 5.minutes)
    assert(unexpected.isEmpty,
      s"unexpected failures:\n  ${unexpected.toArray.mkString("\n  ")}")
    // every successful insert is durable and exact
    val rows = ddl.sql("SELECT k, v FROM race ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    assert(rows == (0 until nRows).map(i => (i.toLong, i * 3L)))
    // the light ADD COLUMN surfaced with its default everywhere
    val ws = ddl.sql("SELECT DISTINCT w FROM race").as[Long].collect().toSeq
    assert(ws == Seq(7L), ws.toString)
    // all 6 added partitions landed alongside the original
    assert(ddl.sql("SHOW PARTITIONS FROM race").count() == 7L)
    ddl.execute("DROP TABLE race")
  }

  // Round-17 alphabet: the privilege layer fuzzed against a reference ACL
  // model — random grant/revoke (per-object and *), random statements
  // attempted as random users, and SHOW GRANTS listings, each checked
  // against the model's allow/deny verdict. The property under test is
  // that enforcement is EXACTLY the granted set: no op a grant should
  // admit is denied, and no op a revoke should deny is admitted, under
  // any interleaving.
  test("privilege grant/revoke/attempt sequences match a reference ACL " +
    "model (fuzz)") {
    val rnd = new scala.util.Random(41)
    val privs = Vector("SELECT_PRIV", "LOAD_PRIV", "ALTER_PRIV", "DROP_PRIV")
    val who = Vector("u1", "u2")
    for (seqNo <- 1 to 25) {
      val ddl = track(new DorisDdl(spark))
      ddl.execute(
        """CREATE TABLE az (k BIGINT, v DOUBLE)
          |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
      ddl.execute("INSERT INTO az VALUES (1, 1.0)")
      who.foreach(u => ddl.execute(s"CREATE USER '$u'"))
      ddl.execute("CREATE ROLE 'fz'")
      var acl = Set.empty[(String, String, String)] // (user, scope, priv)
      var roleAcl = Set.empty[(String, String)] // (scope, priv) on role fz
      var members = Set.empty[String] // users holding fz
      def allowed(u: String, p: String) =
        acl.contains((u, "*", p)) || acl.contains((u, "az", p)) ||
          (members(u) && (roleAcl(("*", p)) || roleAcl(("az", p))))
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]
      for (_ <- 1 to 40) rnd.nextInt(6) match {
        case 0 => // grant (root)
          val (u, p) = (who(rnd.nextInt(2)), privs(rnd.nextInt(4)))
          val scope = if (rnd.nextBoolean()) "az" else "*"
          val st = s"GRANT $p ON $scope TO '$u'"
          trace += st; ddl.execute(st)
          acl += ((u, scope, p))
        case 1 => // revoke (root) — revoking an absent priv is a no-op
          val (u, p) = (who(rnd.nextInt(2)), privs(rnd.nextInt(4)))
          val scope = if (rnd.nextBoolean()) "az" else "*"
          val st = s"REVOKE $p ON $scope FROM '$u'"
          trace += st; ddl.execute(st)
          acl -= ((u, scope, p))
        case 2 => // attempt an op as a random user; model decides the verdict
          val u = who(rnd.nextInt(2))
          val (st, need) = rnd.nextInt(3) match {
            case 0 => ("SELECT k FROM az ORDER BY k", "SELECT_PRIV")
            case 1 => (s"INSERT INTO az VALUES (${rnd.nextInt(9)}, 2.0)",
              "LOAD_PRIV")
            case 2 => ("DELETE FROM az WHERE k = 999", "LOAD_PRIV")
          }
          val want = allowed(u, need)
          trace += s"[$u] $st (expect ${if (want) "allow" else "deny"})"
          ddl.login(u)
          val got =
            try { ddl.execute(st); true }
            catch {
              case e: RuntimeException
                if e.getMessage != null &&
                  e.getMessage.startsWith("access denied") => false
            }
          ddl.login("root")
          assert(got == want,
            s"seq $seqNo: enforcement diverged from the ACL model\n  " +
              trace.mkString("\n  "))
        case 3 => // SHOW GRANTS must equal the model's rows for that user
          val u = who(rnd.nextInt(2))
          trace += s"SHOW GRANTS FOR '$u'"
          val got = ddl.sql(s"SHOW GRANTS FOR '$u'").collect()
            .flatMap(r => r.getString(2).split(",")
              .map(p => (r.getString(1), p))).toSet
          val want = acl.collect { case (`u`, scope, p) => (scope, p) }
          assert(got == want,
            s"seq $seqNo: SHOW GRANTS diverged\n  ${trace.mkString("\n  ")}" +
              s"\n  got=$got want=$want")
        case 4 => // role grant/revoke (root): privileges land on the ROLE
          val p = privs(rnd.nextInt(4))
          val scope = if (rnd.nextBoolean()) "az" else "*"
          if (rnd.nextBoolean()) {
            val st = s"GRANT $p ON $scope TO ROLE 'fz'"
            trace += st; ddl.execute(st)
            roleAcl += ((scope, p))
          } else {
            val st = s"REVOKE $p ON $scope FROM ROLE 'fz'"
            trace += st; ddl.execute(st)
            roleAcl -= ((scope, p))
          }
        case 5 => // role membership toggle
          val u = who(rnd.nextInt(2))
          if (rnd.nextBoolean()) {
            val st = s"GRANT 'fz' TO '$u'"
            trace += st; ddl.execute(st)
            members += u
          } else {
            val st = s"REVOKE 'fz' FROM '$u'"
            trace += st; ddl.execute(st)
            members -= u
          }
      }
      ddl.execute("DROP TABLE az")
    }
  }

  // ---- r20: the r19 judge-found orphan-view class, pinned shut ---------

  /** The EXACT interleaving that aborted the r19 suite — DROP VIEW racing
    * a load's refreshUserViews re-registration — hammered for 200+ rounds
    * against concurrent loads and readers. Property: at quiesce the
    * catalog holds NO scope-less engine view (the epoch-checked,
    * drop-aware refresh retracts every stale registration), and the only
    * reader-visible failure modes are NAMED (not-found / fail-closed
    * refusal), never a silent read of dropped-view data. */
  test("view churn x concurrent loads never orphans a temp view " +
    "(220 rounds)") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE churn (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k)
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    ddl.execute("INSERT INTO churn VALUES (1, 10)")
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def named(e: Throwable): Boolean = {
      val m = String.valueOf(e.getMessage)
      m.contains("not found") || m.contains("NOT_FOUND") ||
        m.contains("unknown view") || m.contains("already exists") ||
        m.contains("references invalid table") ||
        m.contains("orphaned engine view")
    }
    val rounds = 220
    val churner = Future {
      (0 until rounds).foreach { i =>
        try {
          ddl.execute(
            "CREATE VIEW churn_v AS SELECT k, v FROM churn WHERE k >= 0")
          if (i % 7 == 0) Thread.sleep(1)
          ddl.execute("DROP VIEW churn_v")
        } catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"churn($i): $e")
        }
      }
    }
    val loader = Future {
      (2 until 40).foreach { i =>
        try ddl.execute(s"INSERT INTO churn VALUES ($i, ${i * 10})")
        catch { case e: Throwable => unexpected.add(s"load($i): $e") }
      }
    }
    val reader = Future {
      (0 until 60).foreach { _ =>
        try ddl.sql("SELECT count(*) AS n FROM churn_v").head()
        catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"read: $e")
        }
        Thread.sleep(2)
      }
    }
    Await.result(churner, 10.minutes)
    Await.result(loader, 10.minutes)
    Await.result(reader, 10.minutes)
    assert(unexpected.isEmpty,
      s"unexpected failures:\n  ${unexpected.toArray.mkString("\n  ")}")
    // quiesce: every execute() (and the refresh inside it) has returned,
    // so no registration is in flight — the namespace must audit clean.
    // This is the assertion whose afterAll twin ABORTED the r19 suite.
    assert(ddl.auditTempViews().isEmpty, ddl.auditTempViews().toString)
    assert(!spark.catalog.tableExists("churn_v"),
      "churned view must not survive its final DROP")
    // durability of every concurrent load, exact
    assert(ddl.sql("SELECT count(*) AS n FROM churn").as[Long].head() == 39L)
    ddl.execute("DROP TABLE churn")
  }

  /** Fail-CLOSED pin: a manufactured orphan (the r19 shape — live engine
    * temp view, no catalog def, no grant scope) refuses every reading
    * statement BY NAME, root included; DROP VIEW retracts it and CREATE
    * VIEW re-scopes (heals) it — the two sanctioned remediations. */
  test("a manufactured orphan engine view fails closed even for root; " +
    "DROP VIEW retracts, CREATE VIEW heals") {
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE ophbase (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k)
        |DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO ophbase VALUES (1, 2)")
    ddl.injectOrphanViewForTest("oph_v")
    assert(ddl.auditTempViews() == Seq("oph_v"))
    // the live read path refuses (currentUser is root — integrity, not
    // privilege), with the orphan named in the message
    val e = intercept[RuntimeException](ddl.sql("SELECT * FROM oph_v"))
    assert(e.getMessage.contains("orphaned engine view"), e.getMessage)
    assert(e.getMessage.contains("oph_v"), e.getMessage)
    // a WRITING statement that names the orphan as a source refuses too
    val e2 = intercept[RuntimeException](
      ddl.execute("INSERT INTO ophbase SELECT k, v FROM oph_v"))
    assert(e2.getMessage.contains("orphaned engine view"), e2.getMessage)
    // base-table statements that do NOT name it still work
    assert(ddl.sql("SELECT count(*) AS n FROM ophbase")
      .as[Long].head() == 1L)
    // remediation 1: DROP VIEW retracts the scope-less temp view
    ddl.execute("DROP VIEW oph_v")
    assert(!spark.catalog.tableExists("oph_v"))
    assert(ddl.auditTempViews().isEmpty)
    // remediation 2: CREATE VIEW over a second orphan re-scopes it
    ddl.injectOrphanViewForTest("oph_w")
    ddl.execute("CREATE VIEW oph_w AS SELECT k FROM ophbase")
    assert(ddl.auditTempViews().isEmpty)
    assert(ddl.sql("SELECT k FROM oph_w").as[Long].head() == 1L)
    ddl.execute("DROP VIEW oph_w")
    ddl.execute("DROP TABLE ophbase")
  }

  /** The same registration-window race generalized to the OTHER derived
    * views (VERDICT r19 task 3): MTMV create/refresh/drop churn and
    * partition add/drop churn against concurrent base loads — the
    * drop-aware re-checks in registerViews/registerMtmvView must leave
    * zero scope-less views at quiesce. */
  test("MTMV and partition churn x concurrent loads never orphans " +
    "derived views") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ddl = track(new DorisDdl(spark))
    ddl.execute(
      """CREATE TABLE mchurn (d DATE, k BIGINT, v BIGINT)
        |DUPLICATE KEY(d, k)
        |PARTITION BY RANGE(d) (
        |  PARTITION p1 VALUES LESS THAN ('2024-02-01'))
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    ddl.execute("INSERT INTO mchurn VALUES ('2024-01-05', 1, 10)")
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def named(e: Throwable): Boolean = {
      val m = String.valueOf(e.getMessage)
      m.contains("not found") || m.contains("NOT_FOUND") ||
        m.contains("unknown") || m.contains("already exists") ||
        m.contains("references invalid table") ||
        m.contains("orphaned engine view")
    }
    val mtmvChurn = Future {
      (0 until 25).foreach { i =>
        try {
          // ON COMMIT: every concurrent load's publish refreshes (and
          // re-registers) this MTMV — the registration the churner's
          // DROP races, exactly the user-view race shape
          ddl.execute(
            """CREATE MATERIALIZED VIEW mchurn_mv
              |BUILD IMMEDIATE REFRESH AUTO ON COMMIT
              |PARTITION BY (d)
              |AS SELECT d, COUNT(*) AS n FROM mchurn GROUP BY d"""
              .stripMargin)
          if (i % 4 == 0)
            ddl.sql("REFRESH MATERIALIZED VIEW mchurn_mv").head()
          Thread.sleep(1)
          ddl.execute("DROP MATERIALIZED VIEW mchurn_mv")
        } catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"mtmv($i): $e")
        }
      }
    }
    val partChurn = Future {
      (2 until 14).foreach { j =>
        try {
          ddl.execute(f"ALTER TABLE mchurn ADD PARTITION tp$j " +
            f"VALUES LESS THAN ('2024-02-$j%02d')")
          Thread.sleep(1)
          ddl.execute(s"ALTER TABLE mchurn DROP PARTITION tp$j")
        } catch { case e: Throwable =>
          if (!named(e)) unexpected.add(s"part($j): $e")
        }
      }
    }
    val loader = Future {
      (2 until 20).foreach { i =>
        try ddl.execute(
          s"INSERT INTO mchurn VALUES ('2024-01-${i % 28 + 1}', $i, $i)")
        catch { case e: Throwable => unexpected.add(s"load($i): $e") }
      }
    }
    Await.result(mtmvChurn, 10.minutes)
    Await.result(partChurn, 10.minutes)
    Await.result(loader, 10.minutes)
    assert(unexpected.isEmpty,
      s"unexpected failures:\n  ${unexpected.toArray.mkString("\n  ")}")
    assert(ddl.auditTempViews().isEmpty, ddl.auditTempViews().toString)
    assert(!spark.catalog.tableExists("mchurn_mv"),
      "churned MTMV must not survive its final DROP")
    assert(ddl.sql("SELECT count(*) AS n FROM mchurn").as[Long].head() == 19L)
    ddl.execute("DROP TABLE mchurn")
  }
}
