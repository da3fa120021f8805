package graft

import graft.sql.DorisDdl

/** Cross-feature adversarial probes (round 18): each test composes
  * features whose implementations never meet in their own suites —
  * exactly the seams where round 17 found the view-poisoning bug. Probes
  * that exposed nothing stay as pins; any that broke something document
  * the fix they forced.
  */
class CrossFeatureSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def fresh() = track(new DorisDdl(spark))

  test("BACKUP/RESTORE × temporary partitions × NGRAM_BF × versioned " +
    "deletes: the snapshot excludes staging, keeps delete records and the " +
    "index DDL, and the restored index prunes again via lazy repair") {
    val ddl = fresh()
    val bdir = graft.TempDirs.create("graft_xf_backup")
    ddl.execute(
      """CREATE TABLE xb (d DATE, k BIGINT, body VARCHAR(80),
        |  INDEX xb_ng (body) USING NGRAM_BF
        |    PROPERTIES("gram_size" = "3", "bf_size" = "65536")
        |) DUPLICATE KEY(d, k)
        |PARTITION BY RANGE(d) (
        |  PARTITION pa VALUES LESS THAN ('2024-02-01'),
        |  PARTITION pb VALUES LESS THAN (MAXVALUE))
        |DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xb VALUES ('2024-01-10', 1, 'alpha beta'), " +
      "('2024-01-11', 2, 'gamma delta'), ('2024-02-10', 3, 'xylophone song')")
    ddl.execute("DELETE FROM xb WHERE k = 2")
    // staged-but-unpublished temp partition: must NOT enter the snapshot
    ddl.execute("ALTER TABLE xb ADD TEMPORARY PARTITION tpa " +
      "VALUES LESS THAN ('2024-02-01')")
    ddl.execute("INSERT INTO xb TEMPORARY PARTITION (tpa) " +
      "VALUES ('2024-01-20', 9, 'staged ghost')")
    val visibleAtBackup = ddl.sql("SELECT k, body FROM xb ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(visibleAtBackup.map(_._1) == Seq(1L, 3L)) // delete applied
    ddl.sql(s"BACKUP SNAPSHOT xs TO '$bdir' ON (xb)").collect()
    // post-backup mutations must not leak into the restore
    ddl.execute("INSERT INTO xb VALUES ('2024-02-11', 4, 'later row')")
    ddl.execute("DROP TABLE xb")
    ddl.sql(s"RESTORE SNAPSHOT xs FROM '$bdir'").collect()
    assert(ddl.sql("SELECT k, body FROM xb ORDER BY k")
      .as[(Long, String)].collect().toSeq == visibleAtBackup,
      "restore must read EXACTLY the visible state at backup time")
    // the staging rowset died with the drop: no temp partitions, and the
    // staged row never surfaces
    assert(ddl.sql("SHOW TEMPORARY PARTITIONS FROM xb").count() == 0L)
    // the index DDL round-tripped through the snapshot's create text...
    assert(ddl.sql("SHOW INDEX FROM xb").as[(String, String, String)]
      .collect().toSeq.contains(("xb_ng", "body", "NGRAM_BF")))
    // ...and the restored files (fresh paths, no sidecars) heal lazily:
    // the first indexed query rebuilds the blooms and PRUNES
    val df = ddl.sql("SELECT k FROM xb WHERE body LIKE '%xylophone%'")
    assert(df.as[Long].collect().toSeq == Seq(3L))
    val Some((_, surv, total)) = ddl.lastNgramPrune
    assert(surv < total, s"($surv, $total): restored sidecars must prune")
    // a delete recorded before the backup is STRUCTURAL in the snapshot:
    // a post-restore partition rename still amends it by name
    ddl.execute("ALTER TABLE xb RENAME PARTITION pa paz")
    assert(ddl.sql("SELECT k FROM xb ORDER BY k").as[Long].collect()
      .toSeq == Seq(1L, 3L), "renamed partition keeps honoring the delete")
  }

  test("routine load × light schema change: ADD COLUMN mid-stream — " +
    "old-schema files keep loading, the new column backfills its default " +
    "for them, and the job survives") {
    val ddl = fresh()
    val rdir = graft.TempDirs.create("graft_xf_routine")
    spark.range(2).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.mode("append").parquet(rdir)
    ddl.execute(
      """CREATE TABLE xr (k BIGINT, v DOUBLE) UNIQUE KEY(k)
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    ddl.execute(s"CREATE ROUTINE LOAD xj ON xr FROM FILE('$rdir', 'parquet')")
    assert(ddl.sql("SELECT count(*) AS n FROM xr").as[Long].head() == 2L)
    // light ADD COLUMN while the job is RUNNING
    ddl.execute("ALTER TABLE xr ADD COLUMN w BIGINT DEFAULT '5'")
    // a new OLD-SHAPE file arrives after the schema change
    spark.range(2, 4).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.mode("append").parquet(rdir)
    ddl.drainRoutineLoad("xj")
    val rows = ddl.sql("SELECT k, v, w FROM xr ORDER BY k")
      .as[(Long, Double, Long)].collect().toSeq
    assert(rows == (0 until 4).map(i => (i.toLong, i.toDouble, 5L)),
      s"old-schema stream rows must surface the column default: $rows")
    val st = ddl.sql("SHOW ROUTINE LOAD").collect().head
    assert(st.getString(0) == "xj" && st.getString(2) == "RUNNING", st)
    ddl.execute("STOP ROUTINE LOAD FOR xj")
    ddl.execute("DROP TABLE xr")
  }

  test("MTMV × RENAME PARTITION: the rename surfaces as drop+stale on the " +
    "next refresh — the MV recomputes the renamed slice once and its rows " +
    "are unchanged") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE xm (d DATE, k BIGINT, v DOUBLE)
        |DUPLICATE KEY(d, k)
        |PARTITION BY RANGE(d) (
        |  PARTITION pa VALUES LESS THAN ('2024-02-01'),
        |  PARTITION pb VALUES LESS THAN (MAXVALUE))
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    ddl.execute("INSERT INTO xm VALUES ('2024-01-10', 1, 1.0), " +
      "('2024-01-11', 2, 2.0), ('2024-02-10', 3, 3.0)")
    ddl.execute(
      """CREATE MATERIALIZED VIEW xm_mv
        |BUILD IMMEDIATE REFRESH AUTO ON MANUAL
        |PARTITION BY (d)
        |AS SELECT d, COUNT(*) AS n, SUM(v) AS sv FROM xm GROUP BY d""".stripMargin)
    val before = ddl.sql("SELECT d, n, sv FROM xm_mv ORDER BY d").collect()
      .map(_.toString).toSeq
    ddl.execute("ALTER TABLE xm RENAME PARTITION pa paz")
    // the refresh sees pa vanish and paz appear: one stale slice
    val r = ddl.sql("REFRESH MATERIALIZED VIEW xm_mv")
      .as[(String, Long)].head()
    assert(r._2 == 1L, s"rename must cost exactly one slice recompute: $r")
    assert(ddl.sql("SELECT d, n, sv FROM xm_mv ORDER BY d").collect()
      .map(_.toString).toSeq == before,
      "a pure rename must not change the MV's rows")
    // and a second refresh is a no-op
    assert(ddl.sql("REFRESH MATERIALIZED VIEW xm_mv")
      .as[(String, Long)].head()._2 == 0L)
  }

  test("indexes × RENAME COLUMN: INVERTED and NGRAM_BF indexes (and " +
    "bloom_filter_columns) FOLLOW the renamed column — MATCH stays legal, " +
    "pruning resumes under the new name, SHOW CREATE replays") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE xrn (id BIGINT, body VARCHAR(80), note VARCHAR(40),
        |  INDEX ix_inv (note) USING INVERTED,
        |  INDEX ix_ng (body) USING NGRAM_BF
        |    PROPERTIES("gram_size" = "3", "bf_size" = "65536")
        |) DUPLICATE KEY(id) DISTRIBUTED BY HASH(id) BUCKETS 2
        |PROPERTIES("bloom_filter_columns" = "note")""".stripMargin)
    ddl.execute("INSERT INTO xrn VALUES (1, 'alpha beta', 'red fox'), " +
      "(2, 'gamma delta', 'blue owl')")
    ddl.execute("INSERT INTO xrn VALUES (3, 'xylophone here', 'red hen')")
    // sanity under the ORIGINAL names
    assert(ddl.sql("SELECT id FROM xrn WHERE note MATCH_ANY 'red'")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    ddl.lastNgramPrune = None
    assert(ddl.sql("SELECT id FROM xrn WHERE body LIKE '%xylophone%'")
      .as[Long].collect().toSeq == Seq(3L))
    assert(ddl.lastNgramPrune.exists(p => p._2 < p._3))
    // rename BOTH indexed columns
    ddl.execute("ALTER TABLE xrn RENAME COLUMN body content")
    ddl.execute("ALTER TABLE xrn RENAME COLUMN note tag")
    // the INVERTED index follows: MATCH on the NEW name stays legal
    assert(ddl.sql("SELECT id FROM xrn WHERE tag MATCH_ANY 'red'")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the NGRAM index follows: pruning fires under the new name (sidecars
    // rebuild once under the renamed dir, reading through the priors)
    ddl.lastNgramPrune = None
    val df = ddl.sql("SELECT id FROM xrn WHERE content LIKE '%xylophone%'")
    assert(df.as[Long].collect().toSeq == Seq(3L))
    assert(ddl.lastNgramPrune.exists(p => p._2 < p._3),
      s"pruning must resume under the renamed column: ${ddl.lastNgramPrune}")
    // SHOW CREATE names the NEW columns everywhere and replays
    val stmt = ddl.sql("SHOW CREATE TABLE xrn").head.getString(1)
    assert(stmt.contains("(`content`) USING NGRAM_BF") &&
      stmt.contains("(`tag`) USING INVERTED") &&
      stmt.contains("\"bloom_filter_columns\" = \"tag\"") &&
      !"""\bbody\b""".r.findFirstIn(stmt).isDefined &&
      !"""\bnote\b""".r.findFirstIn(stmt).isDefined, stmt)
    ddl.execute(stmt.replace("`xrn`", "`xrn2`"))
    // and a MATCH on the old name now rejects (the column is gone)
    assertThrows[Exception](
      ddl.sql("SELECT id FROM xrn WHERE note MATCH_ANY 'red'").collect())
  }

  test("versioned deletes × RENAME COLUMN: standing delete predicates " +
    "amend structurally to the new name — reads never poison, the delete " +
    "keeps applying, post-delete loads survive") {
    val ddl = fresh()
    // case 1: the usual shape — old rowsets carry the old-name bytes
    ddl.execute(
      """CREATE TABLE xdr (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xdr VALUES (1, 10), (2, 20), (3, 30)")
    ddl.execute("DELETE FROM xdr WHERE v = 20")
    ddl.execute("ALTER TABLE xdr RENAME COLUMN v w")
    assert(ddl.sql("SELECT k FROM xdr ORDER BY k").as[Long].collect()
      .toSeq == Seq(1L, 3L), "the delete must keep applying post-rename")
    ddl.execute("INSERT INTO xdr VALUES (4, 20)")
    assert(ddl.sql("SELECT k FROM xdr ORDER BY k").as[Long].collect()
      .toSeq == Seq(1L, 3L, 4L), "post-delete loads survive, as versioned")
    // case 2: the poisoning shape — the delete was recorded while NO
    // rowset carried the old name, so nothing in the mergeSchema union
    // could resolve it after the rename (every read errored before the
    // structural amendment)
    ddl.execute(
      """CREATE TABLE xdr2 (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("DELETE FROM xdr2 WHERE v = 20")
    ddl.execute("ALTER TABLE xdr2 RENAME COLUMN v w")
    ddl.execute("INSERT INTO xdr2 VALUES (1, 20), (2, 30)")
    assert(ddl.sql("SELECT k FROM xdr2 ORDER BY k").as[Long].collect()
      .toSeq == Seq(1L, 2L))
    // a literal containing the old name is never rewritten
    ddl.execute(
      """CREATE TABLE xdr3 (k BIGINT, v BIGINT, s VARCHAR(8))
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xdr3 VALUES (1, 1, 'v'), (2, 2, 'x')")
    ddl.execute("DELETE FROM xdr3 WHERE s = 'v'")
    ddl.execute("ALTER TABLE xdr3 RENAME COLUMN v vv")
    assert(ddl.sql("SELECT k FROM xdr3").as[Long].collect().toSeq == Seq(2L))
  }

  test("DROP COLUMN × indexes/bloom/deletes: the column's indexes and " +
    "bloom declaration die with it (SHOW CREATE stays replayable); a " +
    "column named by a standing delete condition cannot be dropped") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE xdc (k BIGINT, v BIGINT, note VARCHAR(40),
        |  INDEX xdc_ix (note) USING INVERTED,
        |  INDEX xdc_ng (note) USING NGRAM_BF
        |    PROPERTIES("gram_size" = "3", "bf_size" = "256")
        |) DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1
        |PROPERTIES("bloom_filter_columns" = "note")""".stripMargin)
    ddl.execute("INSERT INTO xdc VALUES (1, 10, 'red fox')")
    ddl.execute("ALTER TABLE xdc DROP COLUMN note")
    // nothing dangles: SHOW INDEX is empty, SHOW CREATE replays
    assert(ddl.sql("SHOW INDEX FROM xdc").count() == 0L)
    val stmt = ddl.sql("SHOW CREATE TABLE xdc").head.getString(1)
    assert(!stmt.contains("note") && !stmt.contains("bloom_filter"), stmt)
    ddl.execute(stmt.replace("`xdc`", "`xdc2`"))
    // and a MATCH on the dropped column's old index rejects
    assertThrows[Exception](
      ddl.sql("SELECT k FROM xdc WHERE note MATCH_ANY 'red'").collect())
    // a delete-condition column refuses to drop — BEFORE it can poison
    // reads the moment no rowset carries the old bytes
    ddl.execute(
      """CREATE TABLE xdd (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("DELETE FROM xdd WHERE v = 5")
    val e = intercept[IllegalArgumentException](
      ddl.execute("ALTER TABLE xdd DROP COLUMN v"))
    assert(e.getMessage.contains("delete condition"), e.getMessage)
    // the table keeps working; a literal mention of the name elsewhere
    // does not block an unrelated drop
    ddl.execute("ALTER TABLE xdd ADD COLUMN s VARCHAR(8) DEFAULT 'v'")
    ddl.execute("ALTER TABLE xdd DROP COLUMN s")
    ddl.execute("INSERT INTO xdd VALUES (1, 5), (2, 6)")
    assert(ddl.sql("SELECT k FROM xdd ORDER BY k").as[Long].collect()
      .toSeq == Seq(1L, 2L), "post-delete loads survive, versioned")
    // retyping an indexed column rejects by name (the index would become
    // SHOW-CREATE-emittable but never replayable)
    ddl.execute(
      """CREATE TABLE xmc (k BIGINT, note VARCHAR(40),
        |  INDEX xmc_ix (note) USING INVERTED
        |) DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xmc VALUES (1, '7')")
    val e2 = intercept[IllegalArgumentException](
      ddl.execute("ALTER TABLE xmc MODIFY COLUMN note BIGINT"))
    assert(e2.getMessage.contains("drop the index before retyping"),
      e2.getMessage)
    // and the UNIQUE sequence column is structural — it cannot be dropped
    ddl.execute(
      """CREATE TABLE xsq (k BIGINT, v BIGINT, seq BIGINT)
        |UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1
        |PROPERTIES("function_column.sequence_col" = "seq")""".stripMargin)
    ddl.execute("INSERT INTO xsq VALUES (1, 10, 5)")
    val e3 = intercept[IllegalArgumentException](
      ddl.execute("ALTER TABLE xsq DROP COLUMN seq"))
    assert(e3.getMessage.contains("sequence column"), e3.getMessage)
  }

  test("NGRAM_BF × AUTO PARTITION: sidecars build per materialized bucket " +
    "dir and pruning works across auto-created partitions") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE xap (ts DATETIME, k BIGINT, body VARCHAR(80),
        |  INDEX xap_ng (body) USING NGRAM_BF
        |    PROPERTIES("gram_size" = "3", "bf_size" = "65536")
        |) DUPLICATE KEY(ts, k)
        |AUTO PARTITION BY RANGE (date_trunc(`ts`, 'day')) ()
        |DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xap VALUES ('2024-01-10 01:00:00', 1, 'alpha beta')")
    ddl.execute("INSERT INTO xap VALUES ('2024-01-11 01:00:00', 2, 'gamma delta')")
    ddl.execute("INSERT INTO xap VALUES ('2024-01-12 01:00:00', 3, 'xylophone day')")
    ddl.lastNgramPrune = None
    val df = ddl.sql("SELECT k FROM xap WHERE body LIKE '%xylophone%'")
    assert(df.as[Long].collect().toSeq == Seq(3L))
    val Some((_, surv, total)) = ddl.lastNgramPrune
    assert(total >= 3 && surv < total,
      s"($surv, $total): per-bucket-dir sidecars must prune")
    assert(scanFileCountsXap(df).sum == surv)
    // the pruned read keeps partition-column inference: a partition
    // predicate composes with the needle
    assert(ddl.sql("SELECT count(*) AS n FROM xap " +
      "WHERE body LIKE '%xylophone%' AND ts >= '2024-01-12 00:00:00'")
      .as[Long].head() == 1L)
  }

  private def scanFileCountsXap(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length
    }

  test("grants × view-over-view × drop/recreate: authorization precedes " +
    "resolution, a broken chain errors not-found for the grantee, healing " +
    "serves the NEW definition, and grants survive recreation by name") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE xg (k BIGINT, v BIGINT)
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO xg VALUES (1, 10), (2, 20), (3, 30)")
    ddl.execute("CREATE VIEW xg_v1 AS SELECT k, v FROM xg WHERE k <= 2")
    ddl.execute("CREATE VIEW xg_v2 AS SELECT k FROM xg_v1 WHERE k >= 1")
    ddl.execute("CREATE USER 'vu'")
    ddl.execute("GRANT SELECT_PRIV ON xg_v2 TO 'vu'")
    ddl.login("vu")
    assert(ddl.sql("SELECT count(*) AS n FROM xg_v2").as[Long].head() == 2L)
    // the inner view and the base stay ungranted
    for (obj <- Seq("xg_v1", "xg")) {
      val e = intercept[RuntimeException](ddl.sql(s"SELECT * FROM $obj"))
      assert(e.getMessage.startsWith("access denied"), e.getMessage)
    }
    // root drops the INNER view: the chain breaks
    ddl.login("root")
    ddl.execute("DROP VIEW xg_v1")
    ddl.login("vu")
    // the grantee's read now fails at RESOLUTION (not access): the grant
    // is intact, the object is broken — and for a user with NO grant the
    // same statement must stay access-denied (no existence oracle)
    val broken = intercept[Exception](
      ddl.sql("SELECT count(*) AS n FROM xg_v2").collect())
    assert(!String.valueOf(broken.getMessage).startsWith("access denied") &&
      (String.valueOf(broken.getMessage).contains("not found") ||
        String.valueOf(broken.getMessage).contains("NOT_FOUND") ||
        String.valueOf(broken.getMessage).contains("cannot be found")),
      broken.getMessage)
    ddl.login("root")
    ddl.execute("CREATE USER 'nobody'")
    ddl.login("nobody")
    val denied = intercept[RuntimeException](ddl.sql("SELECT * FROM xg_v2"))
    assert(denied.getMessage.startsWith("access denied"), denied.getMessage)
    // recreate the inner view WIDER: the chain heals in-statement and the
    // standing grant serves the NEW rows
    ddl.login("root")
    ddl.execute("CREATE VIEW xg_v1 AS SELECT k, v FROM xg")
    ddl.login("vu")
    assert(ddl.sql("SELECT count(*) AS n FROM xg_v2").as[Long].head() == 3L,
      "healed chain must serve the recreated definition")
    ddl.login("root")
  }

  test("routine load crash-resume: a batch PUBLISHED but not checkpoint-" +
    "committed (the crash window) replays on RESUME under its consumed " +
    "label and stays exactly-once; an abrupt kill mid-backlog resumes " +
    "from the next unconsumed file") {
    val ddl = fresh()
    val src = graft.TempDirs.create("graft_xf_crash_src")
    ddl.execute(
      """CREATE TABLE cr (k BIGINT, v DOUBLE)
        |DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.mode("append").parquet(src)
    ddl.execute(s"CREATE ROUTINE LOAD crj ON cr FROM FILE('$src', 'parquet')")
    assert(ddl.sql("SELECT count(*) AS n FROM cr").as[Long].head() == 100L)
    ddl.execute("PAUSE ROUTINE LOAD FOR crj")
    // manufacture the crash window ON DISK: the latest batch published
    // (rowset + label live) but its checkpoint COMMIT record is gone —
    // exactly the state a driver crash between the sink write and the
    // commit-log append leaves. The resumed query MUST replay that batch.
    val commits = java.nio.file.Paths.get(
      ddl.routineCheckpoint("crj"), "commits")
    val latest = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filterNot(_.endsWith(".crc")).sorted.last
    java.nio.file.Files.delete(java.nio.file.Paths.get(latest))
    // the ChecksumFileSystem sidecar too — a lingering .crc makes the
    // replayed commit write read as "already exists"
    val crc = java.nio.file.Paths.get(commits.toString,
      "." + java.nio.file.Paths.get(latest).getFileName.toString + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
    ddl.execute("RESUME ROUTINE LOAD FOR crj")
    assert(ddl.sql("SELECT count(*) AS n FROM cr").as[Long].head() == 100L,
      "the replayed batch must be acknowledged by its consumed label, " +
        "not re-applied")
    assert(ddl.sql("SELECT count(*) AS n FROM (SELECT k FROM cr " +
      "GROUP BY k HAVING count(*) > 1) d").as[Long].head() == 0L,
      "no key may be ingested twice")
    // SHOW LOAD: every published load carries a DISTINCT label
    val labels = ddl.sql("SHOW LOAD FROM cr").select("label")
      .as[String].collect().toSeq
    assert(labels.distinct.size == labels.size, labels.toString)
    // abrupt-kill half: drop a fresh backlog, kill WITHOUT drain (the
    // in-JVM crash analogue — the batch may or may not have started),
    // resume and prove the catch-up lands everything exactly once
    spark.range(100, 150).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.mode("append").parquet(src)
    ddl.killRoutineQuery("crj")
    ddl.execute("RESUME ROUTINE LOAD FOR crj")
    assert(ddl.sql("SELECT count(*) AS n FROM cr").as[Long].head() == 150L,
      "post-crash resume must land the backlog exactly once")
    assert(ddl.sql("SELECT count(*) AS n FROM (SELECT k FROM cr " +
      "GROUP BY k HAVING count(*) > 1) d").as[Long].head() == 0L)
    ddl.execute("STOP ROUTINE LOAD FOR crj")
  }

  test("NGRAM_BF sidecar-build race: concurrent loads (publishing rowsets " +
    "+ building sidecars) and indexed LIKE readers (lazily healing) never " +
    "consult a torn bitset — every read is exact for the rows it saw") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE ngr2 (id BIGINT, body VARCHAR(120),
        |  INDEX ixr2 (body) USING NGRAM_BF
        |    PROPERTIES("gram_size" = "3", "bf_size" = "4096")
        |) DUPLICATE KEY(id) DISTRIBUTED BY HASH(id) BUCKETS 2""".stripMargin)
    ddl.execute("INSERT INTO ngr2 VALUES (0, 'xylophone zero')")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rounds = 12
    val writer = Future {
      (1 to rounds).foreach { i =>
        // odd ids carry the needle; each insert publishes a rowset and
        // builds its sidecars while readers are mid-flight
        val body = if (i % 2 == 1) s"xylophone row $i" else s"plain row $i"
        ddl.execute(s"INSERT INTO ngr2 VALUES ($i, '$body')")
      }
    }
    val reader = Future {
      (1 to rounds * 2).map { _ =>
        // soundness: a read may see any committed prefix of versions, but
        // every returned id must genuinely match and NO matching visible
        // row may be pruned away — torn bitsets would lose odd ids
        ddl.sql("SELECT id FROM ngr2 WHERE body LIKE '%xylophone%'")
          .as[Long].collect().sorted.toSeq
      }
    }
    Await.result(writer, 300.seconds)
    val reads = Await.result(reader, 300.seconds)
    reads.foreach { got =>
      assert(got.forall(id => id == 0L || id % 2 == 1),
        s"non-matching id in result: $got")
      // monotone prefix property: results only grow as rowsets publish
      assert(got.contains(0L), s"the first committed match must never vanish: $got")
    }
    val finalIds = ddl.sql("SELECT id FROM ngr2 WHERE body LIKE '%xylophone%'")
      .as[Long].collect().sorted.toSeq
    assert(finalIds == (0L +: (1 to rounds).filter(_ % 2 == 1).map(_.toLong)),
      s"final read must be exact: $finalIds")
    // no torn temp files linger as consulted sidecars
    val Some((_, surv, total)) = ddl.lastNgramPrune
    assert(surv <= total && total >= rounds,
      s"($surv, $total): per-rowset sidecars must cover every publish")
  }
}
