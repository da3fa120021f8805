package graft

import graft.sql.DorisDdl
import org.apache.spark.sql.functions._

/** Statement front-end invariants (SURVEY §3.1 over §1.1): the DDL/DML
  * parser's semantics beyond what the four sql_ddl_* oracle keys pin —
  * parse rejections a user would hit, the bucketed/partitioned physical
  * layout the CREATE clauses promise, versioned-delete edge cases, and
  * the partition-selection scan actually pruning.
  */
class DdlSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def fresh() = new DorisDdl(spark)

  test("create/insert values/select round-trips types and defaults") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE t_types (
        |  id BIGINT,
        |  name VARCHAR(10),
        |  price DECIMAL(10,2),
        |  seen DATETIME,
        |  day DATE,
        |  ok BOOLEAN,
        |  tag VARCHAR(6) DEFAULT 'none'
        |) DUPLICATE KEY(id) DISTRIBUTED BY HASH(id) BUCKETS 2""".stripMargin)
    ddl.execute(
      """INSERT INTO t_types (id, name, price, seen, day, ok) VALUES
        |(1, 'a', 12.345, '2024-06-15 10:30:00', '2024-06-15', true),
        |(2, 'b', 0.5, '2024-06-16 00:00:00', '2024-06-16', false)""".stripMargin)
    val rows = ddl.sql("SELECT * FROM t_types ORDER BY id").collect()
    assert(rows.length == 2)
    // DECIMAL(10,2) rounds at load; DEFAULT fills the omitted column
    assert(rows(0).getDecimal(2).toString == "12.35" ||
      rows(0).getDecimal(2).toString == "12.34") // HALF_UP vs HALF_EVEN: pin presence of scale 2
    assert(rows(0).getDecimal(2).scale == 2)
    assert(rows.forall(_.getString(6) == "none"))
    val schema = ddl.sql("SELECT * FROM t_types").schema
    assert(schema("seen").dataType.typeName == "timestamp")
    assert(schema("day").dataType.typeName == "date")
    assert(schema("ok").dataType.typeName == "boolean")
  }

  test("parser rejects malformed / illegal statements loudly") {
    val ddl = fresh()
    // missing DISTRIBUTED BY
    assertThrows[RuntimeException](ddl.execute(
      "CREATE TABLE bad1 (a INT) DUPLICATE KEY(a)"))
    // KEY not a prefix of the columns
    assertThrows[IllegalArgumentException](ddl.execute(
      "CREATE TABLE bad2 (a INT, b INT) DUPLICATE KEY(b) DISTRIBUTED BY HASH(b) BUCKETS 1"))
    // aggregate marker without AGGREGATE KEY
    assertThrows[IllegalArgumentException](ddl.execute(
      "CREATE TABLE bad3 (a INT, v DOUBLE SUM) DUPLICATE KEY(a) DISTRIBUTED BY HASH(a) BUCKETS 1"))
    // AGGREGATE value column without a marker
    assertThrows[IllegalArgumentException](ddl.execute(
      "CREATE TABLE bad4 (a INT, v DOUBLE) AGGREGATE KEY(a) DISTRIBUTED BY HASH(a) BUCKETS 1"))
    // unknown table
    assertThrows[RuntimeException](ddl.execute("INSERT INTO nope VALUES (1)"))
    // DELETE on an AGGREGATE table (Doris restriction)
    ddl.execute("CREATE TABLE ag (a INT, v DOUBLE SUM) AGGREGATE KEY(a) DISTRIBUTED BY HASH(a) BUCKETS 1")
    assertThrows[IllegalArgumentException](ddl.execute("DELETE FROM ag WHERE a = 1"))
    // duplicate CREATE
    ddl.execute("CREATE TABLE once (a INT) DUPLICATE KEY(a) DISTRIBUTED BY HASH(a) BUCKETS 1")
    assertThrows[IllegalArgumentException](ddl.execute(
      "CREATE TABLE once (a INT) DUPLICATE KEY(a) DISTRIBUTED BY HASH(a) BUCKETS 1"))
  }

  test("a load with a row beyond the last range bound is rejected (Doris semantics)") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE bounded (d DATE, v INT) DUPLICATE KEY(d)
        |PARTITION BY RANGE(d) (
        |  PARTITION p1 VALUES LESS THAN ('2024-01-01'),
        |  PARTITION p2 VALUES LESS THAN ('2025-01-01')
        |) DISTRIBUTED BY HASH(v) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO bounded VALUES ('2024-06-15', 1)") // fits p2
    val e = intercept[Exception](ddl.execute(
      "INSERT INTO bounded VALUES ('2026-01-01', 2)")) // beyond p2
    assert(e.getMessage != null)
    // the failed load must not corrupt the table: only the first row visible
    assert(ddl.sql("SELECT count(*) AS n FROM bounded").as[Long].head() == 1L)
  }

  test("bucketed partitioned layout: <= BUCKETS files per partition per load") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE lay (d DATE, k BIGINT, v DOUBLE) DUPLICATE KEY(d, k)
        |PARTITION BY RANGE(d) (
        |  PARTITION pa VALUES LESS THAN ('1998-01-01'),
        |  PARTITION pb VALUES LESS THAN (MAXVALUE)
        |) DISTRIBUTED BY HASH(k) BUCKETS 3""".stripMargin)
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    ddl.execute(
      "INSERT INTO lay SELECT CAST(o_orderdate AS DATE), o_orderkey, o_totalprice FROM orders")
    val dir = ddlDir(ddl, "lay")
    for (p <- Seq("pa", "pb")) {
      val files = Option(new java.io.File(dir, s"_p=$p").list())
        .getOrElse(Array.empty).filter(_.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 3,
        s"partition $p: ${files.length} files (buckets=3)")
    }
  }

  test("partition selection produces a partition-pruned scan") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE sel (d DATE, v DOUBLE) DUPLICATE KEY(d)
        |PARTITION BY RANGE(d) (
        |  PARTITION lo VALUES LESS THAN ('1998-01-01'),
        |  PARTITION hi VALUES LESS THAN (MAXVALUE)
        |) DISTRIBUTED BY HASH(d) BUCKETS 2""".stripMargin)
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    ddl.execute(
      "INSERT INTO sel SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders")
    val restricted = ddl.sql("SELECT count(*) AS n FROM sel PARTITION (lo)")
    val full = ddl.sql("SELECT count(*) AS n FROM sel")
    assert(restricted.as[Long].head() < full.as[Long].head())
    // physical pruning: the restricted scan reads only the lo directory
    val scan = restricted.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("_p"),
      scan.take(600))
  }

  test("versioned delete: a key whose only row predates the delete stays gone") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE vd (k BIGINT, v VARCHAR(8)) UNIQUE KEY(k)
        |DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO vd VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    ddl.execute("DELETE FROM vd WHERE k >= 2")
    ddl.execute("INSERT INTO vd VALUES (2, 'b2')") // post-delete reload
    val got = ddl.sql("SELECT k, v FROM vd ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2")), got)
    // and a delete matching NOTHING leaves everything visible (null-safe
    // predicate fold — the coalesce rule in applyDeletePredicates)
    ddl.execute("DELETE FROM vd WHERE v = 'zzz'")
    assert(ddl.sql("SELECT count(*) AS n FROM vd").as[Long].head() == 2L)
  }

  test("aggregate model: SUM/MAX/MIN/REPLACE merge across loads") {
    val ddl = fresh()
    ddl.execute(
      """CREATE TABLE am (k BIGINT, s BIGINT SUM, mx BIGINT MAX, mn BIGINT MIN,
        |  r VARCHAR(4) REPLACE) AGGREGATE KEY(k)
        |DISTRIBUTED BY HASH(k) BUCKETS 1""".stripMargin)
    ddl.execute("INSERT INTO am VALUES (1, 10, 5, 5, 'v1'), (2, 20, 7, 7, 'v1')")
    ddl.execute("INSERT INTO am VALUES (1, 1, 9, 2, 'v2')")
    val got = ddl.sql("SELECT k, s, mx, mn, r FROM am ORDER BY k")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 11L, 9L, 2L, "v2"), (2L, 20L, 7L, 7L, "v1")), got)
  }

  private def ddlDir(ddl: DorisDdl, table: String): String = {
    val f = ddl.getClass.getDeclaredField("tables")
    f.setAccessible(true)
    f.get(ddl).asInstanceOf[scala.collection.mutable.LinkedHashMap[String, DorisDdl.TableState]](table).dir
  }
}
