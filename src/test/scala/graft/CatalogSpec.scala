package graft

import org.apache.spark.sql.functions._

/** Multi-catalog federation contracts (sources/GraftCatalog, SURVEY §2.1):
  * the DSv2 catalog must expose its tables through SQL metadata commands,
  * push filters and prune columns through the federated scan exactly like a
  * native one, resolve lazily from pure session conf, and reject writes.
  */
class CatalogSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private lazy val cat = sources.GraftCatalog.register(spark, sf)

  test("SHOW TABLES lists every parquet table in the federated root") {
    val tables = spark.sql(s"SHOW TABLES IN $cat.main")
      .select($"tableName").as[String].collect().toSet
    val expected = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    assert(expected.subsetOf(tables), s"missing: ${expected -- tables}")
  }

  test("filters push down and columns prune through the federated scan") {
    val df = spark.sql(
      s"SELECT o_orderkey FROM $cat.main.orders WHERE o_orderstatus = 'F'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]")
      || plan.contains("PushedFilters: [EqualTo(o_orderstatus,F)"),
      s"filter not pushed into federated scan:\n$plan")
    assert("ReadSchema: [^,\n]*o_orderkey".r.findFirstIn(plan).isDefined &&
      !plan.contains("o_totalprice"),
      s"columns not pruned to the projection:\n$plan")
  }

  test("cross-catalog join answers equal the single-catalog spelling") {
    val federated = run("scan_catalog").collect().toSeq
    val native = Tables.orders(spark, sf).filter($"o_orderstatus" === "F")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"c_mktsegment").collect().toSeq
    assert(federated == native)
  }

  test("identifiers cannot escape the catalog root (path traversal)") {
    // a backtick-quoted identifier like `../../x` must resolve to
    // table-not-found, never to a parquet file outside the configured root
    // (GraftCatalog.tablePath rejects separators/.. and re-checks the
    // canonical path). Plant a real parquet OUTSIDE the root to prove the
    // guard is what stops it, not a missing file.
    val outside = java.nio.file.Files.createTempDirectory("cat_escape")
    try {
      Seq((1, "leaked")).toDF("id", "v").coalesce(1).write
        .mode("overwrite").parquet(outside.resolve("secret.parquet").toString)
      // a RELATIVE identifier that, unguarded, canonicalizes exactly onto
      // the planted parquet — proving the guard (not a 404) is what stops it
      val escape = java.nio.file.Paths.get(sf).toAbsolutePath.normalize
        .relativize(outside.resolve("secret")).toString
      assert(new java.io.File(new java.io.File(sf), s"$escape.parquet")
        .getCanonicalFile.exists(), "test setup: escape path must resolve")
      for (bad <- Seq(escape, "../secret", "a/../../secret", "..")) {
        val e = intercept[Exception] {
          spark.sql(s"SELECT * FROM $cat.main.`$bad`").collect()
        }
        assert(e.getMessage.toLowerCase.matches("(?s).*(not.?found|cannot be found).*"),
          s"identifier '$bad' should be table-not-found, got: ${e.getMessage}")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(outside).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists)
    }
  }

  test("the federated catalog is read-only") {
    intercept[Exception] {
      spark.sql(s"DROP TABLE $cat.main.orders")
    }
    // INSERT must die at ANALYSIS (capability check), not at I/O: the bare
    // ParquetTable advertises BATCH_WRITE, so without the ReadOnlyTable
    // wrapper this would plan an AppendData and only fail because the
    // single-file layout happens not to be appendable
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        s"INSERT INTO $cat.main.orders SELECT * FROM $cat.main.orders LIMIT 1")
    }
    assert(e.getMessage.toLowerCase.contains("does not support"),
      s"expected a capability rejection, got: ${e.getMessage}")
    // and the source data is untouched
    assert(Tables.orders(spark, sf).count() > 0)
  }
}
