package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md, FIXTURES.md).
  *
  * Tables map to the reference's catalog objects (Palo/Doris Database/Table,
  * reference README_EN.md:6 — a distribution of Apache Doris, an MPP columnar
  * OLAP warehouse). Here every table is columnar Parquet read through Spark's
  * vectorized reader, which plays the role of Doris' segment-v2 columnar scan:
  * min/max stats stand in for zonemaps, dictionary pages for dict encoding, and
  * predicate/column pushdown reaches the scan via Catalyst.
  *
  * Scale note (100 TB design): loaders return the raw scan with no
  * repartition/coalesce so Catalyst controls split planning
  * (spark.sql.files.maxPartitionBytes); callers decide distribution. Dimension
  * tables (region/nation/customer/supplier/part at TPC-H-ish ratios) stay
  * broadcast-sized at any SF, so joins against them must stay broadcast joins.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** events.ts is nanosecond-precision in the source Parquet; Spark's
    * TimestampType is microseconds and Spark 4 refuses TIMESTAMP(NANOS)
    * outright. Read nanos as long (legacy conf) and truncate to µs — the
    * oracle side (DuckDB, ns-native) agrees once results are compared at µs
    * precision or coarser (FIXTURES.md records the ns-precision fixture).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // lazily-consumed read-schema conf: single-value engine default, cannot
    // be save/restored (see Confs object doc)
    Confs.ensureNanosAsLong(spark)
    raw(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view so spark.sql queries see the same
    * names the DuckDB oracle uses. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
