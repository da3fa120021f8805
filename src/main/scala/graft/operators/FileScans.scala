package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format scans beyond parquet (SURVEY.md §2.1): CSV and JSON readers —
  * the load/TVF surface of Doris (file scan nodes under
  * [doris: be/src/vec/exec/format/], `s3()`/`file()` TVFs). Data is staged
  * from the canonical parquet into the format under test once per sf dir, so
  * the DuckDB oracle (which reads the parquet) checks the full
  * write->read->query round trip.
  *
  * Scale notes: schemas are explicit (never inferSchema — inference is a
  * full extra pass at 100 TB); CSV/JSON scans parallelize by file splits
  * exactly like parquet, just without column pruning/stats — the engine
  * treats them as ingest formats, converting to parquet at load (KeyModels
  * sink), not as resident storage.
  */
object FileScans {

  private val staged = new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  private def ensureStaged(s: SparkSession, dir: String): (String, String, String) =
    staged.computeIfAbsent(dir, { _ =>
      val csv = java.nio.file.Files.createTempDirectory("graft_csv").toString
      val json = java.nio.file.Files.createTempDirectory("graft_json").toString
      val orc = java.nio.file.Files.createTempDirectory("graft_orc").toString
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
      ord.write.mode("overwrite").option("header", "true").csv(csv)
      ord.write.mode("overwrite").json(json)
      ord.write.mode("overwrite").orc(orc)
      (csv, json, orc)
    })

  /** Typed row for the Dataset[T] demo (top-level so Encoders derive). */
  final case class Ord(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderpriority", StringType)))

  def queries: Map[String, QueryDef] = Map(
    "scan_csv" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (csv, _, _) = ensureStaged(s, dir)
        s.read.schema(ordersSchema).option("header", "true").csv(csv)
          .filter($"o_totalprice" > 100000.0)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_totalprice > 100000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "scan_json" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (_, json, _) = ensureStaged(s, dir)
        s.read.schema(ordersSchema).json(json)
          .filter($"o_orderpriority".like("1-%"))
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderpriority LIKE '1-%'
        |ORDER BY o_orderkey""".stripMargin),

    "scan_orc" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (_, _, orc) = ensureStaged(s, dir)
        s.read.schema(ordersSchema).orc(orc)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(avg($"o_totalprice"), 4).as("avg_price"))
          .orderBy($"o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS n,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // Typed Dataset path: case-class Encoder + typed filter/groupByKey — the
    // Dataset[T] API surface (SURVEY §1.2) over the same engine.
    "ds_typed_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ds = Tables.orders(s, dir)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
          .as[Ord]
        // outputs are order-insensitive (count/max) so the arbitrary group
        // iteration order of mapGroups cannot leak float noise into the hash
        ds.filter(_.o_totalprice > 50000.0)
          .groupByKey(_.o_orderstatus)
          .mapGroups { (status, it) =>
            var n = 0L; var mx = Double.MinValue
            it.foreach { o => n += 1; if (o.o_totalprice > mx) mx = o.o_totalprice }
            (status, n, mx)
          }
          .toDF("o_orderstatus", "n", "max_price")
          .orderBy($"o_orderstatus")
      },
      """SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS max_price
        |FROM orders WHERE o_totalprice > 50000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
