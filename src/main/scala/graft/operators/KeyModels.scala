package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Doris key-model emulation + tablet sink (SURVEY.md §1.1, §2.1).
  *
  * Doris tables declare DUPLICATE / UNIQUE / AGGREGATE key models
  * ([doris: fe/.../catalog/KeysType.java]); merge semantics are applied at
  * read ([doris: be/src/olap/tablet_reader.cpp]) or write. Spark-native
  * equivalents are declarative views:
  *  - DUPLICATE KEY  = plain append scan (covered by scan_parquet);
  *  - UNIQUE KEY     = last-write-wins: row_number over (key ORDER BY version
  *                     DESC) = 1 — merge-on-read, exactly one shuffle on key;
  *  - AGGREGATE KEY  = groupBy(keys).agg(column-spec) — partial aggregation
  *    makes ingest-side merge free at the shuffle boundary, the same
  *    collapsing Doris does in its MemTable before flush.
  * The tablet sink ([doris: be/src/vec/sink/vtablet_sink.cpp]) maps to
  * partitioned Parquet writes: partitionBy = Doris range/list partition,
  * file-within-dir = tablet. At 100 TB the partition column must bound file
  * counts (date-grained, not key-grained).
  */
object KeyModels {

  def queries: Map[String, QueryDef] = Map(
    // UNIQUE KEY upsert view: latest event wins per user_id (ts = version).
    "model_unique_key" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type".as("last_type"), $"value".as("last_value"))
          .orderBy($"user_id")
      },
      """SELECT user_id, event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin),

    // AGGREGATE KEY view: keys=(user_id, event_type), values SUM/MAX/COUNT.
    "model_aggregate_key" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id", $"event_type")
          .agg(
            round(sum($"value"), 2).as("sum_value"),
            count(lit(1)).as("n_rows"),
            max($"event_id").as("max_event"))
          .orderBy($"user_id", $"event_type")
      },
      """SELECT user_id, event_type,
        |  round(sum(value), 2) AS sum_value,
        |  count(*) AS n_rows,
        |  max(event_id) AS max_event
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Tablet sink: partitioned Parquet write + read-back (partition pruning
    // friendly layout); oracle checks the round-trip preserved all rows.
    "sink_parquet_partitioned" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
        Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_quantity", $"l_returnflag")
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        s.read.parquet(out)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // OUTFILE / EXPORT to CSV (SURVEY §2.1: Doris SELECT ... INTO OUTFILE
    // FORMAT csv [doris: fe/.../ExportJob.java]): write a query result as
    // headered CSV (executor-parallel, one file per partition at scale),
    // read it back with an explicit schema, and oracle the round trip —
    // proving the text encoding loses nothing (quoting, floats, dates).
    "sink_csv_export" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
        Tables.orders(s, dir)
          .groupBy($"o_orderpriority", to_date($"o_orderdate").cast("string").as("o_day"))
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("o_orderpriority STRING, o_day STRING, n BIGINT, total DOUBLE")
          .csv(out)
          .groupBy($"o_orderpriority")
          .agg(sum($"n").as("n_orders"), round(sum($"total"), 2).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      """SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS n_orders,
        |  round(sum(total), 2) AS revenue
        |FROM (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS o_day,
        |        count(*) AS n, round(sum(o_totalprice), 2) AS total
        |      FROM orders GROUP BY 1, 2) t
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
