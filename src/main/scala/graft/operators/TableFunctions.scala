package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Table functions / lateral view (SURVEY.md §2.9).
  *
  * Doris: VTableFunctionNode [doris: be/src/vec/exec/vtable_function_node.cpp]
  * with functions under [doris: be/src/vec/exec/table_function/]. Spark:
  * generator expressions (explode/posexplode/inline) planned as GenerateExec —
  * fully distributed, no shuffle introduced by the generator itself.
  */
object TableFunctions {

  def queries: Map[String, QueryDef] = Map(
    // explode + posexplode over tokenized text (explode_split analogue).
    "tf_explode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .filter($"doc_id" < 50)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
          .orderBy($"doc_id", $"pos")
      },
      """SELECT doc_id,
        |  generate_subscripts(tl, 1) - 1 AS pos,
        |  unnest(tl) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS tl
        |      FROM documents WHERE doc_id < 50) s
        |ORDER BY doc_id, pos""".stripMargin),

    // explode_*_outer variants: rows whose array is EMPTY survive with a
    // NULL element (Doris LATERAL VIEW ... OUTER semantics; inner explode
    // would drop them). Demonstrated on a genuinely-often-empty array —
    // tokens starting with 'q' (26 of the first 100 docs have none at
    // sf0.01) — so both branches execute. NULL ordering pinned explicitly
    // on both sides (Spark default NULLS FIRST vs DuckDB NULLS LAST).
    "tf_explode_outer" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val qToks = filter(graft.text.TextOps.tokens($"text"),
          x => x.startsWith("q"))
        Tables.documents(s, dir)
          .filter($"doc_id" < 100)
          .select($"doc_id", explode_outer(qToks).as("tok"))
          .orderBy($"doc_id", $"tok".asc_nulls_first)
      },
      """SELECT doc_id,
        |  unnest(CASE WHEN len(zl) = 0 THEN [CAST(NULL AS VARCHAR)]
        |         ELSE zl END) AS tok
        |FROM (SELECT doc_id,
        |        list_filter(string_split(lower(text), ' '),
        |                    x -> x LIKE 'q%') AS zl
        |      FROM documents WHERE doc_id < 100) s
        |ORDER BY doc_id, tok NULLS FIRST""".stripMargin),

    // explode_json_array_int analogue: per-row JSON array -> rows.
    "tf_explode_json" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .filter($"event_id" < 200)
          .select($"event_id",
            get_json_object($"props", "$.k").cast("int").as("k"))
          .filter($"k" > 0)
          .select($"event_id",
            explode(from_json(
              concat(lit("["), $"k", lit(","), $"k" * 2, lit("]")),
              ArrayType(IntegerType))).as("v"))
          .orderBy($"event_id", $"v")
      },
      """SELECT event_id, u.v AS v
        |FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events WHERE event_id < 200) s,
        |     unnest([k, k * 2]) u(v)
        |WHERE k > 0
        |ORDER BY event_id, v""".stripMargin),

    // numbers()/range TVF + explode(sequence(...)).
    "tf_numbers" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        s.range(0, 100).toDF("id")
          .select($"id", ($"id" * $"id").as("sq"),
            size(sequence(lit(0), $"id" % 5)).as("seq_len"))
          .orderBy($"id")
      },
      """SELECT range AS id, range * range AS sq,
        |  CAST(range % 5 + 1 AS INTEGER) AS seq_len
        |FROM range(0, 100) ORDER BY id""".stripMargin),

    // EXPLODE_BITMAP (Doris [doris: be/src/vec/exec/table_function/
    // vexplode_bitmap.cpp]): materialize a stored BITMAP column back into
    // rows. Round-trips the whole Roaring layer — per-group bitmap_union
    // (TypedImperativeAggregate), then bitmap_to_array → explode planned as
    // one GenerateExec. The Doris pattern this enables at 100 TB: audience
    // bitmaps stored per segment (the AGGREGATE-key BITMAP_UNION rollup),
    // exploded only for the final small result — the fan-out happens AFTER
    // aggregation, on ndv-sized bitmaps, never on raw rows. Exact, so the
    // oracle is plain DISTINCT.
    "tf_explode_bitmap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.functions.NativeAggregates.register(s)
        Tables.orders(s, dir)
          .filter($"o_custkey" < 200)
          .groupBy($"o_orderstatus")
          .agg(graft.functions.NativeAggregates
            .bitmap_union_native($"o_custkey").as("bm"))
          .select($"o_orderstatus",
            explode(graft.functions.BitmapFunctions.bitmap_to_array($"bm"))
              .as("o_custkey"))
          .orderBy($"o_orderstatus", $"o_custkey")
      },
      """SELECT DISTINCT o_orderstatus, o_custkey
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_orderstatus, o_custkey""".stripMargin)
  )
}
