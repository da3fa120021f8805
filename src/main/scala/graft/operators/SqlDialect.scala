package graft.operators

import graft.{QueryDef, Tables}
import graft.sql.DorisSqlDialect

/** Doris-SQL text entry keys (SURVEY §3.1 step 1): unlike every other key,
  * the INPUT here is Doris/MySQL-dialect SQL TEXT, run through
  * [[graft.sql.DorisSqlDialect]] and `spark.sql` — the last visible piece of
  * the Palo user surface after `sql_api_q3` (ANSI text) and the
  * `fn_*_shim` keys (DataFrame-level name shims). The rewrites land on
  * codegen'd builtins, so each dialect query gets the identical Catalyst
  * plan its ANSI spelling gets: aggregation keys shuffle once with partial
  * aggregation, scans prune to the referenced columns, LIMIT/OFFSET stays a
  * GlobalLimit — nothing about the text front-end costs anything at 100 TB.
  */
object SqlDialect {

  def queries: Map[String, QueryDef] = Map(
    // MySQL-isms in one aggregate: backtick quoting, GROUP_CONCAT with
    // DISTINCT + SEPARATOR (→ deterministic value-sorted concat_ws over
    // collect_set), and the "LIMIT offset, count" spelling.
    "sql_dialect_agg" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
        DorisSqlDialect.sql(s,
          """SELECT `l_returnflag`,
            |  count(*) AS n,
            |  group_concat(DISTINCT `l_linestatus` SEPARATOR '|') AS statuses,
            |  round(sum(`l_quantity`), 2) AS sum_qty
            |FROM lineitem
            |GROUP BY `l_returnflag`
            |ORDER BY `l_returnflag`
            |LIMIT 1, 2""".stripMargin)
      },
      """SELECT l_returnflag, count(*) AS n,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), '|')
        |    AS statuses,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        |LIMIT 2 OFFSET 1""".stripMargin),

    // MySQL %-code datetime formats through SQL text: date_format emits
    // them, str_to_date parses them back (→ to_timestamp with the
    // translated pattern).
    "sql_dialect_dates" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        DorisSqlDialect.sql(s,
          """SELECT o_orderkey,
            |  date_format(`o_orderdate`, '%Y%m%d') AS fmt_ymd,
            |  date_format(`o_orderdate`, '%d/%m/%Y') AS fmt_dmy,
            |  CAST(str_to_date('15/06/2024 10:30:00', '%d/%m/%Y %H:%i:%s')
            |       AS DATE) AS parsed_date
            |FROM orders ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y%m%d') AS fmt_ymd,
        |  strftime(o_orderdate, '%d/%m/%Y') AS fmt_dmy,
        |  CAST(strptime('15/06/2024 10:30:00', '%d/%m/%Y %H:%M:%S') AS DATE)
        |    AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // Doris spellings with no Spark SQL name: strleft/strright (→ left/
    // right), money_format (→ format_number), plus find_in_set/ifnull,
    // which Spark shares with MySQL and passes through untouched.
    "sql_dialect_shims" -> QueryDef(
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("nation")
        DorisSqlDialect.sql(s,
          """SELECT n_nationkey,
            |  strleft(`n_name`, 6) AS sl_v,
            |  strright(`n_name`, 3) AS sr_v,
            |  money_format(n_nationkey * 1234567.891) AS money_v,
            |  find_in_set(n_name, 'NATION_1,NATION_3,NATION_5') AS fis_v,
            |  ifnull(CAST(NULL AS STRING), n_name) AS ifn_v
            |FROM nation ORDER BY n_nationkey""".stripMargin)
      },
      """SELECT n_nationkey,
        |  substr(n_name, 1, 6) AS sl_v,
        |  substr(n_name, -3, 3) AS sr_v,
        |  format('{:,}', CAST(split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 1) AS BIGINT))
        |    || '.' || split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 2) AS money_v,
        |  CAST(coalesce(list_position(string_split('NATION_1,NATION_3,NATION_5', ','),
        |                              n_name), 0) AS INTEGER) AS fis_v,
        |  coalesce(CAST(NULL AS VARCHAR), n_name) AS ifn_v
        |FROM nation ORDER BY n_nationkey""".stripMargin)
  )
}
