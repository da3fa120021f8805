package graft

import graft.functions.DorisFunctions
import org.apache.spark.sql.functions._

/** Doris-name shim unit checks: the MySQL->Java datetime format translator
  * and the pure-expression helpers.
  */
class DorisFunctionsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("translateDateFormat covers the documented MySQL specifiers") {
    assert(DorisFunctions.translateDateFormat("%Y-%m-%d") == "yyyy-MM-dd")
    assert(DorisFunctions.translateDateFormat("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(DorisFunctions.translateDateFormat("%d/%m/%Y %T") == "dd/MM/yyyy HH:mm:ss")
    assert(DorisFunctions.translateDateFormat("%y%j") == "yyDDD")
    assert(DorisFunctions.translateDateFormat("%H%%") == "HH%")
    // literal letters get quoted so they aren't pattern chars
    assert(DorisFunctions.translateDateFormat("%Yat%m") == "yyyy'a''t'MM")
  }

  test("date_format_mysql formats through Spark identically to the dialect") {
    val got = Seq("2024-06-15 10:30:45").toDF("s")
      .select(DorisFunctions.date_format_mysql(
        to_timestamp($"s"), "%Y/%m/%d %H:%i").as("f"))
      .as[String].head()
    assert(got == "2024/06/15 10:30")
  }

  test("inet_aton/ntoa round-trip known values") {
    val rows = Seq("0.0.0.0", "10.0.0.1", "192.168.1.255", "255.255.255.255")
      .toDF("ip")
      .select($"ip",
        DorisFunctions.inet_aton($"ip").as("n"),
        DorisFunctions.inet_ntoa(DorisFunctions.inet_aton($"ip")).as("rt"))
      .as[(String, Long, String)].collect()
    assert(rows.forall { case (ip, _, rt) => ip == rt })
    assert(rows.find(_._1 == "10.0.0.1").get._2 == 167772161L)
    assert(rows.find(_._1 == "255.255.255.255").get._2 == 4294967295L)
  }

  test("money_format and append_trailing_char_if_absent") {
    val r = Seq((1234567.891, "abc"), (0.5, "abcX")).toDF("v", "s")
      .select(DorisFunctions.money_format($"v").as("m"),
        DorisFunctions.append_trailing_char_if_absent($"s", "X").as("a"))
      .as[(String, String)].collect().toSeq
    assert(r == Seq(("1,234,567.89", "abcX"), ("0.50", "abcX")))
  }
}
