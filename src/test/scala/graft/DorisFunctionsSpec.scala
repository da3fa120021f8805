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

  test("geo: haversine invariants and known distances") {
    import graft.functions.GeoFunctions._
    // seeded random coordinate pairs: d(x,x)=0, symmetry, range [0, half
    // Earth circumference], plus a textbook fixed point (Paris->London
    // great-circle ~343.5 km) and equator degree (~111.19 km)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(50)(
      (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85,
        rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85))
    val df = pts.toDF("lon1", "lat1", "lon2", "lat2")
      .select(
        stDistanceSphere($"lon1", $"lat1", $"lon2", $"lat2").as("d12"),
        stDistanceSphere($"lon2", $"lat2", $"lon1", $"lat1").as("d21"),
        stDistanceSphere($"lon1", $"lat1", $"lon1", $"lat1").as("dself"))
      .as[(Double, Double, Double)].collect()
    val halfC = math.Pi * 6371000.0
    df.foreach { case (d12, d21, dself) =>
      assert(dself == 0.0)
      assert(math.abs(d12 - d21) < 1e-6, s"asymmetric: $d12 vs $d21")
      assert(d12 >= 0 && d12 <= halfC + 1e-6, s"out of range: $d12")
    }
    val fixed = Seq((2.3522, 48.8566, -0.1276, 51.5072),
        (0.0, 0.0, 1.0, 0.0))
      .toDF("lon1", "lat1", "lon2", "lat2")
      .select(stDistanceSphere($"lon1", $"lat1", $"lon2", $"lat2"))
      .as[Double].collect()
    assert(math.abs(fixed(0) - 343500) < 1500, s"Paris-London: ${fixed(0)}")
    assert(math.abs(fixed(1) - 111195) < 10, s"equator degree: ${fixed(1)}")
    // rectangle containment is boundary-inclusive
    val in = Seq((90.0, 45.0), (0.0, 0.0), (90.0001, 0.0))
      .toDF("x", "y")
      .select(stContainsRect(lit(-90.0), lit(-45.0), lit(90.0), lit(45.0),
        stPoint($"x", $"y")))
      .as[Boolean].collect().toSeq
    assert(in == Seq(true, true, false))
  }
}
