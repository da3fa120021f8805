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

  test("native hash tier matches independent known-answer vectors") {
    // Vectors computed OUTSIDE Spark from the published algorithm specs:
    // xxHash64 (seed 42, Spark's fixed seed) and MurmurHash3_x86_32 (seed 42)
    // re-implemented from their public reference documents in plain Python;
    // CRC-32 from zlib; SHA-1 from hashlib. A seed or endianness regression
    // in the engine-facing key fn_hash_native would break these equalities.
    // Murmur3 strings are UTF-8 multiples of 4 bytes on purpose: Spark's
    // Murmur3_x86_32.hashUnsafeBytes uses a lenient per-byte tail that
    // diverges from the spec on unaligned tails, so aligned inputs are the
    // regime where the spec implementation is exactly comparable.
    val vectors = Seq(
      // (input, xxh64(seed42), murmur3_32(seed42), crc32, sha1)
      ("", -7444071767201028348L, 142593372,
        0L, "da39a3ee5e6b4b0d3255bfef95601890afd80709"),
      ("abcd", -6810745876291105281L, -396302900,
        3984772369L, "81fe8bfe87576c3ecb22426f8e57847382917acf"),
      ("graftengine!", 8598563098269265208L, -1201531526,
        686938106L, "89b08338f713af8ff3d6d1fbccc86c26fc506f73"),
      // 32 bytes: exercises the 4-lane accumulator path of xxHash64
      ("Spark SQL native hash tier....xy", -7291813621406054509L, -541866192,
        3765026744L, "222ef6d5d01d916ca379565a41db162339ff3484"))
    val got = vectors.map(_._1).toDF("s")
      .select($"s",
        xxhash64($"s").as("x"), hash($"s").as("m"),
        crc32($"s".cast("binary")).as("c"), sha1($"s".cast("binary")).as("h"))
      .as[(String, Long, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    vectors.foreach { case (s, x, m, c, h) =>
      val g = got(s)
      assert(g._2 == x, s"xxhash64('$s') = ${g._2}, want $x")
      assert(g._3 == m, s"murmur3('$s') = ${g._3}, want $m")
      assert(g._4 == c, s"crc32('$s') = ${g._4}, want $c")
      assert(g._5 == h, s"sha1('$s') = ${g._5}, want $h")
    }
  }

  test("doris sql dialect rewriter: covered deltas translate, rest passes through") {
    import graft.sql.DorisSqlDialect.rewrite
    // MySQL %-formats translate inside date_format/str_to_date only
    assert(rewrite("SELECT date_format(ts, '%Y-%m-%d %H:%i:%s') FROM t")
      == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM t")
    assert(rewrite("SELECT str_to_date(s, '%d/%m/%Y') FROM t")
      == "SELECT to_timestamp(s, 'dd/MM/yyyy') FROM t")
    // already-Spark formats pass through untouched (no %)
    assert(rewrite("SELECT date_format(ts, 'yyyy-MM') FROM t")
      == "SELECT date_format(ts, 'yyyy-MM') FROM t")
    // group_concat forms
    assert(rewrite("SELECT group_concat(x) FROM t")
      == "SELECT concat_ws(',', sort_array(collect_list(x))) FROM t")
    assert(rewrite("SELECT group_concat(DISTINCT x SEPARATOR '|') FROM t")
      == "SELECT concat_ws('|', sort_array(collect_set(x))) FROM t")
    assert(rewrite("SELECT group_concat(x ORDER BY x SEPARATOR ';') FROM t")
      == "SELECT concat_ws(';', sort_array(collect_list(x))) FROM t")
    assert(rewrite("SELECT group_concat(x, '-') FROM t")
      == "SELECT concat_ws('-', sort_array(collect_list(x))) FROM t")
    // an ORDER BY over a different expr is OUT of the deterministic subset
    // and must pass through (fails in the parser, never silently mis-sorts)
    assert(rewrite("SELECT group_concat(x ORDER BY y) FROM t")
      == "SELECT group_concat(x ORDER BY y) FROM t")
    // nested commas stay inside the nested call
    assert(rewrite("SELECT group_concat(concat(a, b)) FROM t")
      == "SELECT concat_ws(',', sort_array(collect_list(concat(a, b)))) FROM t")
    // LIMIT offset, count
    assert(rewrite("SELECT * FROM t LIMIT 5, 10") == "SELECT * FROM t LIMIT 10 OFFSET 5")
    // name/arity shims
    assert(rewrite("SELECT strleft(s, 3), strright(s, 2) FROM t")
      == "SELECT left(s, 3), right(s, 2) FROM t")
    assert(rewrite("SELECT money_format(v) FROM t")
      == "SELECT format_number(round(v, 2), 2) FROM t")
    // rewrites never fire inside string literals or backtick identifiers
    assert(rewrite("SELECT 'group_concat(x)' AS s, `strleft(q, 1)` FROM t")
      == "SELECT 'group_concat(x)' AS s, `strleft(q, 1)` FROM t")
    // longer identifiers sharing a prefix are not calls of the short name
    assert(rewrite("SELECT date_format_mysql(ts, '%Y') FROM t")
      == "SELECT date_format_mysql(ts, '%Y') FROM t")
  }

  test("native hash tier stays inside whole-stage codegen") {
    val df = Tables.customer(spark, sf)
      .select(xxhash64($"c_name").as("x"), hash($"c_name").as("m"),
        crc32($"c_name".cast("binary")).as("c"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists { w =>
      val s = w.toString.toLowerCase
      s.contains("xxhash64") && s.contains("crc32")
    }, df.queryExecution.executedPlan.toString)
    // max, not sum: ANSI mode would overflow summing 64-bit hash values
    assert(df.agg(max($"x")).as[Long].head() != 0L)
  }
}
