package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.DorisFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.8). One key exercises a
  * representative batch per family; Doris spellings Spark lacks live in
  * [[graft.functions.DorisFunctions]].
  *
  * Everything here is a built-in Catalyst expression (codegen'd, no UDFs), so
  * per-row cost is the vectorized-expression cost Doris pays in
  * [doris: be/src/vec/functions/] and scans stay in one WholeStageCodegen span.
  * Floating-point outputs are rounded on both engine sides (oracle parity).
  */
object Functions {

  def queries: Map[String, QueryDef] = Map(
    // Geo family (st_point/st_x/st_y/st_distance_sphere/st_contains):
    // deterministic synthetic coordinates derived from c_custkey so the
    // DuckDB oracle replays the identical haversine formula; 6-sig-digit
    // float normalization in the compare absorbs cross-libm trig ulps.
    "fn_geo" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.functions.GeoFunctions._
        val pts = Tables.customer(s, dir).select($"c_custkey",
          (pmod($"c_custkey", lit(360)) - 180 + 0.25).as("lon1"),
          (pmod($"c_custkey", lit(170)) - 85 + 0.25).as("lat1"),
          (pmod($"c_custkey" * 7, lit(360)) - 180 + 0.75).as("lon2"),
          (pmod($"c_custkey" * 3, lit(170)) - 85 + 0.75).as("lat2"))
        pts.select($"c_custkey",
            stPoint($"lon1", $"lat1").as("p1"),
            stPoint($"lon2", $"lat2").as("p2"))
          .select($"c_custkey",
            stX($"p1").as("x1"), stY($"p1").as("y1"),
            round(stDistanceSphere(
              stX($"p1"), stY($"p1"), stX($"p2"), stY($"p2")), 2).as("dist_m"),
            stContainsRect(lit(-90.0), lit(-45.0), lit(90.0), lit(45.0),
              $"p1").as("in_rect"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey,
        |  CAST((c_custkey % 360) - 180 + 0.25 AS DOUBLE) AS x1,
        |  CAST((c_custkey % 170) - 85 + 0.25 AS DOUBLE) AS y1,
        |  round(2 * 6371000 * asin(sqrt(
        |      pow(sin(radians((((c_custkey * 3) % 170) - 85 + 0.75)
        |                      - ((c_custkey % 170) - 85 + 0.25)) / 2), 2)
        |    + cos(radians((c_custkey % 170) - 85 + 0.25))
        |      * cos(radians(((c_custkey * 3) % 170) - 85 + 0.75))
        |      * pow(sin(radians((((c_custkey * 7) % 360) - 180 + 0.75)
        |                        - ((c_custkey % 360) - 180 + 0.25)) / 2), 2)
        |  )), 2) AS dist_m,
        |  CAST((c_custkey % 360) - 180 + 0.25 AS DOUBLE) BETWEEN -90 AND 90
        |    AND CAST((c_custkey % 170) - 85 + 0.25 AS DOUBLE) BETWEEN -45 AND 45
        |    AS in_rect
        |FROM customer ORDER BY c_custkey""".stripMargin),

    "fn_math" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select(
            $"l_orderkey", $"l_linenumber",
            abs($"l_quantity" - 25.0).as("abs_v"),
            ceil($"l_quantity" / 7.0).as("ceil_v"),
            floor($"l_quantity" / 7.0).as("floor_v"),
            round($"l_extendedprice" / 3.0, 2).as("round_v"),
            ($"l_orderkey" % 7).as("mod_v"),
            round(pow($"l_quantity", 2.0), 2).as("pow_v"),
            round(sqrt($"l_extendedprice"), 6).as("sqrt_v"),
            round(exp($"l_discount"), 6).as("exp_v"),
            round(log($"l_extendedprice"), 6).as("ln_v"),
            round(log10($"l_extendedprice"), 6).as("log10_v"),
            round(log2($"l_quantity" + 1.0), 6).as("log2_v"),
            signum($"l_quantity" - 25.0).cast("int").as("sign_v"),
            greatest($"l_quantity", $"l_discount" * 100.0).as("greatest_v"),
            least($"l_tax", $"l_discount").as("least_v"),
            round(radians($"l_quantity"), 6).as("radians_v"),
            conv($"l_orderkey".cast("string"), 10, 16).as("hex_str"),
            bin($"l_linenumber").as("bin_str"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS abs_v,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_v,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_v,
        |  round(l_extendedprice / 3.0, 2) AS round_v,
        |  l_orderkey % 7 AS mod_v,
        |  round(pow(l_quantity, 2.0), 2) AS pow_v,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_v,
        |  round(exp(l_discount), 6) AS exp_v,
        |  round(ln(l_extendedprice), 6) AS ln_v,
        |  round(log10(l_extendedprice), 6) AS log10_v,
        |  round(log2(l_quantity + 1.0), 6) AS log2_v,
        |  CAST(sign(l_quantity - 25.0) AS INTEGER) AS sign_v,
        |  greatest(l_quantity, l_discount * 100.0) AS greatest_v,
        |  least(l_tax, l_discount) AS least_v,
        |  round(radians(l_quantity), 6) AS radians_v,
        |  upper(to_base(l_orderkey, 16)) AS hex_str,
        |  bin(l_linenumber) AS bin_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),

    "fn_string" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .select(
            $"c_custkey",
            length($"c_name").as("len_v"),
            lower($"c_name").as("lower_v"),
            upper($"c_mktsegment").as("upper_v"),
            lpad($"c_custkey".cast("string"), 8, "0").as("lpad_v"),
            rpad($"c_mktsegment", 12, "*").as("rpad_v"),
            trim(concat(lit("  "), $"c_name", lit("  "))).as("trim_v"),
            concat_ws("-", $"c_mktsegment", $"c_custkey".cast("string")).as("concat_ws_v"),
            substring($"c_name", 1, 8).as("substr_v"),
            DorisFunctions.strleft($"c_name", 4).as("left_v"),
            DorisFunctions.strright($"c_name", 4).as("right_v"),
            instr($"c_name", "#").as("instr_v"),
            regexp_replace($"c_name", "0", "o").as("replace_v"),
            repeat($"c_mktsegment", 2).as("repeat_v"),
            reverse($"c_mktsegment").as("reverse_v"),
            element_at(split($"c_name", "#"), 2).as("split_part_v"),
            $"c_name".startsWith("Customer").cast("int").as("startswith_v"),
            $"c_mktsegment".endsWith("RY").cast("int").as("endswith_v"),
            ascii($"c_mktsegment").as("ascii_v"),
            initcap(lower($"c_mktsegment")).as("initcap_v"),
            DorisFunctions.append_trailing_char_if_absent($"c_mktsegment", "G").as("append_v"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey,
        |  length(c_name) AS len_v,
        |  lower(c_name) AS lower_v,
        |  upper(c_mktsegment) AS upper_v,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS lpad_v,
        |  rpad(c_mktsegment, 12, '*') AS rpad_v,
        |  trim('  ' || c_name || '  ') AS trim_v,
        |  c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS concat_ws_v,
        |  substring(c_name, 1, 8) AS substr_v,
        |  left(c_name, 4) AS left_v,
        |  right(c_name, 4) AS right_v,
        |  strpos(c_name, '#') AS instr_v,
        |  replace(c_name, '0', 'o') AS replace_v,
        |  repeat(c_mktsegment, 2) AS repeat_v,
        |  reverse(c_mktsegment) AS reverse_v,
        |  split_part(c_name, '#', 2) AS split_part_v,
        |  CAST(starts_with(c_name, 'Customer') AS INTEGER) AS startswith_v,
        |  CAST(c_mktsegment LIKE '%RY' AS INTEGER) AS endswith_v,
        |  ascii(c_mktsegment) AS ascii_v,
        |  upper(c_mktsegment[1:1]) || lower(substring(c_mktsegment, 2)) AS initcap_v,
        |  CASE WHEN c_mktsegment LIKE '%G' THEN c_mktsegment
        |       ELSE c_mktsegment || 'G' END AS append_v
        |FROM customer ORDER BY c_custkey""".stripMargin),

    "fn_regex" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .select(
            $"c_custkey",
            $"c_name".rlike("[0-9]{9}$").cast("int").as("rlike_v"),
            regexp_extract($"c_name", "#([0-9]+)", 1).as("extract_v"),
            regexp_replace($"c_name", "[05]", "_").as("regex_replace_v"),
            array_join(expr("regexp_extract_all(c_name, '[0-9]', 0)"), "").as("extract_all_v"),
            (!$"c_mktsegment".rlike("^A")).cast("int").as("not_rlike_v"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey,
        |  CAST(regexp_matches(c_name, '[0-9]{9}$') AS INTEGER) AS rlike_v,
        |  regexp_extract(c_name, '#([0-9]+)', 1) AS extract_v,
        |  regexp_replace(c_name, '[05]', '_', 'g') AS regex_replace_v,
        |  array_to_string(regexp_extract_all(c_name, '[0-9]', 0), '') AS extract_all_v,
        |  CAST(NOT regexp_matches(c_mktsegment, '^A') AS INTEGER) AS not_rlike_v
        |FROM customer ORDER BY c_custkey""".stripMargin),

    "fn_date" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("year_v"),
            quarter($"o_orderdate").as("quarter_v"),
            month($"o_orderdate").as("month_v"),
            dayofmonth($"o_orderdate").as("day_v"),
            (dayofweek($"o_orderdate") - 1).as("dow_v"),
            dayofyear($"o_orderdate").as("doy_v"),
            to_date($"o_orderdate").as("date_v"),
            date_add(to_date($"o_orderdate"), 31).as("date_add_v"),
            date_sub(to_date($"o_orderdate"), 7).as("date_sub_v"),
            datediff(lit("1999-01-01").cast("date"), to_date($"o_orderdate")).as("datediff_v"),
            date_trunc("month", $"o_orderdate").cast("date").as("trunc_month_v"),
            last_day($"o_orderdate").as("last_day_v"),
            unix_timestamp($"o_orderdate").as("epoch_v"),
            DorisFunctions.date_format_mysql($"o_orderdate", "%Y-%m").as("fmt_ym"),
            DorisFunctions.date_format_mysql($"o_orderdate", "%d/%m/%Y %T").as("fmt_dmy"),
            make_date(year($"o_orderdate"), month($"o_orderdate"), lit(1)).as("month_start_v"))
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey,
        |  year(o_orderdate) AS year_v,
        |  quarter(o_orderdate) AS quarter_v,
        |  month(o_orderdate) AS month_v,
        |  day(o_orderdate) AS day_v,
        |  CAST(date_part('dow', o_orderdate) AS INTEGER) AS dow_v,
        |  CAST(date_part('doy', o_orderdate) AS INTEGER) AS doy_v,
        |  CAST(o_orderdate AS DATE) AS date_v,
        |  CAST(o_orderdate AS DATE) + 31 AS date_add_v,
        |  CAST(o_orderdate AS DATE) - 7 AS date_sub_v,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS datediff_v,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS trunc_month_v,
        |  last_day(CAST(o_orderdate AS DATE)) AS last_day_v,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_v,
        |  strftime(o_orderdate, '%Y-%m') AS fmt_ym,
        |  strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS fmt_dmy,
        |  make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start_v
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // MySQL-ish cast semantics: bad input → NULL via try_cast — expressed
    // per-expression (no session-conf mutation: flipping ansi.enabled on the
    // shared session would leak non-ANSI semantics into every later key).
    "fn_cast" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.part(s, dir)
          .select(
            $"p_partkey",
            $"p_partkey".cast("string").as("int_to_str"),
            lit("123").cast("int").as("str_to_int"),
            expr("try_cast(p_name AS INT)").as("bad_to_int"),
            lit("3.25").cast("double").as("str_to_dbl"),
            $"p_size".cast("double").as("int_to_dbl"),
            $"p_retailprice".cast("bigint").as("dbl_to_long"),
            lit("2024-06-15").cast("date").as("str_to_date"),
            $"p_size".cast("boolean").cast("int").as("int_to_bool"))
          .orderBy($"p_partkey")
      },
      """SELECT p_partkey,
        |  CAST(p_partkey AS VARCHAR) AS int_to_str,
        |  TRY_CAST('123' AS INTEGER) AS str_to_int,
        |  TRY_CAST(p_name AS INTEGER) AS bad_to_int,
        |  TRY_CAST('3.25' AS DOUBLE) AS str_to_dbl,
        |  CAST(p_size AS DOUBLE) AS int_to_dbl,
        |  CAST(trunc(p_retailprice) AS BIGINT) AS dbl_to_long,
        |  TRY_CAST('2024-06-15' AS DATE) AS str_to_date,
        |  CAST(CAST(p_size AS BOOLEAN) AS INTEGER) AS int_to_bool
        |FROM part ORDER BY p_partkey""".stripMargin),

    // LARGEINT (Doris int128) boundary semantics on the Decimal(38,0)
    // mapping (SURVEY §1.2 caveat), oracled against DuckDB HUGEINT (a true
    // int128). The two ranges differ: Decimal(38,0) spans ±(10^38-1),
    // int128 spans [-2^127, 2^127-1] ≈ ±1.70e38 — so every Decimal value
    // here is HUGEINT-representable, and the oracle can replay exactly.
    // The documented divergence points, pinned by this key:
    //  * 2v at v=5·10^37 equals 10^38 — the FIRST integer Decimal(38,0)
    //    cannot hold while int128 can: engine yields NULL (try_add), and
    //    the oracle spells that NULL;
    //  * sum(v) = 1.5·10^38 — within int128, beyond Decimal: engine NULL;
    //  * negation: Decimal(38,0) is symmetric (-(10^38-1) is representable,
    //    neg_neg == v always), whereas int128's own edge case -(-2^127)
    //    overflows — UNREACHABLE through this mapping, since -2^127 itself
    //    can't enter a Decimal(38,0) column. That absence IS the caveat.
    "fn_largeint" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val d38 = DecimalType(38, 0)
        // v = (r_regionkey+1)·10^37 built via digits, not arithmetic, so
        // the construction itself can't overflow-adjust precision
        val v = concat(($"r_regionkey" + 1).cast("string"),
          lit("0" * 37)).cast(d38)
        val max38 = lit(new java.math.BigDecimal("9" * 38)).cast(d38)
        val dec = Tables.region(s, dir)
          .select($"r_regionkey", v.as("v"))
          .select(
            $"r_regionkey",
            $"v",
            try_add($"v", $"v").as("dbl_v"), // NULL at v = 5e37
            (-$"v").as("neg_v"),
            (-(-$"v")).as("neg_neg_v"), // total on Decimal — equals v
            (max38 - $"v").as("headroom_v"), // distance to Decimal edge
            ($"v" % lit(97)).cast(d38).as("mod_v"),
            expr("try_sum(v) over ()").as("sum_all_v")) // 1.5e38 -> NULL
        // the int128 arithmetic must actually RUN at DECIMAL(38,0) — the
        // VARCHAR projection below exists only to dodge a comparator hash
        // divergence on physical decimal encodings, so a type regression
        // (some expression silently widening to double or string) must fail
        // here, not vanish behind the cast
        val badTypes = dec.schema.fields.filter(f =>
          f.name != "r_regionkey" && f.dataType != d38)
        require(badTypes.isEmpty,
          s"fn_largeint pre-cast columns must be DECIMAL(38,0): " +
            badTypes.map(f => s"${f.name}: ${f.dataType}").mkString(", "))
        dec.select(
            $"r_regionkey" +: dec.columns.filter(_ != "r_regionkey")
              .map(c => col(c).cast("string").as(c)): _*)
          .orderBy($"r_regionkey")
      },
      // The int128 arithmetic runs in HUGEINT, but every OUTPUT column is
      // rendered as VARCHAR on BOTH engines: two rounds of hash-red showed
      // the driver's hash diverges below the logical type when both sides
      // are DECIMAL(38,0) (Spark's parquet FIXED_LEN_BYTE_ARRAY(16) vs
      // DuckDB's int128 decimal). Scale-0 integer text is representation-
      // unambiguous; NULL stays NULL; the int128-edge semantics (overflow
      // -> NULL via try_*) are unchanged.
      """SELECT r_regionkey,
        |  CAST(CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT) AS VARCHAR) AS v,
        |  CAST(CASE WHEN r_regionkey + 1 >= 5 THEN NULL
        |       ELSE 2 * CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT)
        |  END AS VARCHAR) AS dbl_v,
        |  CAST(-CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT) AS VARCHAR) AS neg_v,
        |  CAST(CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT) AS VARCHAR) AS neg_neg_v,
        |  CAST(CAST('99999999999999999999999999999999999999' AS HUGEINT)
        |    - CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT) AS VARCHAR) AS headroom_v,
        |  CAST(CAST(concat(CAST(r_regionkey + 1 AS VARCHAR), repeat('0', 37)) AS HUGEINT) % 97 AS VARCHAR) AS mod_v,
        |  CAST(NULL AS VARCHAR) AS sum_all_v
        |FROM region ORDER BY r_regionkey""".stripMargin),

    // AES encryption family (Doris aes_encrypt/aes_decrypt,
    // [doris: be/src/util/encryption_util.cpp]). ECB mode with a fixed key
    // so the ciphertext is deterministic (GCM's random IV would break the
    // hash compare — and bench comparability). DuckDB has no AES, so the
    // oracle pins what it CAN replay exactly: the decrypt(encrypt(x)) == x
    // roundtrip as a boolean, and the ciphertext length from PKCS7 padding
    // (16·⌊bytes/16⌋ + 16) — a wrong mode, key handling, or padding breaks
    // one of the two. Plaintext built from short ASCII columns so char
    // length == byte length on both engines.
    "fn_crypto" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val key = lit("0123456789abcdef") // 16-byte AES-128 key
        val plain = concat($"lang", lit(":"), $"source", lit(":"),
          $"doc_id".cast("string"))
        val ct = aes_encrypt(plain.cast("binary"), key.cast("binary"),
          lit("ECB"))
        Tables.documents(s, dir)
          .select(
            $"doc_id",
            plain.as("plain"),
            (aes_decrypt(ct, key.cast("binary"), lit("ECB")).cast("string")
              === plain).as("rt_ok"),
            length(ct).as("ct_len"))
          .orderBy($"doc_id")
      },
      """SELECT doc_id,
        |  lang || ':' || source || ':' || CAST(doc_id AS VARCHAR) AS plain,
        |  true AS rt_ok,
        |  CAST(16 * (strlen(lang || ':' || source || ':'
        |    || CAST(doc_id AS VARCHAR)) // 16) + 16 AS INTEGER) AS ct_len
        |FROM documents ORDER BY doc_id""".stripMargin),

    "fn_json" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select(
            $"event_id",
            get_json_object($"props", "$.k").as("k_str"),
            get_json_object($"props", "$.k").cast("int").as("k_int"),
            (get_json_object($"props", "$.k").cast("int") * 2).as("k_doubled"),
            get_json_object($"props", "$.missing").as("k_missing"),
            from_json($"props", org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_struct"),
            to_json(struct($"event_id".as("id"))).as("json_obj"))
          .orderBy($"event_id")
      },
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
        |  json_extract_string(props, '$.missing') AS k_missing,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
        |  '{"id":' || CAST(event_id AS VARCHAR) || '}' AS json_obj
        |FROM events ORDER BY event_id""".stripMargin),

    // Array set-algebra family (Doris array_union/intersect/except/compact/
    // flatten/sort [doris: be/src/vec/functions/array/]): arrays built
    // per-row from real columns; element order normalized by array_sort on
    // both engines so set-op implementation order can't leak into the hash.
    "fn_array_setops" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val a = array($"n_nationkey", $"n_regionkey", lit(7), lit(7))
        val b = array($"n_regionkey", lit(7), lit(99))
        Tables.nation(s, dir)
          .select(
            $"n_nationkey",
            array_join(array_sort(array_union(a, b)), ",").as("union_v"),
            array_join(array_sort(array_intersect(a, b)), ",").as("inter_v"),
            array_join(array_sort(array_except(a, b)), ",").as("except_v"),
            array_join(array_compact(array($"n_nationkey", lit(null), lit(7))), ",").as("compact_v"),
            array_join(flatten(array(a, b)), ",").as("flat_v"),
            size(array_distinct(a)).as("nd_v"))
          .orderBy($"n_nationkey")
      },
      """SELECT n_nationkey,
        |  array_to_string(list_sort(list_distinct([n_nationkey, n_regionkey, 7, 7])
        |      || list_filter([n_regionkey, 7, 99],
        |           x -> NOT list_contains([n_nationkey, n_regionkey, 7, 7], x))), ',') AS union_v,
        |  array_to_string(list_sort(list_distinct(list_filter([n_nationkey, n_regionkey, 7, 7],
        |      x -> list_contains([n_regionkey, 7, 99], x)))), ',') AS inter_v,
        |  coalesce(array_to_string(list_sort(list_distinct(list_filter([n_nationkey, n_regionkey, 7, 7],
        |      x -> NOT list_contains([n_regionkey, 7, 99], x)))), ','), '') AS except_v,
        |  array_to_string(list_filter([n_nationkey, NULL, 7], x -> x IS NOT NULL), ',') AS compact_v,
        |  array_to_string(list_concat([n_nationkey, n_regionkey, 7, 7],
        |      [n_regionkey, 7, 99]), ',') AS flat_v,
        |  CAST(len(list_distinct([n_nationkey, n_regionkey, 7, 7])) AS INTEGER) AS nd_v
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    // Doris VARIANT schemaless subcolumns (SURVEY §1.2) -> Spark 4
    // VariantType: parse_json once, then typed subcolumn access with
    // variant_get (path + target type), including nested objects, array
    // indexing, a JSON null probe, and a missing path. The variant is built
    // per-row from real columns so the oracle can rebuild the same JSON text.
    // At scale VariantType stores a binary-encoded document (shredded in
    // parquet), so subcolumn reads don't re-parse text per access.
    "fn_variant" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val j = concat(
          lit("{\"meta\":{\"type\":\""), $"event_type",
          lit("\",\"uid\":"), $"user_id",
          lit(",\"n\":null,\"vals\":["), $"value".cast("decimal(14,2)"),
          lit(",1,2]},\"p\":"), $"props", lit("}"))
        Tables.events(s, dir)
          .select($"event_id", parse_json(j).as("v"))
          .select(
            $"event_id",
            variant_get($"v", "$.meta.type", "string").as("vtype"),
            variant_get($"v", "$.meta.uid", "bigint").as("vuid"),
            round(variant_get($"v", "$.meta.vals[0]", "double"), 2).as("v0"),
            variant_get($"v", "$.meta.vals[1]", "int").as("v1"),
            variant_get($"v", "$.p.k", "int").as("pk"),
            variant_get($"v", "$.meta.missing", "string").as("vmissing"),
            is_variant_null(variant_get($"v", "$.meta.n", "variant"))
              .cast("int").as("vnull"))
          .orderBy($"event_id")
      },
      """SELECT event_id,
        |  json_extract_string(j, '$.meta.type') AS vtype,
        |  CAST(json_extract(j, '$.meta.uid') AS BIGINT) AS vuid,
        |  round(CAST(json_extract(j, '$.meta.vals[0]') AS DOUBLE), 2) AS v0,
        |  CAST(json_extract(j, '$.meta.vals[1]') AS INTEGER) AS v1,
        |  CAST(json_extract(j, '$.p.k') AS INTEGER) AS pk,
        |  json_extract_string(j, '$.meta.missing') AS vmissing,
        |  CAST(json_type(j, '$.meta.n') = 'NULL' AS INTEGER) AS vnull
        |FROM (SELECT event_id,
        |    '{"meta":{"type":"' || event_type || '","uid":' || CAST(user_id AS VARCHAR)
        |      || ',"n":null,"vals":[' || CAST(CAST(value AS DECIMAL(14,2)) AS VARCHAR)
        |      || ',1,2]},"p":' || props || '}' AS j
        |  FROM events) t
        |ORDER BY event_id""".stripMargin),

    "fn_array" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.embeddings(s, dir)
          .select(
            $"vec_id",
            size($"embedding").as("dim"),
            round(element_at($"embedding", 1).cast("double"), 6).as("first_v"),
            round(element_at($"embedding", 64).cast("double"), 6).as("last_v"),
            round(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"), 6).as("sum_v"),
            round(array_max($"embedding").cast("double"), 6).as("max_v"),
            round(array_min($"embedding").cast("double"), 6).as("min_v"),
            // stringified via DECIMAL so the driver's pandas compare sees a
            // scalar (lists crash its sort) and both engines print a fixed
            // 4-decimal format (double→string would differ on sci-notation)
            array_join(expr("transform(slice(embedding, 1, 3), x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(10,4)) AS STRING))"), ",").as("head3"),
            expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
            expr("CAST(exists(embedding, x -> x > 0.5) AS INT)").as("has_big"),
            round(expr("aggregate(zip_with(embedding, embedding, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 6).as("self_dot"))
          .orderBy($"vec_id")
      },
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
        |  round(CAST(embedding[64] AS DOUBLE), 6) AS last_v,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum_v,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_v,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_v,
        |  array_to_string(list_transform(embedding[1:3],
        |      x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(10,4)) AS VARCHAR)), ',') AS head3,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  CAST(len(list_filter(embedding, x -> x > 0.5)) > 0 AS INTEGER) AS has_big,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS self_dot
        |FROM embeddings ORDER BY vec_id""".stripMargin),

    // Map + struct construction and access; oracle recomputes the scalars.
    "fn_map" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.nation(s, dir)
          .select(
            $"n_nationkey",
            element_at(map(lit("nk"), $"n_nationkey", lit("rk"), $"n_regionkey"), "nk").as("map_get_v"),
            size(map(lit("nk"), $"n_nationkey", lit("rk"), $"n_regionkey")).as("map_size_v"),
            array_join(map_keys(map(lit("a"), $"n_nationkey", lit("b"), $"n_regionkey")), ",").as("map_keys_v"),
            struct($"n_name".as("name"), $"n_regionkey".as("rk")).getField("name").as("struct_get_v"),
            named_struct(lit("k"), $"n_nationkey", lit("r"), $"n_regionkey").getField("r").as("named_struct_v"))
          .orderBy($"n_nationkey")
      },
      """SELECT n_nationkey,
        |  n_nationkey AS map_get_v,
        |  2 AS map_size_v,
        |  'a,b' AS map_keys_v,
        |  n_name AS struct_get_v,
        |  n_regionkey AS named_struct_v
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    // Hash/encode functions DuckDB shares: md5, sha256, hex, base64, bit ops.
    "fn_hash" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .select(
            $"c_custkey",
            md5($"c_name").as("md5_v"),
            sha2($"c_name", 256).as("sha256_v"),
            hex($"c_custkey").as("hex_v"),
            base64($"c_name".cast("binary")).as("b64_v"),
            bit_count($"c_custkey").as("bitcount_v"),
            shiftleft($"c_nationkey", 2).as("shl_v"),
            shiftright($"c_nationkey", 1).as("shr_v"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey,
        |  md5(c_name) AS md5_v,
        |  sha256(c_name) AS sha256_v,
        |  upper(to_base(c_custkey, 16)) AS hex_v,
        |  to_base64(CAST(c_name AS BLOB)) AS b64_v,
        |  bit_count(c_custkey) AS bitcount_v,
        |  c_nationkey << 2 AS shl_v,
        |  c_nationkey >> 1 AS shr_v
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // Spark-native hashes DuckDB lacks (xxhash64 seed-42, murmur3_x86_32
    // seed-42). The hash VALUES are engine-internal, but two deterministic
    // claims are oracle-pinnable: (a) known-answer vectors — the same four
    // inputs DorisFunctionsSpec pins against spec implementations computed
    // outside Spark — fold into one boolean, so a seed/endianness
    // regression breaks the driver hash; (b) a full-scan distinctness claim
    // per hash, calibrated to its width. Injectivity is only assertable for
    // the 64+-bit hashes (xxhash64/sha1: first birthday collision expected
    // near 2^32 inputs). For the 32-bit hashes (murmur3, crc32) injectivity
    // FAILS by the birthday bound at larger SFs (~150k distinct names at
    // sf1 collide with >90% probability), so those assert a collision
    // BOUND instead: observed collisions ≤ 8 + 10× the n²/2^33 birthday
    // expectation — true at every SF with overwhelming probability, and
    // still exercises the per-row codegen path end-to-end.
    "fn_hash_native" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val vectorsOk =
          xxhash64(lit("")) === lit(-7444071767201028348L) &&
          xxhash64(lit("abcd")) === lit(-6810745876291105281L) &&
          xxhash64(lit("graftengine!")) === lit(8598563098269265208L) &&
          xxhash64(lit("Spark SQL native hash tier....xy")) === lit(-7291813621406054509L) &&
          hash(lit("")) === lit(142593372) &&
          hash(lit("abcd")) === lit(-396302900) &&
          hash(lit("graftengine!")) === lit(-1201531526) &&
          hash(lit("Spark SQL native hash tier....xy")) === lit(-541866192) &&
          crc32(lit("").cast("binary")) === lit(0L) &&
          crc32(lit("abcd").cast("binary")) === lit(3984772369L) &&
          sha1(lit("abcd").cast("binary")) ===
            lit("81fe8bfe87576c3ecb22426f8e57847382917acf") &&
          sha1(lit("graftengine!").cast("binary")) ===
            lit("89b08338f713af8ff3d6d1fbccc86c26fc506f73")
        Tables.customer(s, dir)
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct($"c_name").as("nd_names"),
            countDistinct(xxhash64($"c_name")).as("nd_x"),
            countDistinct(hash($"c_name")).as("nd_m"),
            countDistinct(crc32($"c_name".cast("binary"))).as("nd_c"),
            countDistinct(sha1($"c_name".cast("binary"))).as("nd_s"))
          .select($"n_rows", $"nd_names",
            ($"nd_x" === $"nd_names").as("xxh64_injective"),
            // 32-bit birthday bound: allowed collisions = 8 + 10·n²/2^33
            // (n²/2^33 is the expected count; the 10× + 8 slack makes a
            // false failure vanishingly unlikely at any SF)
            ($"nd_names" - $"nd_m" <=
              lit(8) + $"nd_names" * $"nd_names" / lit(858993459L))
              .as("murmur3_low_collision"),
            ($"nd_names" - $"nd_c" <=
              lit(8) + $"nd_names" * $"nd_names" / lit(858993459L))
              .as("crc32_low_collision"),
            ($"nd_s" === $"nd_names").as("sha1_injective"),
            vectorsOk.as("vectors_ok"))
      },
      """SELECT count(*) AS n_rows, count(DISTINCT c_name) AS nd_names,
        |  true AS xxh64_injective, true AS murmur3_low_collision,
        |  true AS crc32_low_collision, true AS sha1_injective,
        |  true AS vectors_ok
        |FROM customer""".stripMargin),

    // URL parsing; oracle recomputes parts from the construction.
    "fn_url" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val url = concat(lit("https://shop.example.com/seg/"),
          lower($"c_mktsegment"), lit("?cust="), $"c_custkey".cast("string"), lit("&page=2"))
        Tables.customer(s, dir)
          .select(
            $"c_custkey",
            parse_url(url, lit("HOST")).as("host_v"),
            parse_url(url, lit("PROTOCOL")).as("proto_v"),
            parse_url(url, lit("PATH")).as("path_v"),
            parse_url(url, lit("QUERY")).as("query_v"),
            parse_url(url, lit("QUERY"), lit("cust")).as("param_v"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey,
        |  'shop.example.com' AS host_v,
        |  'https' AS proto_v,
        |  '/seg/' || lower(c_mktsegment) AS path_v,
        |  'cust=' || CAST(c_custkey AS VARCHAR) || '&page=2' AS query_v,
        |  CAST(c_custkey AS VARCHAR) AS param_v
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // Doris/MySQL datetime-format shim, fully oracled: date_format_mysql
    // translates MySQL %-codes to Spark's pattern letters; str_to_date
    // parses them back. DuckDB's strftime/strptime use C codes, so the
    // oracle spells the same formats natively (%i -> %M etc.).
    "fn_datetime_shim" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(
            $"o_orderkey",
            DorisFunctions.date_format_mysql($"o_orderdate", "%Y%m%d").as("fmt_ymd"),
            DorisFunctions.date_format_mysql($"o_orderdate", "%H:%i:%s").as("fmt_his"),
            DorisFunctions.date_format_mysql($"o_orderdate", "%d/%m/%Y").as("fmt_dmy"),
            DorisFunctions.str_to_date(
              DorisFunctions.date_format_mysql($"o_orderdate", "%Y-%m-%d %H:%i:%s"),
              "%Y-%m-%d %H:%i:%s").as("roundtrip_ts"),
            DorisFunctions.str_to_date(lit("15/06/2024"), "%d/%m/%Y")
              .cast("date").as("parsed_date"))
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y%m%d') AS fmt_ymd,
        |  strftime(o_orderdate, '%H:%M:%S') AS fmt_his,
        |  strftime(o_orderdate, '%d/%m/%Y') AS fmt_dmy,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS roundtrip_ts,
        |  CAST(strptime('15/06/2024', '%d/%m/%Y') AS DATE) AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // Doris-spelling shim round-trip: inet, money_format, find_in_set,
    // str_to_date (MySQL fmt), split_by_string.
    "fn_doris_shim" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ip = concat_ws(".", lit(10), $"n_regionkey", $"n_nationkey", lit(1))
        Tables.nation(s, dir)
          .select(
            $"n_nationkey",
            DorisFunctions.inet_aton(ip).as("inet_aton_v"),
            DorisFunctions.inet_ntoa(DorisFunctions.inet_aton(ip)).as("inet_roundtrip_v"),
            DorisFunctions.money_format($"n_nationkey" * 1234567.891).as("money_v"),
            DorisFunctions.find_in_set($"n_name", lit("NATION_1,NATION_3,NATION_5")).as("fis_v"),
            DorisFunctions.str_to_date(lit("2024-06-15 10:30:00"), "%Y-%m-%d %H:%i:%s")
              .cast("date").as("std_v"),
            size(DorisFunctions.split_by_string($"n_name", "A")).as("sbs_v"),
            DorisFunctions.null_safe_eq($"n_regionkey", lit(0)).cast("int").as("nse_v"))
          .orderBy($"n_nationkey")
      },
      // fully oracled as of round 3: inet via base-256 arithmetic, money via
      // the DECIMAL/split_part/format('{:,}') spelling (fn_shim_sql)
      """SELECT n_nationkey,
        |  CAST(10 * 16777216 + n_regionkey * 65536 + n_nationkey * 256 + 1
        |       AS BIGINT) AS inet_aton_v,
        |  '10.' || CAST(n_regionkey AS VARCHAR) || '.'
        |        || CAST(n_nationkey AS VARCHAR) || '.1' AS inet_roundtrip_v,
        |  format('{:,}', CAST(split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 1) AS BIGINT))
        |    || '.' || split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 2) AS money_v,
        |  CAST(coalesce(list_position(string_split('NATION_1,NATION_3,NATION_5', ','),
        |                              n_name), 0) AS INTEGER) AS fis_v,
        |  CAST(strptime('2024-06-15 10:30:00', '%Y-%m-%d %H:%M:%S') AS DATE) AS std_v,
        |  CAST(len(string_split(n_name, 'A')) AS INTEGER) AS sbs_v,
        |  CAST(n_regionkey IS NOT DISTINCT FROM 0 AS INTEGER) AS nse_v
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    // The deterministic (SQL-expressible) slice of the Doris-spelling shim,
    // split out of fn_doris_shim so it hash-compares against DuckDB: strleft/
    // strright, find_in_set, elt, money_format, split_by_string, null-safe
    // eq, ifnull, locate. (inet stays rows-only in fn_doris_shim.)
    "fn_shim_sql" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.nation(s, dir)
          .select(
            $"n_nationkey",
            DorisFunctions.strleft($"n_name", 6).as("sl_v"),
            DorisFunctions.strright($"n_name", 3).as("sr_v"),
            DorisFunctions.find_in_set($"n_name",
              lit("NATION_1,NATION_3,NATION_5")).as("fis_v"),
            DorisFunctions.elt(($"n_regionkey" % 3) + 1,
              lit("a"), lit("b"), lit("c")).as("elt_v"),
            DorisFunctions.money_format(
              round($"n_nationkey" * 1234567.891, 2)).as("money_v"),
            size(DorisFunctions.split_by_string($"n_name", "A")).as("sbs_v"),
            DorisFunctions.null_safe_eq($"n_regionkey", lit(0)).cast("int").as("nse_v"),
            DorisFunctions.ifnull(lit(null).cast("string"), $"n_name").as("ifn_v"),
            DorisFunctions.locate("ION", $"n_name").as("loc_v"))
          .orderBy($"n_nationkey")
      },
      """SELECT n_nationkey,
        |  substr(n_name, 1, 6) AS sl_v,
        |  substr(n_name, -3, 3) AS sr_v,
        |  CAST(coalesce(list_position(string_split('NATION_1,NATION_3,NATION_5', ','),
        |                              n_name), 0) AS INTEGER) AS fis_v,
        |  (['a', 'b', 'c'])[(n_regionkey % 3) + 1] AS elt_v,
        |  format('{:,}', CAST(split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 1) AS BIGINT))
        |    || '.' || split_part(CAST(CAST(round(n_nationkey * 1234567.891, 2)
        |        AS DECIMAL(18,2)) AS VARCHAR), '.', 2) AS money_v,
        |  CAST(len(string_split(n_name, 'A')) AS INTEGER) AS sbs_v,
        |  CAST(n_regionkey IS NOT DISTINCT FROM 0 AS INTEGER) AS nse_v,
        |  coalesce(CAST(NULL AS VARCHAR), n_name) AS ifn_v,
        |  CAST(instr(n_name, 'ION') AS INTEGER) AS loc_v
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    // Bit-manipulation family (Doris bitand/bitor/bitxor/bitnot/bit_shift_*
    // [doris: be/src/vec/functions/function_bit.cpp] -> Spark operators /
    // shiftleft/shiftright, all codegen'd).
    "fn_bitops" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.part(s, dir)
          .select(
            $"p_partkey",
            ($"p_partkey".bitwiseAND(255L)).as("band_v"),
            ($"p_partkey".bitwiseOR(4096L)).as("bor_v"),
            ($"p_partkey".bitwiseXOR($"p_size")).as("bxor_v"),
            bitwise_not($"p_partkey").as("bnot_v"),
            shiftleft($"p_partkey", 3).cast("long").as("shl_v"),
            shiftright($"p_partkey", 2).cast("long").as("shr_v"),
            bit_count($"p_partkey").as("bcnt_v"))
          .orderBy($"p_partkey")
      },
      """SELECT p_partkey,
        |  p_partkey & 255 AS band_v,
        |  p_partkey | 4096 AS bor_v,
        |  xor(p_partkey, p_size) AS bxor_v,
        |  ~p_partkey AS bnot_v,
        |  p_partkey << 3 AS shl_v,
        |  p_partkey >> 2 AS shr_v,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS bcnt_v
        |FROM part ORDER BY p_partkey""".stripMargin),

    // IPv4 family, fully oracled (the round-trip is reconstructible in SQL:
    // aton = dotted-quad base-256 expansion, ntoa(aton(ip)) = ip).
    "fn_inet" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ip = concat_ws(".", lit(10), $"n_regionkey", $"n_nationkey", lit(1))
        Tables.nation(s, dir)
          .select(
            $"n_nationkey",
            DorisFunctions.inet_aton(ip).cast("long").as("aton_v"),
            DorisFunctions.inet_ntoa(DorisFunctions.inet_aton(ip)).as("roundtrip_v"))
          .orderBy($"n_nationkey")
      },
      """SELECT n_nationkey,
        |  CAST(10 * 16777216 + n_regionkey * 65536 + n_nationkey * 256 + 1
        |       AS BIGINT) AS aton_v,
        |  '10.' || CAST(n_regionkey AS VARCHAR) || '.'
        |        || CAST(n_nationkey AS VARCHAR) || '.1' AS roundtrip_v
        |FROM nation ORDER BY n_nationkey""".stripMargin)
  )
}
