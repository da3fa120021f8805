package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static hygiene gate over SparkEntry.oracleSql — the two fragility
  * classes that made round 15's only driver-red keys, both invisible to a
  * coarse float compare and both pure oracle-authoring mistakes:
  *
  *  1. HUGEINT sums: DuckDB types `sum(INT)` as int128, which
  *     hash-mismatches Spark's BIGINT even when every value is identical
  *     (the sql_ddl_like failure). House rule: every integer-typed sum in
  *     an oracle is wrapped `CAST(sum(...) AS BIGINT)`.
  *  2. Halfway-prone round(): `round(price * m, d)` where a 2-dp price
  *     times m can land EXACTLY on a rounding boundary (cents * 0.9 ends
  *     in .5 whenever cents ≡ 5 mod 10 — 1,534 true halfway rows at
  *     sf0.01). Spark rounds the shortest-decimal HALF_UP; DuckDB rounds
  *     the binary double — two engines, two answers, a REAL divergence no
  *     checker tweak can paper over (the sql_ddl_generated_col failure).
  *     House rule: a literal multiplier inside round() must have an EVEN
  *     last significant digit (×0.8: cents*8 mod 10 ∈ {0,2,4,6,8}, no
  *     halfway case can exist).
  *
  * Pure text scan, no SparkSession — runs in milliseconds and fails the
  * build the moment a new oracle reintroduces either class.
  */
class OracleHygieneSpec extends AnyFunSuite {

  private val sqls: Map[String, String] = SparkEntry.oracleSql

  test("integer sums are CAST to BIGINT (DuckDB would type them HUGEINT)") {
    // sum(CAST(x AS INT-family)) must itself sit inside CAST( ... AS BIGINT)
    val intSum =
      """(?is)sum\s*\(\s*cast\s*\([^()]*\bas\s+(?:tinyint|smallint|int|integer)\s*\)\s*\)""".r
    val offenders = sqls.flatMap { case (name, sql) =>
      intSum.findAllMatchIn(sql).flatMap { m =>
        val before = sql.substring(0, m.start).replaceAll("\\s+$", "")
        if (before.toLowerCase.endsWith("cast(")) None
        else Some(s"$name: un-CAST integer sum `${m.matched.take(60)}`")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // keys whose round() inputs are NOT fixed-2-dp money values, verified by
  // hand: the money_format shims multiply the INTEGER n_nationkey (0..24)
  // by 1234567.891, and n*891 mod 1000 never equals 500 in that range, so
  // no value sits on a .xx5 boundary despite the multiplier failing the
  // 2-dp-input rule below.
  private val halfwayAllow = Set("fn_shim_sql", "fn_doris_shim", "sql_dialect_shims")

  test("literal multipliers inside round() are halfway-free for 2-dp inputs") {
    // For a 2-dp input c/100 (c integer) times a literal M/10^k, rounded
    // at d digits, the pre-round value is c*M*10^(d-k-2) at the rounding
    // position. With e = d-k-2 >= 0 that is an integer (never halfway).
    // With e < 0 the achievable fractional parts are the multiples of
    // g/10^|e| for g = gcd(M, 10^|e|), which include the fatal 1/2 iff
    // 10^|e|/g is even. (×0.9,d=2: g=1, 10 even → halfway, the r15
    // divergence; ×80,d=0: g=20, 100/20=5 odd → provably safe; ×100,d=0:
    // g=100 → safe; the verdict's suggested ×90 flags too — correctly.)
    val roundCall = """(?is)\bround\s*\(""".r
    def argSpan(sql: String, open: Int): String = {
      var depth = 1
      var i = open
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      sql.substring(open, math.max(open, i - 1))
    }
    def topSplit(args: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0
      var start = 0
      args.zipWithIndex.foreach {
        case ('(', _) => depth += 1
        case (')', _) => depth -= 1
        case (',', i) if depth == 0 => out += args.substring(start, i); start = i + 1
        case _ =>
      }
      out += args.substring(start)
      out.result()
    }
    val mulLit = """\*\s*(\d+(?:\.\d+)?|\.\d+)""".r
    def halfwayProne(lit: String, d: Int): Boolean = {
      val k = if (lit.contains('.')) lit.length - lit.indexOf('.') - 1 else 0
      val m = BigInt(lit.replace(".", ""))
      val e = d - k - 2
      if (e >= 0 || m == 0) false
      else {
        val p10 = BigInt(10).pow(-e)
        (p10 / m.gcd(p10)) % 2 == 0
      }
    }
    val offenders = sqls.filterNot(kv => halfwayAllow(kv._1)).flatMap {
      case (name, sql) =>
        roundCall.findAllMatchIn(sql).flatMap { m =>
          val parts = topSplit(argSpan(sql, m.end))
          val d = parts.lastOption.map(_.trim)
            .filter(x => parts.size > 1 && x.matches("\\d+"))
            .map(_.toInt).getOrElse(0)
          mulLit.findAllMatchIn(parts.head).collect {
            case lm if halfwayProne(lm.group(1), d) =>
              s"$name: multiplier `${lm.matched.trim}` inside round(..., $d) " +
                "can put a 2-dp input EXACTLY on a .5 boundary — Spark " +
                "HALF_UP-on-decimal and DuckDB binary-round then genuinely " +
                "diverge (the r15 sql_ddl_generated_col class). Use a " +
                "halfway-free multiplier (10^|e|/gcd odd, e.g. x80 at d=0) " +
                "or compare integer cents."
          }
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
