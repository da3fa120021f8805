package graft.sql

import graft.functions.DorisFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Doris/MySQL SQL-text dialect front-end (SURVEY §3.1 step 1).
  *
  * A Palo user's first touch is SQL text in the MySQL dialect
  * ([doris: fe/.../qe/ConnectProcessor.java] parses it behind the MySQL wire
  * protocol — the protocol itself is out of scope here, SURVEY §3). Spark
  * SQL's dialect already accepts most of that surface verbatim, backtick
  * quoting included; this rewriter closes the documented deltas that show up
  * in real Doris queries as a pure text→text pass in front of `spark.sql` —
  * the same layering as Doris' own FE parser, minus everything Spark already
  * speaks. Every rewrite lands on codegen'd builtins; no UDFs are introduced,
  * so dialect queries keep the exact plans their ANSI spellings get.
  *
  * Covered deltas:
  *  - MySQL `%`-datetime formats inside `date_format`/`str_to_date`
  *    (translated with the same table as [[DorisFunctions.date_format_mysql]];
  *    `str_to_date` itself becomes `to_timestamp`)
  *  - `group_concat([DISTINCT] x [ORDER BY x] [SEPARATOR 's'])` and the
  *    two-arg `group_concat(x, 's')` →
  *    `concat_ws(s, sort_array(collect_list|collect_set(x)))`. The collected
  *    values are always emitted value-sorted: an unordered group_concat is
  *    nondeterministic in Doris too, so the ORDER-BY-the-value spelling is
  *    the only oracle-able semantics (an ORDER BY over a different expr is
  *    passed through unsupported rather than silently mis-sorted)
  *  - MySQL `LIMIT offset, count` → `LIMIT count OFFSET offset`
  *  - name/arity shims Spark lacks as SQL spellings: `money_format(x)` →
  *    `format_number(CAST(x AS DOUBLE), 2)`, `strleft`/`strright` →
  *    `left`/`right`
  *
  * Parsing notes: function calls are located with a quote- and
  * backtick-aware scan and their arguments split at top-level commas only
  * (nested calls keep their commas), so rewrites never fire inside string
  * literals or quoted identifiers. Limitation (documented, not needed by
  * the covered dialect): a rewritable call nested inside an argument of a
  * call to the SAME function is left untouched.
  */
object DorisSqlDialect {

  /** Run Doris-dialect SQL text against the session. */
  def sql(s: SparkSession, dorisSql: String): DataFrame = s.sql(rewrite(dorisSql))

  /** Doris/MySQL SQL text → Spark SQL text. */
  def rewrite(sql0: String): String = {
    var t = sql0
    t = joinHints(t)
    t = rewriteCalls(t, "date_format", {
      case Seq(x, Lit(f)) if f.contains('%') =>
        s"date_format($x, '${DorisFunctions.translateDateFormat(f)}')"
      case args => s"date_format(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "str_to_date", {
      case Seq(x, Lit(f)) =>
        s"to_timestamp($x, '${DorisFunctions.translateDateFormat(f)}')"
      case args => s"str_to_date(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "group_concat", groupConcat)
    // Doris 2.1 AGG_STATE combinators ([doris: be/src/vec/agg_functions
    // combinator _state/_merge/_union suffixes]): states here are the
    // ALGEBRAIC representation each aggregate already exposes — sum/count
    // states are the running value (partial-agg-friendly, exact), avg is a
    // (sum, count) struct — so the combinators are pure rewrites onto
    // codegen'd built-ins; no opaque serialized blob, no UDAF.
    //   _state: produce a mergeable state from raw values
    //   _union: combine states into a state (the AGGREGATE-table merge)
    //   _merge: combine states and FINALIZE to the aggregate's value
    for ((fn, sp) <- Seq("sum" -> "sum", "count" -> "count",
        "min" -> "min", "max" -> "max"))
      t = rewriteCalls(t, s"${fn}_state", {
        case Seq(x) => s"$sp($x)"
        case args => s"${fn}_state(${args.mkString(", ")})"
      })
    for ((fn, sp) <- Seq("sum" -> "sum", "count" -> "sum",
        "min" -> "min", "max" -> "max"); suf <- Seq("merge", "union"))
      t = rewriteCalls(t, s"${fn}_$suf", {
        case Seq(x) => s"$sp($x)"
        case args => s"${fn}_$suf(${args.mkString(", ")})"
      })
    t = rewriteCalls(t, "avg_state", {
      case Seq(x) =>
        s"named_struct('s', sum(CAST(($x) AS DOUBLE)), 'c', count($x))"
      case args => s"avg_state(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "avg_union", {
      case Seq(x) => s"named_struct('s', sum(($x).s), 'c', sum(($x).c))"
      case args => s"avg_union(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "avg_merge", {
      case Seq(x) => s"(sum(($x).s) / sum(($x).c))"
      case args => s"avg_merge(${args.mkString(", ")})"
    })
    // pre-round HALF_UP before formatting: Doris/MySQL money rounds .xx5
    // away from zero, Spark's format_number is HALF_EVEN — round(x, 2)
    // carries the HALF_UP step (exactly on DECIMAL inputs, which is what
    // Spark SQL parses money literals as), format_number only groups digits
    t = rewriteCalls(t, "money_format", {
      case Seq(x) => s"format_number(round($x, 2), 2)"
      case args => s"money_format(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "strleft", {
      case Seq(x, n) => s"left($x, $n)"
      case args => s"strleft(${args.mkString(", ")})"
    })
    t = rewriteCalls(t, "strright", {
      case Seq(x, n) => s"right($x, $n)"
      case args => s"strright(${args.mkString(", ")})"
    })
    limitOffset(t)
  }

  /** Extractor: a single-quoted SQL string literal (no embedded quotes). */
  private object Lit {
    def unapply(s: String): Option[String] = {
      val t = s.trim
      if (t.length >= 2 && t.head == '\'' && t.last == '\'' &&
          !t.substring(1, t.length - 1).contains('\''))
        Some(t.substring(1, t.length - 1))
      else None
    }
  }

  // body of a group_concat call: [DISTINCT] expr [ORDER BY expr] [SEPARATOR 'sep']
  private val GcParts =
    """(?is)^\s*(DISTINCT\s+)?(.*?)(\s+ORDER\s+BY\s+(.*?))?(\s+SEPARATOR\s+'([^']*)')?\s*$""".r

  private def groupConcat(args: Seq[String]): String = {
    val (body, sepFromArg) =
      if (args.length == 2) (args.head, Lit.unapply(args(1)))
      else (args.mkString(","), None)
    body match {
      case GcParts(distinct, expr, _, orderExpr, _, sepKw) =>
        // only the value-ordered semantics is deterministic; an ORDER BY over
        // anything else is out of the supported dialect — pass through so it
        // fails loudly in the parser instead of silently mis-sorting
        if (orderExpr != null && orderExpr.trim != expr.trim)
          s"group_concat(${args.mkString(", ")})"
        else {
          val sep = sepFromArg.orElse(Option(sepKw)).getOrElse(",")
          val collect =
            if (distinct != null) s"collect_set($expr)" else s"collect_list($expr)"
          s"concat_ws('$sep', sort_array($collect))"
        }
      case _ => s"group_concat(${args.mkString(", ")})"
    }
  }

  private def limitOffset(sql: String): String =
    sql.replaceAll("(?i)\\bLIMIT\\s+(\\d+)\\s*,\\s*(\\d+)", "LIMIT $2 OFFSET $1")

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // Doris bracket join hint in the FROM clause: JOIN [broadcast|shuffle]
  // t [alias] — the alias is captured because Spark resolves relation
  // hints against the ALIAS when one is declared
  private val BracketJoinRe =
    ("""(?is)\bJOIN\s*\[\s*(broadcast|shuffle)\s*\]\s*`?(\w+)`?""" +
      """(\s+(?:AS\s+)?(?!ON\b|USING\b|WHERE\b|GROUP\b|ORDER\b|LIMIT\b|""" +
      """HAVING\b|JOIN\b|LEFT\b|RIGHT\b|FULL\b|INNER\b|CROSS\b|SEMI\b|""" +
      """ANTI\b|UNION\b)`?(\w+)`?)?""").r
  // join-ORDER hints Spark's CBO has no equivalent for — stripped with a log
  private val OrderHintRe =
    """(?is)/\*\+\s*(LEADING|ORDERED|SET_VAR)\s*(\([^)]*\))?\s*\*/""".r

  /** Doris join hints ([doris: fe/.../analysis — `JOIN [broadcast]` /
    * `JOIN [shuffle]` distribution markers; `/*+ LEADING(...) */` order
    * hint]):
    *  - bracket markers translate to Spark's relation-level join-strategy
    *    hints, injected into the nearest SELECT — `[broadcast]` →
    *    `BROADCAST(t)` (replicate the marked side), `[shuffle]` →
    *    `SHUFFLE_HASH(t)` (Doris "shuffle" = both sides hash-partitioned,
    *    Spark's shuffled hash join). The hint changes the physical BUILD
    *    SIDE only, never results — the oracle replays the plain join.
    *  - LEADING/ORDERED/SET_VAR strip with a log line: Spark's optimizer
    *    owns join order here. Every other block-comment hint spelling
    *    (BROADCAST, SHUFFLE_HASH, MERGE...) is already Spark-native and
    *    passes through untouched. */
  private def joinHints(sql: String): String = {
    var t = OrderHintRe.replaceAllIn(sql, m => {
      log.info(s"ignoring join-order hint ${m.group(1)} " +
        "(Spark's optimizer owns join order)")
      ""
    })
    val hints = scala.collection.mutable.ArrayBuffer.empty[String]
    t = BracketJoinRe.replaceAllIn(t, m => {
      // hint the alias when declared — Spark's hint resolution matches
      // the alias, not the underlying table name, for aliased relations
      val target = Option(m.group(4)).getOrElse(m.group(2))
      hints += (m.group(1).toLowerCase match {
        case "broadcast" => s"BROADCAST($target)"
        case _ => s"SHUFFLE_HASH($target)"
      })
      java.util.regex.Matcher.quoteReplacement(
        s"JOIN ${m.group(2)}${Option(m.group(3)).getOrElse("")}")
    })
    if (hints.isEmpty) t
    else t.replaceFirst("(?is)\\bSELECT\\b",
      java.util.regex.Matcher.quoteReplacement(
        s"SELECT /*+ ${hints.mkString(", ")} */"))
  }

  private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Rewrite every top-level call of `name`: scan is single-quote and
    * backtick aware, the callback receives the top-level-split argument
    * texts and returns the replacement text. */
  private def rewriteCalls(
      sql: String, name: String, f: Seq[String] => String): String = {
    val out = new StringBuilder
    val n = sql.length
    var i = 0
    var inQ = false
    var inBt = false
    while (i < n) {
      val c = sql.charAt(i)
      if (inQ) { out.append(c); if (c == '\'') inQ = false; i += 1 }
      else if (inBt) { out.append(c); if (c == '`') inBt = false; i += 1 }
      else if (c == '\'') { out.append(c); inQ = true; i += 1 }
      else if (c == '`') { out.append(c); inBt = true; i += 1 }
      else if (sql.regionMatches(true, i, name, 0, name.length) &&
          (i == 0 || !isIdentChar(sql.charAt(i - 1)))) {
        var j = i + name.length
        while (j < n && sql.charAt(j).isWhitespace) j += 1
        if (j < n && sql.charAt(j) == '(') {
          val (args, end) = splitArgs(sql, j + 1)
          if (end < 0) { out.append(c); i += 1 } // unbalanced — leave verbatim
          else { out.append(f(args)); i = end }
        } else { out.append(c); i += 1 } // longer identifier / not a call
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Split a call's arguments at top-level commas, starting just past the
    * opening paren. Returns (args, index past the closing paren), or
    * (Nil, -1) when unbalanced. */
  private def splitArgs(sql: String, from: Int): (Seq[String], Int) = {
    val args = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var depth = 1
    var i = from
    var inQ = false
    while (i < sql.length && depth > 0) {
      val c = sql.charAt(i)
      if (inQ) { args.last.append(c); if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; args.last.append(c)
        case '(' => depth += 1; args.last.append(c)
        case ')' => depth -= 1; if (depth > 0) args.last.append(c)
        case ',' if depth == 1 => args.append(new StringBuilder)
        case ch => args.last.append(ch)
      }
      i += 1
    }
    if (depth != 0) (Nil, -1) else (args.map(_.toString.trim).toSeq, i)
  }
}
