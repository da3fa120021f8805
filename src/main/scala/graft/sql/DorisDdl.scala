package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Doris DDL/DML STATEMENT front-end (SURVEY §3.1 steps 1-2, §1.1): the
  * text surface a Palo user actually drives the key-model layer with —
  * `CREATE TABLE ... (DUPLICATE|UNIQUE|AGGREGATE) KEY ... PARTITION BY
  * RANGE ... DISTRIBUTED BY HASH(col) BUCKETS n`, `INSERT INTO ...
  * VALUES | SELECT`, `DELETE FROM ... WHERE`, `ALTER TABLE ... DROP
  * PARTITION`, and `SELECT` (including Doris partition selection `FROM t
  * PARTITION (p)`) — parsed here the way the FE's generated parser does
  * ([doris: fe/fe-core/src/main/cup/sql_parser.cup], ~7k grammar; key
  * models [doris: fe/.../catalog/KeysType.java]; range partitions
  * [doris: fe/.../analysis/PartitionDesc.java]; versioned deletes
  * [doris: fe/.../load/DeleteHandler.java]).
  *
  * Execution is Spark-first and reuses the semantics the engine already
  * ships rather than re-implementing them:
  *  - a table = a parquet dir of versioned rowsets (`_ver` column per
  *    load, exactly the KeyModels layout); `DISTRIBUTED BY HASH(c)
  *    BUCKETS n` = `repartition(n, c)` before the write, so each load
  *    lands ≤ n files per partition — the tablet layout;
  *  - `PARTITION BY RANGE` = a CASE-chain partition-name column feeding
  *    `partitionBy`, so a range partition IS a directory: DROP PARTITION
  *    is the O(1) file op model_partition_drop pins, partition selection
  *    is a partition-pruned scan, and a row beyond the last bound fails
  *    the load loudly via `raise_error` (Doris rejects such loads);
  *  - merge-on-read per key model: DUPLICATE = plain scan, UNIQUE = one
  *    row_number window on the key by `_ver` desc, AGGREGATE =
  *    groupBy(keys) with SUM/MAX/MIN/REPLACE column aggregates — the
  *    same single-shuffle plans as the model_* keys;
  *  - `DELETE FROM ... WHERE` records a VERSIONED predicate (no data
  *    touched — broadcast metadata compiled into the read filter via
  *    KeyModels.applyDeletePredicates), so rows loaded after the delete
  *    survive even when they match it;
  *  - SELECT text goes through [[DorisSqlDialect]] (expression shims)
  *    and `spark.sql` over the merge-on-read temp views, so statements
  *    compose freely with base tables and keep codegen'd Catalyst plans.
  *
  * At 100 TB nothing here adds cost over the hand-built model_* keys:
  * the catalog is driver metadata, loads are one repartition-write each,
  * and every read is the one-shuffle merge its key model requires.
  */
final class DorisDdl(s: SparkSession) {
  import DorisDdl._

  private val tables = mutable.LinkedHashMap[String, TableState]()

  /** Execute one statement; Some(result) for SELECT, None for DDL/DML. */
  def execute(sqlText: String): Option[DataFrame] = {
    val t = sqlText.trim.stripSuffix(";").trim
    val up = t.toUpperCase
    if (up.startsWith("CREATE TABLE")) { createTable(t); None }
    else if (up.startsWith("INSERT INTO")) { insertInto(t); None }
    else if (up.startsWith("DELETE FROM")) { deleteFrom(t); None }
    else if (up.startsWith("ALTER TABLE")) { alterTable(t); None }
    else Some(select(t))
  }

  /** Execute a SELECT (or any statement returning rows). */
  def sql(sqlText: String): DataFrame =
    execute(sqlText).getOrElse(sys.error(
      s"statement returns no rows: ${sqlText.take(60)}"))

  /** Run a script of ';'-separated statements; returns the last SELECT. */
  def script(statements: String*): DataFrame =
    statements.flatMap(st => execute(st)).lastOption.getOrElse(
      sys.error("script contained no SELECT"))

  // ---------------------------------------------------------------- CREATE

  private val CreateRe =
    """(?is)^CREATE\s+TABLE\s+`?(\w+)`?\s*\((.*)""".r

  private def createTable(text: String): Unit = text match {
    case CreateRe(name, rest0) =>
      val (colsText, afterCols) = untilMatchingParen(rest0)
      val rest = afterCols.trim
      val up = rest.toUpperCase
      val keysType =
        if (up.contains("UNIQUE KEY")) "UNIQUE"
        else if (up.contains("AGGREGATE KEY")) "AGGREGATE"
        else "DUPLICATE"
      val keyCols = clauseParen(rest, """(?is)\b(?:DUPLICATE|UNIQUE|AGGREGATE)\s+KEY\s*\(""")
        .map(topLevelSplit(_).map(stripIdent))
        .getOrElse(sys.error(s"CREATE TABLE $name: missing KEY clause"))
      val cols = topLevelSplit(colsText).map(parseColDef)
      // Doris invariant: key columns lead the schema, value aggregates only
      // after them; REPLACE/SUM/… markers are only legal on AGGREGATE tables
      require(cols.map(_.name).startsWith(keyCols),
        s"$name: KEY($keyCols) must be a prefix of the column list")
      if (keysType != "AGGREGATE")
        require(cols.forall(_.agg.isEmpty),
          s"$name: column aggregate markers require AGGREGATE KEY")
      else cols.foreach { c =>
        require(keyCols.contains(c.name) == c.agg.isEmpty,
          s"$name: value column ${c.name} needs an aggregate marker (SUM/MAX/MIN/REPLACE)")
      }
      val partSpec = clauseParen(rest, """(?is)\bPARTITION\s+BY\s+RANGE\s*\(""")
        .map { inner =>
          val pc = stripIdent(inner.trim)
          val specs = clauseParen(rest.substring(up.indexOf("PARTITION BY RANGE")),
            """(?is)RANGE\s*\([^)]*\)\s*\(""")
            .getOrElse(sys.error(s"$name: PARTITION BY RANGE needs partition specs"))
          (pc, topLevelSplit(specs).map(parsePartition))
        }
      val hashCol = clauseParen(rest, """(?is)\bDISTRIBUTED\s+BY\s+HASH\s*\(""")
        .map(x => stripIdent(x.trim))
        .getOrElse(sys.error(s"$name: missing DISTRIBUTED BY HASH"))
      val buckets = """(?is)\bBUCKETS\s+(\d+)""".r.findFirstMatchIn(rest)
        .map(_.group(1).toInt).getOrElse(10)
      partSpec.foreach { case (pc, specs) =>
        require(cols.exists(_.name == pc), s"$name: unknown partition column $pc")
        require(specs.map(_.name).distinct.size == specs.size,
          s"$name: duplicate partition names")
        require(specs.init.forall(_.bound.isDefined),
          s"$name: only the last partition may be MAXVALUE")
      }
      require(tables.synchronized(!tables.contains(name)),
        s"table $name already exists")
      val st = TableState(
        TableDef(name, cols, keysType, keyCols,
          partSpec.map(_._1), partSpec.map(_._2).getOrElse(Nil),
          hashCol, buckets),
        graft.TempDirs.create(s"graft_ddl_$name"))
      tables.synchronized { tables(name) = st }
    case _ => sys.error(s"unparseable CREATE TABLE: ${text.take(80)}")
  }

  private def parseColDef(text: String): ColDef = {
    val m = """(?is)^\s*`?(\w+)`?\s+(\w+(?:\s*\([^)]*\))?)\s*(.*)$""".r
      .findFirstMatchIn(text)
      .getOrElse(sys.error(s"unparseable column def: $text"))
    val rest = m.group(3).trim
    val aggRe = """(?is)^(SUM|MAX|MIN|REPLACE)\b""".r
    val agg = aggRe.findFirstMatchIn(rest).map(_.group(1).toUpperCase)
    val default = """(?is)\bDEFAULT\s+"([^"]*)"|\bDEFAULT\s+'([^']*)'""".r
      .findFirstMatchIn(rest)
      .map(mm => Option(mm.group(1)).getOrElse(mm.group(2)))
    ColDef(m.group(1), sparkType(m.group(2)), agg, default)
  }

  /** Doris type name → Spark SQL DDL type (SURVEY §1.2 mapping). */
  private def sparkType(t: String): String = {
    val base = t.takeWhile(_ != '(').trim.toUpperCase
    base match {
      case "DATETIME" => "TIMESTAMP"
      case "VARCHAR" | "CHAR" | "STRING" | "TEXT" => "STRING"
      case "LARGEINT" => "DECIMAL(38,0)"
      case "DECIMAL" | "DECIMALV3" => "DECIMAL" + t.dropWhile(_ != '(')
      case b => b // BOOLEAN TINYINT SMALLINT INT BIGINT FLOAT DOUBLE DATE
    }
  }

  // PARTITION pname VALUES LESS THAN ('lit') | (MAXVALUE)
  private val PartRe =
    """(?is)^\s*PARTITION\s+`?(\w+)`?\s+VALUES\s+LESS\s+THAN\s*\(\s*(?:'([^']*)'|(MAXVALUE))\s*\)\s*$""".r

  private def parsePartition(text: String): PartDef = text match {
    case PartRe(name, lit, _) => PartDef(name, Option(lit))
    case _ => sys.error(s"unparseable partition spec: $text")
  }

  // ---------------------------------------------------------------- INSERT

  private val InsertRe =
    """(?is)^INSERT\s+INTO\s+`?(\w+)`?\s*(\(([^)]*)\))?\s*(VALUES\s+.*|SELECT\s+.*)$""".r

  private def insertInto(text: String): Unit = text match {
    case InsertRe(name, _, colList, body) =>
      val t = state(name)
      val src =
        if (body.toUpperCase.startsWith("VALUES")) {
          val targets = Option(colList)
            .map(topLevelSplit(_).map(stripIdent))
            .getOrElse(t.def_.cols.map(_.name))
          s.sql(s"SELECT * FROM ($body) AS v(${targets.mkString(", ")})")
        } else DorisSqlDialect.sql(s, body) match {
          case df =>
            Option(colList).map(topLevelSplit(_).map(stripIdent)) match {
              case Some(ts) => df.toDF(ts: _*)
              case None => df.toDF(t.def_.cols.map(_.name): _*)
            }
        }
      load(t, src)
    case _ => sys.error(s"unparseable INSERT: ${text.take(80)}")
  }

  /** One load = one versioned rowset: missing columns filled from their
    * DEFAULT (NULL absent one), every column cast to its declared type,
    * range-partition name assigned (or the load rejected), bucketed by
    * the distribution column, appended. */
  private def load(t: TableState, src: DataFrame): Unit = {
    val ver = t.synchronized { t.nextVer += 1; t.nextVer }
    val present = src.columns.toSet
    val aligned = src.select(t.def_.cols.map { c =>
      (if (present.contains(c.name)) col(c.name)
       else lit(c.default.orNull)).cast(c.sparkType).as(c.name)
    }: _*)
    val withPart = t.def_.partCol match {
      case Some(pc) =>
        aligned.withColumn("_p", partitionName(t.def_, col(pc)))
      case None => aligned
    }
    val out = withPart.withColumn("_ver", lit(ver))
      .repartition(t.def_.buckets, col(t.def_.hashCol))
    val w = out.write.mode("append")
    (if (t.def_.partCol.isDefined) w.partitionBy("_p") else w).parquet(t.dir)
    registerViews(t)
  }

  /** Range-partition assignment as a CASE chain over the declared bounds;
    * a row beyond the last bound kills the load job (Doris rejects it). */
  private def partitionName(d: TableDef, c: Column): Column = {
    val typed = (s: String) => lit(s).cast(
      d.cols.find(_.name == d.partCol.get).get.sparkType)
    val base: Column = d.parts.last.bound match {
      case None => lit(d.parts.last.name) // MAXVALUE partition
      case Some(_) => raise_error(concat(
        lit(s"${d.name}: no partition for value "), c.cast("string")))
    }
    d.parts.init.foldRight(
      d.parts.last.bound.fold(base)(b => when(c < typed(b), d.parts.last.name).otherwise(base))) {
      (p, acc) => when(c < typed(p.bound.get), p.name).otherwise(acc)
    }
  }

  // ---------------------------------------------------------------- DELETE

  private val DeleteRe = """(?is)^DELETE\s+FROM\s+`?(\w+)`?\s+WHERE\s+(.*)$""".r

  private def deleteFrom(text: String): Unit = text match {
    case DeleteRe(name, pred) =>
      val t = state(name)
      require(t.def_.keysType != "AGGREGATE",
        s"$name: DELETE WHERE is not supported on AGGREGATE tables (Doris restriction)")
      val ver = t.synchronized { t.nextVer += 1; t.nextVer }
      t.synchronized { t.deletes += ((DorisSqlDialect.rewrite(pred), ver)) }
      registerViews(t)
    case _ => sys.error(s"unparseable DELETE: ${text.take(80)}")
  }

  // ----------------------------------------------------------------- ALTER

  private val DropPartRe =
    """(?is)^ALTER\s+TABLE\s+`?(\w+)`?\s+DROP\s+PARTITION\s+`?(\w+)`?$""".r

  private def alterTable(text: String): Unit = text match {
    case DropPartRe(name, pname) =>
      val t = state(name)
      require(t.def_.parts.exists(_.name == pname),
        s"$name: unknown partition $pname")
      // the O(1) metadata op: a range partition IS a directory
      val doomed = java.nio.file.Paths.get(t.dir, s"_p=$pname")
      if (java.nio.file.Files.exists(doomed))
        java.nio.file.Files.walk(doomed)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      registerViews(t)
    case _ => sys.error(s"unsupported ALTER: ${text.take(80)}")
  }

  // ---------------------------------------------------------------- SELECT

  private def select(text: String): DataFrame = {
    tables.synchronized(tables.values.toSeq).foreach(registerViews)
    // Doris partition selection: FROM t PARTITION (p) → the partition-
    // restricted view (a partition-PRUNED scan, filtered before the merge
    // window — sound because the partition column is part of the key)
    val rewritten = tables.synchronized(tables.keys.toSeq).foldLeft(text) {
      (acc, name) =>
        (s"""(?is)\\b$name\\s+PARTITIONS?\\s*\\(\\s*`?(\\w+)`?\\s*\\)""").r
          .replaceAllIn(acc, m => s"${name}__part_${m.group(1)}")
    }
    DorisSqlDialect.sql(s, rewritten)
  }

  /** Merge-on-read view of the current visible data, per key model; the
    * versioned delete predicates apply BEFORE the merge (a deleted old
    * version must not shadow-win; a post-delete reload must survive). */
  private def visible(t: TableState, part: Option[String]): DataFrame = {
    var df = s.read.parquet(t.dir)
    part.foreach(p => df = df.filter(col("_p") === p))
    df = graft.operators.KeyModels.applyDeletePredicates(
      df, t.synchronized(t.deletes.toSeq).map { case (p, v) => (expr(p), v) })
    val d = t.def_
    val merged = d.keysType match {
      case "DUPLICATE" => df
      case "UNIQUE" =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(d.keyCols.map(col): _*).orderBy(col("_ver").desc)
        df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      case "AGGREGATE" =>
        val aggs = d.cols.filter(_.agg.isDefined).map { c =>
          (c.agg.get match {
            case "SUM" => sum(col(c.name))
            case "MAX" => max(col(c.name))
            case "MIN" => min(col(c.name))
            case "REPLACE" => max_by(col(c.name), col("_ver"))
          }).cast(c.sparkType).as(c.name)
        }
        df.groupBy(d.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    merged.select(d.cols.map(c => col(c.name)): _*)
  }

  private def registerViews(t: TableState): Unit = {
    // a created-but-never-loaded table has no rowsets to read yet; its
    // first load registers it
    if (Option(new java.io.File(t.dir).list()).forall(_.isEmpty)) return
    visible(t, None).createOrReplaceTempView(t.def_.name)
    t.def_.parts.foreach { p =>
      visible(t, Some(p.name))
        .createOrReplaceTempView(s"${t.def_.name}__part_${p.name}")
    }
  }

  private def state(name: String): TableState =
    tables.synchronized(tables.getOrElse(name,
      sys.error(s"unknown table $name")))

  // --------------------------------------------------------------- parsing

  private def stripIdent(s0: String): String =
    s0.trim.stripPrefix("`").stripSuffix("`")

  /** Find `re` (which must end at an opening paren) and return the text up
    * to its matching close paren. */
  private def clauseParen(text: String, re: String): Option[String] =
    re.r.findFirstMatchIn(text).map(m => untilMatchingParen(text.substring(m.end))._1)

  /** Text up to the paren matching an already-consumed '(' plus the
    * remainder after it. Quote-aware. */
  private def untilMatchingParen(text: String): (String, String) = {
    var depth = 1; var i = 0; var inQ = false
    while (i < text.length && depth > 0) {
      val c = text.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parens in: ${text.take(60)}")
    (text.substring(0, i - 1), text.substring(i))
  }

  /** Split at top-level commas (quote- and paren-aware). */
  private def topLevelSplit(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer(new StringBuilder)
    var depth = 0; var inQ = false
    text.foreach { c =>
      if (inQ) { out.last.append(c); if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; out.last.append(c)
        case '(' => depth += 1; out.last.append(c)
        case ')' => depth -= 1; out.last.append(c)
        case ',' if depth == 0 => out.append(new StringBuilder)
        case ch => out.last.append(ch)
      }
    }
    out.map(_.toString.trim).filter(_.nonEmpty).toSeq
  }
}

object DorisDdl {
  final case class ColDef(name: String, sparkType: String,
      agg: Option[String], default: Option[String])
  final case class PartDef(name: String, bound: Option[String]) // None = MAXVALUE
  final case class TableDef(name: String, cols: Seq[ColDef], keysType: String,
      keyCols: Seq[String], partCol: Option[String], parts: Seq[PartDef],
      hashCol: String, buckets: Int)
  final case class TableState(def_ : TableDef, dir: String) {
    var nextVer: Long = 0L
    val deletes: mutable.ArrayBuffer[(String, Long)] = mutable.ArrayBuffer()
  }
}
