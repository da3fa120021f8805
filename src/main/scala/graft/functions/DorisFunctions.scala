package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Doris-name compatibility shim (SURVEY.md §2.8, M3).
  *
  * Doris ships several hundred scalar builtins (declared in
  * [doris: gensrc/script/doris_builtins_functions.py], implemented under
  * [doris: be/src/vec/functions/]); Spark covers ~90% under the same names.
  * This object provides the Doris spellings Spark lacks, each as a pure
  * `Column` expression over built-in functions — no UDFs, so everything stays
  * inside whole-stage codegen and is safe in 100 TB hot paths.
  */
object DorisFunctions {

  // ---- datetime format dialect -------------------------------------------
  /** Translate a MySQL/Doris datetime format (e.g. "%Y-%m-%d %H:%i:%s") to
    * the Java DateTimeFormatter pattern Spark uses ("yyyy-MM-dd HH:mm:ss").
    * Covers the specifiers Doris' date_format/str_to_date document.
    */
  def translateDateFormat(mysqlFmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < mysqlFmt.length) {
      val c = mysqlFmt.charAt(i)
      if (c == '%' && i + 1 < mysqlFmt.length) {
        mysqlFmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'c' => sb.append("M")
          case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'H' => sb.append("HH")
          case 'k' => sb.append("H")
          case 'h' | 'I' => sb.append("hh")
          case 'l' => sb.append("h")
          case 'i' => sb.append("mm")
          case 's' | 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'p' => sb.append("a")
          case 'j' => sb.append("DDD")
          case 'a' => sb.append("EEE")
          case 'W' => sb.append("EEEE")
          case 'b' => sb.append("MMM")
          case 'M' => sb.append("MMMM")
          case 'T' => sb.append("HH:mm:ss")
          case '%' => sb.append('%')
          case other => sb.append(other)
        }
        i += 2
      } else {
        // Literal chars that collide with pattern letters must be quoted.
        if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Doris date_format(dt, '%Y-%m-%d') — MySQL format dialect. */
  def date_format_mysql(c: Column, mysqlFmt: String): Column =
    date_format(c, translateDateFormat(mysqlFmt))

  /** Doris str_to_date(str, '%Y-%m-%d') → timestamp. */
  def str_to_date(c: Column, mysqlFmt: String): Column =
    to_timestamp(c, translateDateFormat(mysqlFmt))

  // ---- string spellings ---------------------------------------------------
  /** Doris strleft / strright. */
  def strleft(c: Column, n: Int): Column = substring(c, 1, n)
  def strright(c: Column, n: Int): Column = substring(c, -n, n)

  /** Doris append_trailing_char_if_absent(s, c). */
  def append_trailing_char_if_absent(c: Column, ch: String): Column =
    when(c.endsWith(ch), c).otherwise(concat(c, lit(ch)))

  /** Doris money_format: 1234567.891 → "1,234,567.89". */
  def money_format(c: Column): Column = format_number(c.cast("double"), 2)

  /** Doris split_by_string(s, sep) — literal (non-regex) separator. */
  def split_by_string(c: Column, sep: String): Column =
    split(c, java.util.regex.Pattern.quote(sep))

  /** Doris null-safe equal <=> (also in Spark SQL as <=>). */
  def null_safe_eq(a: Column, b: Column): Column = a <=> b

  // ---- IPv4 ---------------------------------------------------------------
  /** Doris inet_aton / ipv4_string_to_num: dotted quad → long.
    * Pure expression (aggregate over split parts) — codegen-friendly.
    */
  def inet_aton(ip: Column): Column = {
    val parts = split(ip, "\\.")
    element_at(parts, 1).cast("long") * 16777216L +
      element_at(parts, 2).cast("long") * 65536L +
      element_at(parts, 3).cast("long") * 256L +
      element_at(parts, 4).cast("long")
  }

  /** Doris inet_ntoa / ipv4_num_to_string: long → dotted quad. */
  def inet_ntoa(n: Column): Column =
    concat_ws(".",
      (n.cast("long") / 16777216L).cast("long") % 256,
      (n.cast("long") / 65536L).cast("long") % 256,
      (n.cast("long") / 256L).cast("long") % 256,
      n.cast("long") % 256)

  // ---- misc spellings -----------------------------------------------------
  /** Doris ifnull / nvl. */
  def ifnull(a: Column, b: Column): Column = coalesce(a, b)

  /** Doris instr(str, substr) (1-based, 0 when absent) — Spark instr. */
  def locate(sub: String, str: Column): Column = instr(str, sub)

  /** Doris find_in_set(s, "a,b,c") → 1-based index in comma list, 0 if absent. */
  def find_in_set(s: Column, list: Column): Column =
    array_position(split(list, ","), s).cast("int")

  /** Doris elt(n, a, b, ...) — 1-based select. */
  def elt(n: Column, choices: Column*): Column = element_at(array(choices: _*), n)
}
