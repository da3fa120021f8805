package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token counter: number of non-whitespace runs in a string.
  *
  * The composed form `size(split(text, "\\s+"))` allocates the full token
  * array (and per-token UTF8Strings) just to throw it away — at 100 TB of
  * text that's the dominant allocation in stats/quality scoring. This is the
  * SURVEY §2.13 "native C++ UDF" tier ([doris: be/src/udf/udf.h]) done the
  * Spark way: a Catalyst UnaryExpression with doGenCode so the loop inlines
  * into whole-stage codegen with zero allocation.
  *
  * Whitespace = ASCII space/tab/CR/LF (the tokenizer's contract in this
  * engine); counts runs, so leading/trailing/repeated whitespace never
  * produces empty tokens (unlike split()).
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var n = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) n += 1
      inTok = !ws
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val inTok = ctx.freshName("inTok")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int ${ev.value}_n = 0;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  boolean ws = ($b == ' ' || $b == '\\t' || $b == '\\n' || $b == '\\r');
         |  if (!ws && !$inTok) ${ev.value}_n++;
         |  $inTok = !ws;
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  /** Column API — resolves through the FunctionRegistry (public Spark 4
    * route for custom Expressions); call [[register]] on the session first.
    */
  def token_count(c: Column): Column =
    org.apache.spark.sql.functions.call_function("token_count", c)

  /** Register for SQL use: token_count(str). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count", exprs => TokenCount(exprs.head), "built-in")
}
