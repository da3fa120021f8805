package graft

import graft.functions.TokenCount
import org.apache.spark.sql.functions._

/** Codegen'd TokenCount expression: semantics (non-ws runs) on edge cases,
  * agreement with split-based counting on clean text, and presence inside a
  * WholeStageCodegen span.
  */
class TokenCountSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("counts non-whitespace runs incl. edge cases") {
    TokenCount.register(spark)
    val rows = Seq("", "   ", "a", " a b  c ", "one\ttwo\nthree", "x")
      .toDF("s")
      .select(TokenCount.token_count($"s").as("n"))
      .as[Int].collect().toSeq
    assert(rows == Seq(0, 0, 1, 3, 3, 1))
  }

  test("agrees with size(split) on the documents corpus") {
    TokenCount.register(spark)
    val bad = Tables.documents(spark, sf)
      .select(TokenCount.token_count($"text").as("a"),
        size(split($"text", "\\s+")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(bad == 0)
  }

  test("runs inside whole-stage codegen") {
    TokenCount.register(spark)
    val df = Tables.documents(spark, sf)
      .select(TokenCount.token_count($"text").as("n"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(_.toString.contains("tokencount")),
      df.queryExecution.executedPlan.toString)
    // evaluating must not fall back to interpreted errors
    assert(df.agg(sum($"n")).as[Long].head() > 0)
  }
}
