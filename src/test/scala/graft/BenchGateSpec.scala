package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's contention-divert decision table (r15 verdict #4 + advice:
  * the wall-only gate could never admit a real uniform regression, and a
  * synthetic-slowdown check must prove the fixed gate can). The decision is
  * a pure function so this spec needs no bench run. */
class BenchGateSpec extends AnyFunSuite {

  test("quiet host, no inflation: record run, no divert") {
    assert(!Bench.divert(1.0, Some(1.1), Some(1.05)))
    assert(!Bench.divert(1.0, None, None)) // first run / no record
  }

  test("measured start load diverts regardless of inflation evidence") {
    assert(Bench.divert(2.5, Some(1.0), Some(1.0)))
  }

  test("co-tenant wave: wall inflated, CPU flat -> contention, divert") {
    // the r15-continuation shape: five byte-identical runs at 1.6-2.4x
    // wall; tasks waited for cores, so cpu-ns stayed flat
    assert(Bench.divert(1.2, Some(1.8), Some(1.04)))
    // legacy record without cpu_sec: wall-only rule still protects
    assert(Bench.divert(1.2, Some(1.8), None))
  }

  test("SYNTHETIC UNIFORM REGRESSION: wall AND cpu inflated -> the gate " +
    "ADMITS the run so the record can show it") {
    // a codegen fall-off / interpreted-HOF / per-row-UDF swap slows every
    // key with zero byte growth AND burns the extra time as real CPU:
    // wall 1.9x, cpu 1.8x must reach bench_result.json
    assert(!Bench.divert(1.0, Some(1.9), Some(1.8)))
    // boundary: cpu inflation at exactly the 1.25 threshold is NOT enough
    assert(Bench.divert(1.0, Some(1.9), Some(1.25)))
    assert(!Bench.divert(1.0, Some(1.9), Some(1.26)))
  }
}
