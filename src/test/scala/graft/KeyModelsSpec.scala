package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized property tests for the Doris key-model merge semantics
  * (SURVEY.md §1.1). The driver oracle pins each model at one fixed shape;
  * these fuzz the MERGE RULES themselves against a driver-side brute-force
  * fold over random versioned batches — edge interactions the fixed shapes
  * can't reach (a key whose first-ever row is a delete marker, a partial
  * update arriving before any full row, keys that churn every batch).
  *
  * Semantics under test are exactly the repo's operator definitions:
  *  - UNIQUE + delete sign (model_delete_sign): latest version wins per
  *    key; the key disappears when the winner carries sign=1.
  *  - UNIQUE partial update (model_partial_update): per COLUMN, the latest
  *    non-null version wins (null = column omitted from that load — the
  *    documented emulation of Doris partial_columns, which cannot carry an
  *    explicit NULL).
  */
class KeyModelsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val nKeys = 20
  private val nBatches = 6

  test("unique-key + delete sign: engine merge equals brute-force fold (fuzz)") {
    val rnd = new scala.util.Random(17)
    // batches: each key appears at most once per batch -> version is unique
    // per key by construction (Doris versions are monotone per tablet)
    val rows = for {
      ver <- 1 to nBatches
      key <- 0 until nKeys
      if rnd.nextDouble() < 0.6
    } yield (key.toLong, s"t${rnd.nextInt(3)}", rnd.nextInt(1000).toDouble,
      if (rnd.nextDouble() < 0.15) 1 else 0, ver.toLong)
    val df = rows.toDF("key", "etype", "value", "_sign", "_ver")

    val w = Window.partitionBy($"key").orderBy($"_ver".desc)
    val engine = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"_sign" === 0)
      .select($"key", $"etype", $"value")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2))))
      .toMap

    val brute = rows.groupBy(_._1).flatMap { case (k, versions) =>
      val (_, et, v, sign, _) = versions.maxBy(_._5)
      if (sign == 0) Some(k -> ((et, v))) else None
    }
    assert(engine == brute,
      s"merge mismatch: engine-only=${engine.keySet -- brute.keySet} " +
        s"brute-only=${brute.keySet -- engine.keySet}")
    // the fuzz must actually exercise deletion (a vacuous pass would hide
    // a broken sign filter)
    assert(engine.size < rows.map(_._1).distinct.size,
      "fixture never deleted a key — weaken of the fuzz")
  }

  test("sequence-column merge: engine equals brute-force max-by-(seq,ver) fold (fuzz)") {
    val rnd = new scala.util.Random(31)
    // out-of-order by construction: _seq is random per row while _ver is the
    // batch index, so later batches routinely carry LOWER sequence values —
    // the regime the fixed-shape key samples only six points of. At most one
    // row per key per batch keeps (key,_ver) unique; (seq, ver) ties are
    // therefore impossible and the brute winner is well-defined.
    val rows = for {
      ver <- 1 to nBatches
      key <- 0 until nKeys
      if rnd.nextDouble() < 0.6
    } yield (key.toLong, rnd.nextInt(4).toLong, ver.toLong,
      if (rnd.nextDouble() < 0.2) 1 else 0, rnd.nextInt(1000).toDouble)
    val df = rows.toDF("key", "_seq", "_ver", "_sign", "value")

    val engine = operators.KeyModels.sequenceMerge(df, "key")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val brute = rows.groupBy(_._1).flatMap { case (k, versions) =>
      val (_, _, _, sign, v) = versions.maxBy(r => (r._2, r._3))
      if (sign == 0) Some(k -> v) else None
    }
    assert(engine == brute,
      s"merge mismatch: engine-only=${engine.keySet -- brute.keySet} " +
        s"brute-only=${brute.keySet -- engine.keySet}")
    // the interactions under test must occur in the fixture: some key's
    // winner must NOT be its latest-version row (out-of-order resolution),
    // and some stale delete must lose to a higher-seq live row
    assert(rows.groupBy(_._1).exists { case (_, vs) =>
      vs.maxBy(r => (r._2, r._3))._3 != vs.maxBy(_._3)._3
    }, "no key resolved out of arrival order — weaken of the fuzz")
    assert(rows.groupBy(_._1).exists { case (_, vs) =>
      val winner = vs.maxBy(r => (r._2, r._3))
      winner._4 == 0 && vs.exists(r => r._4 == 1 && r._2 < winner._2)
    }, "no stale delete lost a merge — weaken of the fuzz")
    assert(engine.size < rows.map(_._1).distinct.size,
      "fixture never deleted a key — weaken of the fuzz")
  }

  test("delete predicates: multi-predicate versioned visibility equals brute force (fuzz)") {
    val rnd = new scala.util.Random(47)
    // rows across load versions; several DELETE predicates land at random
    // versions. A row is visible iff no delete with a LATER version matches
    // its type — in particular a row loaded AT or AFTER a matching delete's
    // version must survive (the interaction the fixed-shape key samples one
    // point of, here hit from every side including predicates on the same
    // type at different versions).
    // ~10% NULL etype rows: a predicate evaluating to NULL did NOT match,
    // so the row must stay visible (three-valued logic — without the
    // coalesce in applyDeletePredicates these rows silently vanish)
    val rows = for {
      ver <- 1 to nBatches
      key <- 0 until nKeys
      if rnd.nextDouble() < 0.6
    } yield (key.toLong * 100 + ver,
      if (rnd.nextDouble() < 0.1) null else s"t${rnd.nextInt(3)}", ver.toLong)
    val preds = (0 until 4).map { _ =>
      (s"t${rnd.nextInt(3)}", 1L + rnd.nextInt(nBatches + 1))
    }
    val df = rows.toDF("id", "etype", "_ver")
    val engine = operators.KeyModels.applyDeletePredicates(df,
        preds.map { case (t, v) => (col("etype") === t, v) })
      .select($"id").as[Long].collect().toSet
    val brute = rows.collect {
      case (id, t, ver) if preds.forall { case (dt, dv) => !(t == dt && ver < dv) } => id
    }.toSet
    assert(engine == brute,
      s"visibility mismatch: engine-only=${engine -- brute} brute-only=${brute -- engine}")
    // the fixture must exercise both outcomes: some matching row deleted,
    // and some matching row surviving because it loaded at/after the delete
    assert(rows.exists { case (_, t, ver) =>
      preds.exists { case (dt, dv) => t == dt && ver < dv } },
      "no row was ever deleted — weaken of the fuzz")
    assert(rows.exists { case (id, t, ver) =>
      engine(id) && preds.exists { case (dt, dv) => t == dt && ver >= dv } },
      "no post-delete re-load survived — weaken of the fuzz")
    assert(rows.exists { case (id, t, ver) =>
      t == null && engine(id) && preds.exists { case (_, dv) => ver < dv } },
      "no NULL-typed row in a deletable version survived — weaken of the fuzz")
  }

  test("unique-key partial update: per-column last-non-null equals brute force (fuzz)") {
    val rnd = new scala.util.Random(23)
    // each row carries each value column with prob 0.7 (null = omitted);
    // some keys' FIRST row is already partial — the edge the fixed-shape
    // key never hits
    val rows = for {
      ver <- 1 to nBatches
      key <- 0 until nKeys
      if rnd.nextDouble() < 0.6
    } yield (key.toLong,
      if (rnd.nextDouble() < 0.7) s"t${rnd.nextInt(3)}" else null,
      if (rnd.nextDouble() < 0.7) rnd.nextInt(1000).toDouble: java.lang.Double
      else null,
      ver.toLong)
    val df = rows.toDF("key", "etype", "value", "_ver")

    val w = Window.partitionBy($"key").orderBy($"_ver".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val engine = df
      .select($"key",
        last($"etype", ignoreNulls = true).over(w).as("etype"),
        last($"value", ignoreNulls = true).over(w).as("value"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0),
        (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap

    val brute = rows.groupBy(_._1).map { case (k, versions) =>
      val sorted = versions.sortBy(_._4)
      k -> ((sorted.flatMap(v => Option(v._2)).lastOption,
        sorted.flatMap(v => Option(v._3).map(_.doubleValue)).lastOption))
    }
    assert(engine == brute)
    // the edge cases must be present in the fixture, not just possible
    assert(rows.groupBy(_._1).exists { case (_, vs) =>
      vs.minBy(_._4)._2 == null || vs.minBy(_._4)._3 == null },
      "no key started with a partial row — weaken of the fuzz")
    assert(engine.values.exists(v => v._1.isEmpty || v._2.isEmpty),
      "no merged row kept a never-filled column — weaken of the fuzz")
  }
  test("auto partition: load 2 materializes exactly the late-day partitions") {
    import TestSpark.spark.implicits._
    val rows = run("model_auto_partition")
      .select($"p_day", $"parts_before_load2", $"parts_after_load2")
      .as[(String, Int, Int)].collect()
    val nDays = rows.length
    val (before, after) = (rows.head._2, rows.head._3)
    assert(after == nDays, s"after-load-2 partitions $after != $nDays days")
    assert(before == math.max(1, nDays / 2),
      s"before-load-2 partitions $before != early half of $nDays")
    assert(after > before,
      "load 2 created no partitions — the auto-partition demo degenerated " +
        "(single-day corpus?)")
  }
}
