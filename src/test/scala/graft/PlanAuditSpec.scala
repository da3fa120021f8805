package graft

/** Automated scale-killer sweep over every batch key's PHYSICAL plan.
  *
  * The at-scale failure modes this engine must never regress into are
  * visible in the plan, not the answer: an unintended cartesian product, or
  * a nested-loop join whose build side isn't a deliberately tiny broadcast.
  * Individual keys assert their own positive shapes (pushdown, DPP,
  * broadcast semi, bucketed zero-shuffle); this sweep is the NEGATIVE
  * contract for all of them at once, so a refactor can't silently turn a
  * hash join into an n² plan on any key. Streaming keys are excluded —
  * their build functions execute the stream — and carry their own
  * plan/state assertions in StreamingSpec.
  *
  * KNOWN BLIND SPOT — localCheckpoint: keys that materialize intermediates
  * via localCheckpoint (llm_kmeans's per-iteration assignment, the shared
  * jaccard pair table) expose only a post-checkpoint LogicalRDD here, so
  * their internal join shapes are invisible to this sweep (and building the
  * plan silently executes those checkpoint jobs). Those interior plans are
  * audited at their source instead: LlmSpec asserts the kmeans assign-step
  * plan (intentionally a broadcast-BNLJ against the k-row centroid set) and
  * the jaccard pair plans directly.
  */
class PlanAuditSpec extends SparkSpec {

  // Every key allowed to contain a BroadcastNestedLoopJoin, with the tiny
  // broadcast side that justifies it:
  //   join_cross            — the CROSS JOIN key itself (5×5×5 dims)
  //   llm_knn               — documented baseline: broadcast query set × corpus
  //   llm_embed_neardup     — documented bounded-slice verify stage
  //   llm_dedup_minhash(_incr), llm_dedup_simhash(_incr)
  //                         — 2-row threshold table non-equi-joined to the
  //                           recall projection
  //   llm_decontaminate     — 1-row × 1-row summary crossJoin
  //   llm_langid            — 5-row broadcast language-profile crossJoin
  private val bnljAllowed = Set(
    "join_cross", "llm_knn", "llm_embed_neardup",
    "llm_dedup_minhash", "llm_dedup_minhash_incr",
    "llm_dedup_simhash", "llm_dedup_simhash_incr",
    "llm_decontaminate", "llm_langid")

  test("no batch key plans a cartesian product or an undeclared nested-loop join") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.defs.toSeq.sortBy(_._1).foreach { case (name, d) =>
      if (!name.startsWith("stream_")) {
        val plan = d.build(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          offenders += s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
