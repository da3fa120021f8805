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
  * jaccard pair table, the checkpointed bigramDocScore LM artifact the
  * llm_bigram_logprob/llm_perplexity_bucket keys serve) expose only a
  * post-checkpoint LogicalRDD here, so
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
  //   llm_dedup_minhash(_incr), llm_dedup_simhash(_incr)
  //                         — 2-row threshold table non-equi-joined to the
  //                           recall projection
  //   llm_decontaminate     — 1-row × 1-row summary crossJoin
  //   llm_langid            — 5-row broadcast language-profile crossJoin
  //   llm_unigram_logprob   — per-doc aggregates × 1-row corpus-total
  //                           broadcast crossJoin
  //   llm_tfidf, llm_bm25   — scoring stream × 1-row corpus-stats broadcast
  //                           crossJoin (same shape as llm_unigram_logprob)
  //   llm_bigram_logprob    — bigram instance stream × 1-row corpus-total
  //                           broadcast crossJoin (the tfidf/bm25 shape)
  //   llm_match_phrase, llm_match_phrase_prefix, llm_match_phrase_edge
  //                         — corpus × 1-row derived-phrase broadcast
  //                           crossJoin
  //   llm_dsir              — log-ratio table × 1-row corpus-totals
  //                           broadcast crossJoin (the tfidf/bm25 shape)
  //   llm_perplexity_bucket — bigram instance stream × 1-row corpus-total
  //                           broadcast crossJoin (the llm_bigram_logprob
  //                           scorer shared via bigramDocScore)
  //   llm_rrf_fusion        — BM25 stream × 1-row stats crossJoin plus
  //                           corpus × 1-row query-vector crossJoin (the
  //                           llm_knn baseline shape)
  //   sql_ddl_grant         — 1-row data aggregate × 1-row SHOW GRANTS
  //                           summary crossJoin (metadata, not data)
  //   sql_ddl_database      — grouped join result × 1-row SHOW DATABASES
  //                           summary crossJoin (metadata, not data)
  private val bnljAllowed = Set(
    "join_cross", "llm_knn",
    "llm_dedup_minhash", "llm_dedup_minhash_incr",
    "llm_dedup_simhash", "llm_dedup_simhash_incr",
    "llm_decontaminate", "llm_langid", "llm_unigram_logprob",
    "llm_bigram_logprob", "llm_tfidf",
    "llm_bm25", "llm_match_phrase", "llm_match_phrase_prefix",
    "llm_match_phrase_edge", "llm_match_regexp",
    "llm_dsir", "llm_rrf_fusion", "llm_perplexity_bucket", "sql_ddl_grant",
    "sql_ddl_database")

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

  // ---------------------------------------------------------------------
  // Plan-fingerprint regression tripwire: a bench-noise-free detector for
  // "a refactor turned a broadcast into a shuffle". Every batch key's
  // physical plan is canonicalized to its operator-name sequence (exprIds,
  // paths, codegen stage ids stripped; Exchange keeps its partitioning
  // kind so hash↔range↔broadcast repartitioning drift is visible) and
  // diffed against the committed record in
  // src/test/resources/plan_fingerprints.tsv. Shape drift fails the suite
  // with a per-key first-divergence report — no timing involved.
  //
  // INTENTIONAL plan changes (a new key, a deliberate strategy change):
  // regenerate the record with
  //   GRAFT_UPDATE_FINGERPRINTS=1 sbt "testOnly graft.PlanAuditSpec"
  // and commit the diff — the review of that diff IS the shape review.
  // ---------------------------------------------------------------------

  /** Keys whose plan depends on JVM-wide mutable state and is therefore
    * not comparable across differently-ordered runs:
    *   cache_result — first build computes, later builds serve the
    *                  mtime-guarded result cache (that flip is the feature)
    */
  private val fpExcluded = Set("cache_result")

  private val fpPath =
    java.nio.file.Paths.get("src/test/resources/plan_fingerprints.tsv")

  /** Operator-name sequence of a physical plan string: one token per plan
    * line, codegen `*(n)` markers and tree-drawing prefixes stripped;
    * Exchange nodes keep the partitioning kind. */
  private def fingerprint(plan: String): String = {
    val node = """^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9_]*)(.*)$""".r
    plan.linesIterator.collect {
      case node(name, rest) if name != "isFinalPlan" =>
        if (name == "Exchange") {
          val kind = rest.trim.takeWhile(c => c != '(' && c != ',' && c != ' ')
          s"Exchange:$kind"
        } else name
    }.mkString(">")
  }

  private def currentFingerprints(): Seq[(String, String)] =
    SparkEntry.defs.toSeq.sortBy(_._1).collect {
      case (name, d) if !name.startsWith("stream_") && !fpExcluded(name) =>
        name -> fingerprint(d.build(spark, sf).queryExecution.executedPlan.toString)
    }

  test("physical plan fingerprints match the committed record") {
    val current = currentFingerprints()
    if (sys.env.contains("GRAFT_UPDATE_FINGERPRINTS")) {
      java.nio.file.Files.createDirectories(fpPath.getParent)
      java.nio.file.Files.writeString(fpPath,
        current.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n"))
      info(s"regenerated ${current.size} fingerprints at $fpPath")
    } else {
      assert(java.nio.file.Files.exists(fpPath),
        s"no committed fingerprint record at $fpPath — generate one with " +
          "GRAFT_UPDATE_FINGERPRINTS=1")
      val recorded = java.nio.file.Files.readString(fpPath).linesIterator
        .filter(_.nonEmpty).map { l =>
          val Array(k, v) = l.split("\t", 2); k -> v
        }.toMap
      val report = scala.collection.mutable.ArrayBuffer.empty[String]
      current.foreach { case (k, fp) =>
        recorded.get(k) match {
          case None => report += s"$k: NEW KEY (not in record)"
          case Some(old) if old != fp =>
            val (o, n) = (old.split('>'), fp.split('>'))
            val i = o.zip(n).indexWhere { case (a, b) => a != b }
            val at = if (i >= 0) i else math.min(o.length, n.length)
            report += s"$k: drift at node $at: " +
              s"recorded ${o.lift(at).getOrElse("<end>")} vs " +
              s"now ${n.lift(at).getOrElse("<end>")}"
          case _ => ()
        }
      }
      val gone = recorded.keySet -- current.map(_._1).toSet
      gone.foreach(k => report += s"$k: key removed (still in record)")
      assert(report.isEmpty,
        report.mkString(
          "plan-shape drift vs committed record (if INTENTIONAL, " +
            "regenerate with GRAFT_UPDATE_FINGERPRINTS=1 and commit):\n",
          "\n", ""))
    }
  }
}
