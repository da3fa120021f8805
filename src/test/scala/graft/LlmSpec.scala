package graft

import org.apache.spark.sql.functions._

/** LLM-pipeline operator invariants (SURVEY.md §2.11 / M6): LSH recall vs the
  * exact-Jaccard baseline, SimHash properties, IVF recall floor vs brute
  * force, multimodal stub determinism.
  */
class LlmSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("prefix-filtered jaccard = one-shot jaccard (lossless prefix lemma)") {
    import graft.operators.LlmDedup
    val one = LlmDedup.jaccardPairsOneShot(spark, sf, 0.6)
      .select($"i", $"j", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val pre = LlmDedup.jaccardPairsPrefix(spark, sf, 0.6)
      .select($"i", $"j", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(one == pre,
      s"one-shot\\prefix=${(one diff pre).take(3)} prefix\\one-shot=${(pre diff one).take(3)}")
    assert(one.nonEmpty, "degenerate test: no qualifying pairs at t=0.6")
    // interior plan audit (PlanAuditSpec can't see these — the shared pair
    // table is served post-localCheckpoint): both pair plans must be pure
    // equi-join + aggregate shapes, never a cartesian/nested-loop fallback
    Seq(LlmDedup.jaccardPairsOneShot(spark, sf, 0.6),
      LlmDedup.jaccardPairsPrefix(spark, sf, 0.6)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    }
  }

  test("jacobi eigensolver: known-answer 3x3 (analytic eigenpairs, sign-fixed)") {
    import graft.operators.LlmSimilarity
    // [[2,1,0],[1,2,0],[0,0,5]] has eigenvalues {5, 3, 1} with eigenvectors
    // e3, (1,1,0)/√2 and (1,-1,0)/√2; the sign fix (largest-|component|
    // positive, first index on ties) makes the third one (r, -r, 0)
    val (eig, vecs) = LlmSimilarity.jacobiEigen(Array(
      Array(2.0, 1.0, 0.0), Array(1.0, 2.0, 0.0), Array(0.0, 0.0, 5.0)))
    assert(eig.zip(Seq(5.0, 3.0, 1.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-10 }, eig.toSeq)
    val r = 1 / math.sqrt(2)
    assert(math.abs(vecs(0)(2) - 1.0) < 1e-10, vecs(0).toSeq)
    assert(math.abs(vecs(1)(0) - r) < 1e-10 &&
      math.abs(vecs(1)(1) - r) < 1e-10, vecs(1).toSeq)
    assert(math.abs(vecs(2)(0) - r) < 1e-10 &&
      math.abs(vecs(2)(1) + r) < 1e-10, vecs(2).toSeq)
  }

  test("containment pairs contain every jaccard pair at the same threshold") {
    // jaccard(A,B) >= t implies common >= t·(na+nb-common) >= t·na, so both
    // directed containments are >= t: the symmetric measure's qualifying
    // pairs are a SUBSET of the containment key's — the asymmetric measure
    // only ever adds (the short-doc-quoted-in-long-doc cases).
    import graft.operators.LlmDedup
    val cont = LlmDedup.queries("llm_dedup_containment")
      .build(TestSpark.spark, sf)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    val jac = LlmDedup.jaccardPairsAuto(TestSpark.spark, sf, 0.8, w = 5)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(jac.subsetOf(cont), s"jaccard-only=${(jac diff cont).take(3)}")
    assert(cont.nonEmpty, "degenerate test: no containment pairs at t=0.8")
  }

  test("substring clip: clipped docs = detected docs, always strictly shorter") {
    import graft.operators.LlmDedup
    val det = LlmDedup.queries("llm_dedup_substring")
      .build(TestSpark.spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val clip = LlmDedup.queries("llm_dedup_substring_clip")
      .build(TestSpark.spark, sf)
      .select($"doc_id", $"n_before", $"n_after")
      .as[(Long, Long, Long)].collect()
    // the two keys run independent plans over the same dup-span definition,
    // so the affected-document sets must agree exactly; and a doc is only
    // reported because >=1 span (>=1 token) was clipped, so strictly shorter
    assert(clip.map(_._1).toSet == det,
      s"clip-only=${(clip.map(_._1).toSet diff det).take(3)} " +
        s"det-only=${(det diff clip.map(_._1).toSet).take(3)}")
    assert(clip.nonEmpty, "degenerate test: no clipped docs")
    clip.foreach { case (id, b, a) =>
      assert(a < b, s"doc $id: n_after $a !< n_before $b") }
  }

  test("near-dup components: pairs co-grouped, labels are component minima") {
    import graft.operators.LlmDedup
    val labels = LlmDedup.nearDupComponents(spark, sf, 0.6)
      .as[(Long, Long)].collect().toMap
    val pairs = LlmDedup.jaccardPairsOneShot(spark, sf, 0.6)
      .select($"i", $"j").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (i, j) =>
      assert(labels(i) == labels(j), s"pair ($i,$j) split across groups")
    }
    labels.foreach { case (id, comp) =>
      assert(comp <= id && labels(comp) == comp, s"label $comp of $id not canonical")
    }
  }

  test("minhash-LSH candidates recall all jaccard >= 0.9 pairs") {
    // the subset property the llm_dedup_minhash key's oracle freezes as
    // n_caught = n_truth; tested here directly on the candidate pair set
    val exact = run("llm_dedup_jaccard")
      .filter($"jaccard" >= 0.9).select($"i", $"j").as[(Long, Long)].collect().toSet
    val lsh = graft.operators.LlmDedup.minhashCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh),
      s"missed ${exact.diff(lsh).size} of ${exact.size} near-dup pairs")
    assert(exact.nonEmpty, "degenerate test: no jaccard >= 0.9 pairs")
    // and the key's projection must report the banding-contract recall
    // bound satisfied at both thresholds (the subset assertion above pins
    // the stronger zero-miss fact at this SF; the key projects the bound
    // because banding recall is probabilistic by contract at any SF)
    val proj = run("llm_dedup_minhash")
      .as[(Double, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(proj.map(_._1) == Seq(0.9, 0.95))
    proj.foreach { case (t, nTruth, ok) =>
      assert(nTruth > 0 && ok, s"t=$t: recall bound violated ($nTruth truth)")
    }
  }

  test("incremental minhash = full-corpus candidates restricted to delta pairs") {
    // signatures are per-row, so delta-vs-index candidates must EQUAL the
    // full-corpus candidate set restricted to pairs touching a delta doc —
    // the property that makes the persisted band index sound at 100 TB
    import graft.operators.LlmDedup
    val full = LlmDedup.minhashCandidates(spark, sf)
      .filter($"i" % 10 === 0 || $"j" % 10 === 0)
      .as[(Long, Long)].collect().toSet
    val incr = LlmDedup.minhashIncrCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(incr == full,
      s"incr\\full=${(incr diff full).take(3)} full\\incr=${(full diff incr).take(3)}")
    assert(incr.nonEmpty, "degenerate test: no delta-touching candidates")
    // and the key's recall projection reports the contract bound satisfied
    val proj = run("llm_dedup_minhash_incr")
      .as[(Double, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(proj.map(_._1) == Seq(0.9, 0.95))
    proj.foreach { case (t, nTruth, ok) =>
      assert(nTruth > 0 && ok, s"t=$t: recall bound violated ($nTruth truth)")
    }
  }

  test("imperative shingle UDF equals the declarative HOF reference") {
    // shinglesUdf is the hot-path spelling; TextOps.shingles is the
    // declarative reference its doc claims to equal (values and
    // first-occurrence order). Pin the claim for the widths in use.
    import graft.text.TextOps
    Seq(2, 3, 8).foreach { w =>
      val mismatch = Tables.documents(spark, sf)
        .select(TextOps.shingles($"text", w).as("hof"),
          TextOps.shinglesUdf(w)($"text").as("imp"))
        .filter($"hof" =!= $"imp")
        .count()
      assert(mismatch == 0, s"w=$w: $mismatch docs differ")
    }
    // and the (n, shingle)-paired variant behind shingleDocs (r20): values
    // = shinglesUdf zipped with its own length, for the widths in use
    Seq(3, 5).foreach { w =>
      val mismatch = Tables.documents(spark, sf)
        .select(TextOps.shinglesUdf(w)($"text").as("plain"),
          TextOps.shinglesWithNUdf(w)($"text").as("paired"))
        .filter(transform($"paired", z => z.getField("_2")) =!= $"plain" ||
          exists($"paired", z => z.getField("_1") =!= size($"plain")))
        .count()
      assert(mismatch == 0, s"w=$w: $mismatch docs differ in paired variant")
    }
  }

  test("imperative span-hash UDFs equal the declarative md5 chain") {
    // spanHashesUdf/spanHashSetUdf are the r20 hot-path spellings behind
    // llm_dedup_substring(_clip); the declarative chain below is the exact
    // pre-r20 production expression (explode(transform(sequence)) + md5 +
    // distinct). Pin positional values AND the per-doc distinct set.
    import graft.text.TextOps
    val w = 15
    val t = TextOps.tokens($"text")
    val decl = when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => unhex(md5(array_join(slice(t, i + 1, lit(w)), " ")))))
      .otherwise(array(unhex(md5(array_join(t, " ")))))
    val posMismatch = Tables.documents(spark, sf)
      .select(decl.as("hof"), TextOps.spanHashesUdf(w)($"text").as("imp"))
      .filter($"hof" =!= $"imp").count()
    assert(posMismatch == 0, s"$posMismatch docs differ positionally")
    val setMismatch = Tables.documents(spark, sf)
      .select(array_distinct(decl).as("hof"),
        TextOps.spanHashSetUdf(w)($"text").as("imp"))
      .filter($"hof" =!= $"imp").count()
    assert(setMismatch == 0, s"$setMismatch docs differ as distinct sets")
  }

  test("imperative tokenizers equal declarative split on adversarial whitespace") {
    // ADVICE r20 / r20 verdict #4: the imperative UDFs tokenize with Java
    // String.split, which (without limit -1) DROPS trailing empty tokens,
    // while the declarative reference (Spark split) and the DuckDB
    // oracles' string_split KEEP them. The corpus never exercises this;
    // these adversarial docs do — leading / trailing / double whitespace —
    // closing the divergence class for every imperative tokenizer
    // (shinglesUdf, shinglesWithNUdf, spanHashesUdf/spanHashSetUdf,
    // LlmText.bigramsUdf).
    import graft.text.TextOps
    val docs = Seq(
      "plain text with no edge cases at all",
      "trailing space ",
      " leading space",
      "  both  and double  gaps  ",
      "tab\tand newline\nseparators mixed \t ",
      "x", "x ", " ", "a b").toDF("text")
    for (w <- Seq(3, 5)) {
      val m1 = docs.select(TextOps.shingles($"text", w).as("hof"),
        TextOps.shinglesUdf(w)($"text").as("imp"))
        .filter($"hof" =!= $"imp").count()
      assert(m1 == 0, s"shinglesUdf w=$w diverges on whitespace docs")
      val m2 = docs.select(TextOps.shinglesUdf(w)($"text").as("plain"),
        TextOps.shinglesWithNUdf(w)($"text").as("paired"))
        .filter(transform($"paired", z => z.getField("_2")) =!= $"plain" ||
          exists($"paired", z => z.getField("_1") =!= size($"plain")))
        .count()
      assert(m2 == 0, s"shinglesWithNUdf w=$w diverges on whitespace docs")
    }
    val w = 15
    val t = TextOps.tokens($"text")
    val decl = when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => unhex(md5(array_join(slice(t, i + 1, lit(w)), " ")))))
      .otherwise(array(unhex(md5(array_join(t, " ")))))
    val m3 = docs.select(decl.as("hof"),
      TextOps.spanHashesUdf(w)($"text").as("imp"))
      .filter($"hof" =!= $"imp").count()
    assert(m3 == 0, "spanHashesUdf diverges on whitespace docs")
    val m4 = docs.select(array_distinct(decl).as("hof"),
      TextOps.spanHashSetUdf(w)($"text").as("imp"))
      .filter($"hof" =!= $"imp").count()
    assert(m4 == 0, "spanHashSetUdf diverges on whitespace docs")
    // bigramsUdf vs the declarative adjacent-pair spelling over Spark split
    // greatest(...,1) + null-_2 filter instead of sequence(1, size-1)
    // directly: sequence(1, 0) DESCENDS in Spark, it is not empty
    val declBg = expr(
      "filter(transform(sequence(1, greatest(size(tks) - 1, 1)), " +
        "i -> struct(try_element_at(tks, i) as _1, " +
        "try_element_at(tks, i + 1) as _2)), " +
        "p -> p._2 IS NOT NULL)")
    val m5 = docs.select(TextOps.tokens($"text").as("tks"), $"text")
      .select(declBg.as("hof"),
        graft.operators.LlmText.bigramsUdf($"text").as("imp"))
      .filter($"hof" =!= $"imp").count()
    assert(m5 == 0, "bigramsUdf diverges on whitespace docs")
  }

  test("repetition fractions equal brute force") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gramFrac(toks: Array[String], w: Int): Double = {
      val grams = if (toks.length < w) Array(toks.mkString(" "))
        else toks.sliding(w).map(_.mkString(" ")).toArray
      r4(1.0 - grams.distinct.length.toDouble / math.max(toks.length - (w - 1), 1))
    }
    val want = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = t.toLowerCase.split("\\s+")
        (id, toks.length.toLong,
          r4(1.0 - toks.distinct.length.toDouble / toks.length),
          gramFrac(toks, 2), gramFrac(toks, 3))
      }
      .sortBy(r => (-r._5, r._1)).take(25).toSeq
    val got = run("llm_repetition")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == want, s"got.head=${got.headOption} want.head=${want.headOption}")
  }

  test("decontamination plan: eval index broadcasts, corpus side is a semi join") {
    // the 100 TB shape contract: the training corpus must stream through a
    // broadcast LEFT SEMI join against the (tiny) eval shingle index — no
    // shuffle of the corpus, no pair explosion
    val plan = run("llm_decontaminate").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join in:\n$plan")
  }

  test("decontamination equals brute-force shingle overlap") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+")
      if (toks.length < 8) Set(toks.mkString(" "))
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val evalSh = docs.filter(_._1 % 20 == 0).iterator.flatMap(d => sh(d._2)).toSet
    val train = docs.filter(_._1 % 20 != 0)
    val contaminated = train.count(d => sh(d._2).exists(evalSh.contains))
    val row = run("llm_decontaminate").as[(Long, Long, Long, Long)].head()
    assert(row == ((train.length.toLong, (docs.length - train.length).toLong,
      contaminated.toLong, (train.length - contaminated).toLong)), s"$row")
    assert(contaminated > 0, "degenerate test: no contamination at test SF")
  }

  test("simhash blocking is lossless for hamming<=3 over ALL doc pairs") {
    // Brute-force the pigeonhole property at test SF: every pair of docs
    // within hamming<=3 must appear in the 4x16-bit chunk-blocking
    // candidates (the llm_dedup_simhash key pins the same property
    // restricted to the cached truth pairs; this is the unrestricted check,
    // feasible only at sf0.001 where n^2 is small).
    import graft.operators.LlmDedup
    import graft.text.TextOps
    val sigs = Tables.documents(spark, sf)
      .select($"doc_id", TextOps.simhashUdf(TextOps.tokens($"text")).as("sig"))
    val close = sigs.as("x").join(sigs.as("y"), $"x.doc_id" < $"y.doc_id")
      .filter(TextOps.hamming($"x.sig", $"y.sig") <= 3)
      .select($"x.doc_id", $"y.doc_id").as[(Long, Long)].collect().toSet
    val cands = LlmDedup.simhashCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(close.nonEmpty, "degenerate test: no ham<=3 pairs at test SF")
    assert(close.subsetOf(cands),
      s"missed ${(close diff cands).take(5)} of ${close.size}")
    // and the key's projection reports the property as a green boolean
    val proj = run("llm_dedup_simhash")
      .as[(Double, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(proj.map(_._1) == Seq(0.9, 0.95))
    assert(proj.forall(_._3), proj.mkString(", "))
  }

  test("incremental simhash candidates equal full candidates on delta pairs") {
    import graft.operators.LlmDedup
    val full = LlmDedup.simhashCandidates(spark, sf)
      .filter($"i" % 10 === 0 || $"j" % 10 === 0)
      .as[(Long, Long)].collect().toSet
    val incr = LlmDedup.simhashIncrCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(incr == full,
      s"incr\\full=${(incr diff full).take(3)} full\\incr=${(full diff incr).take(3)}")
    assert(incr.nonEmpty, "degenerate test: no delta-touching candidates")
    val proj = run("llm_dedup_simhash_incr")
      .as[(Double, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(proj.map(_._1) == Seq(0.9, 0.95))
    assert(proj.forall(_._3), proj.mkString(", "))
  }

  test("simhash: identical texts collide, near-dups are close") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta")
    ).toDF("id", "text")
      .select($"id", TextOps.simhashUdf(TextOps.tokens($"text")).as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 16)
  }

  test("ivf knn: recall floor vs brute-force knn") {
    val truth = run("llm_knn").select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val ivf = run("llm_knn_ivf").select($"qid", $"nid").as[(Long, Long)].collect().toSet
    // unstructured synthetic embeddings bound nprobe=3 recall; floor at 1/3
    assert(ivf.intersect(truth).size.toDouble / truth.size >= 0.33,
      s"recall ${ivf.intersect(truth).size}/${truth.size}")
  }

  test("trained-centroid ivf: recall floor vs brute, cells from k-means not labels") {
    val truth = run("llm_knn").select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val trained = run("llm_knn_ivf_trained").select($"qid", $"nid")
      .as[(Long, Long)].collect().toSet
    // the same floor as the label-cell variant: these near-isotropic
    // synthetic embeddings bound ANY coarse quantizer (llm_knn_ivf note);
    // what the floor pins is that the trained cells don't DEGRADE the
    // probe pipeline below the label-derived baseline's contract
    assert(trained.intersect(truth).size.toDouble / truth.size >= 0.33,
      s"recall ${trained.intersect(truth).size}/${truth.size}")
    // and the two cell sources are genuinely different partitionings —
    // otherwise this key would be the label variant under a new name
    val labels = run("llm_knn_ivf").select($"qid", $"nid")
      .as[(Long, Long)].collect().toSet
    assert(trained != labels || truth == trained,
      "trained cells reproduced the label cells exactly — suspicious")
  }

  test("pq knn: exact re-rank top-1 hits and recall floor vs brute force") {
    val truth = run("llm_knn").select($"qid", $"nid", $"rank")
      .as[(Long, Long, Long)].collect()
    val pq = run("llm_knn_pq").select($"qid", $"nid")
      .as[(Long, Long)].collect().toSet
    val truthSet = truth.map(t => (t._1, t._2)).toSet
    // structureless synthetic embeddings bound an 8-byte code's fidelity;
    // the exact re-rank stage still has to surface a meaningful fraction
    assert(pq.intersect(truthSet).size.toDouble / truthSet.size >= 0.2,
      s"recall ${pq.intersect(truthSet).size}/${truthSet.size}")
    // every returned neighbor's exact cosine is computed on raw vectors,
    // so any (qid,nid) the two keys share must agree on rank order within
    // the PQ result (re-rank correctness, not quantizer quality)
    val pqRanked = run("llm_knn_pq").select($"qid", $"nid", $"rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    pqRanked.values.foreach { ns =>
      assert(ns.distinct.size == ns.size, s"duplicate neighbors: $ns") }
  }

  test("ivf-pq knn: probe-gate invariant, exact re-rank, chance-floor recall") {
    val truth = run("llm_knn").select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val ivfpq = run("llm_knn_ivfpq").select($"qid", $"nid", $"rank", $"cos4")
      .as[(Long, Long, Long, Double)].collect()
    val got = ivfpq.map(t => (t._1, t._2)).toSet
    // composed losses (nprobe=2 coarse gate × 8-byte codes): on these
    // STRUCTURELESS synthetic embeddings the 2/16-cell gate keeps ~1/8 of
    // the corpus essentially at random (same bound documented at
    // llm_knn_ivf), so chance-level recall is the honest floor here —
    // the algorithm's correctness is pinned by the full oracle replay and
    // the gate/re-rank invariants below, not by quantizer quality the
    // data cannot support
    assert(got.intersect(truth).nonEmpty,
      s"recall ${got.intersect(truth).size}/${truth.size}")
    // IVF gate invariant (recomputed brute force): every returned
    // neighbor's storage cell (argmax centroid cosine, cell-asc tiebreak)
    // is one of its query's top-2 probe cells
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("e"), $"label")
      .as[(Long, Seq[Double], Int)].collect()
    val cents = emb.groupBy(_._3).map { case (l, vs) =>
      val d = vs.head._2.length
      l -> (0 until d).map(i =>
        BigDecimal(vs.map(_._2(i)).sum / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def cellsOf(v: Seq[Double], n: Int) = cents.toSeq
      .map { case (c, ct) => (BigDecimal(cos(v, ct))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, c) }
      .sortBy { case (s, c) => (-s, c) }.take(n).map(_._2).toSet
    val vecOf = emb.map(e => e._1 -> e._2).toMap
    ivfpq.foreach { case (q, n, _, _) =>
      assert(cellsOf(vecOf(n), 1).subsetOf(cellsOf(vecOf(q), 2)),
        s"neighbor $n of query $q escaped the probe gate") }
    // the exact re-rank stage must agree with brute force on every shared
    // pair's cosine (re-rank correctness is exact even when recall isn't)
    val bruteCos = run("llm_knn").select($"qid", $"nid", $"cos4")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    ivfpq.foreach { case (q, n, _, c) =>
      bruteCos.get((q, n)).foreach(b => assert(b == c,
        s"re-rank cosine for ($q,$n): $c != brute $b")) }
    // per query: ranks contiguous from 1, no duplicate neighbors
    ivfpq.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
      assert(rows.map(_._2).distinct.length == rows.length)
    }
  }

  test("match_phrase_edge admits every exact-phrase hit (edge ⊇ phrase)") {
    // the edge query is derived from the SAME top bigram as llm_match_phrase
    // (suffix-3 of word 1, prefix-3 of word 2), and any exact adjacency
    // (w1, w2) trivially satisfies endsWith(s1) && startsWith(p2) — so the
    // exact-phrase doc set must be a subset of the edge doc set
    val phrase = run("llm_match_phrase").select($"doc_id").as[Long].collect().toSet
    val edge = run("llm_match_phrase_edge").select($"doc_id").as[Long].collect().toSet
    assert(phrase.subsetOf(edge),
      s"phrase hits missing from edge: ${phrase -- edge}")
    assert(phrase.nonEmpty, "degenerate corpus: exact phrase matched nothing")
  }

  test("match_regexp: narrowing is lossless and the derived pattern hits its own token") {
    // the pattern ^abc[a-z]*z$ is derived from the top pure-alpha token, so
    // every doc containing that token verbatim must be in the result …
    val topTok = Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokenSet($"text")).as("tok"))
      .filter($"tok".rlike("^[a-z]{6,}$"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok").limit(1).as[(String, Long)].head()._1
    val withTok = Tables.documents(spark, sf)
      .filter(array_contains(graft.text.TextOps.tokenSet($"text"), topTok))
      .select($"doc_id").as[Long].collect().toSet
    val got = run("llm_match_regexp").select($"doc_id").as[Long].collect().toSet
    assert(withTok.subsetOf(got), s"missing: ${withTok -- got}")
    // … and the prefix narrow is lossless vs a full-corpus regex scan
    // (anchored pattern implies the 3-char prefix, so no candidate escapes)
    val rx = "^" + topTok.take(3) + "[a-z]*" + topTok.last + "$"
    val brute = Tables.documents(spark, sf)
      .select($"doc_id", graft.text.TextOps.tokens($"text").as("toks"))
      .filter(exists($"toks", t => t.rlike(rx)))
      .select($"doc_id").as[Long].collect().toSet
    assert(got == brute, s"narrow lost/added docs: ${got.diff(brute)} ${brute.diff(got)}")
  }

  test("domain balance: quota = ceil(sqrt(n)), selection is the top-quota by quality") {
    val bal = run("llm_domain_balance")
      .select($"source", $"n_total", $"quota", $"n_kept", $"sum_kept_ids")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(bal.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    bal.foreach { case (src, nTotal, quota, nKept, sumIds) =>
      val rows = docs(src)
      assert(nTotal == rows.length, s"$src n_total")
      assert(quota == math.ceil(math.sqrt(nTotal.toDouble)).toLong, s"$src quota")
      assert(nKept == math.min(nTotal, quota), s"$src n_kept")
      // brute-force the selection: top-quota by (n_chars desc, doc_id asc)
      val expect = rows.sortBy(r => (-r._3, r._2)).take(quota.toInt).map(_._2).sum
      assert(sumIds == expect, s"$src kept-set checksum")
    }
    // and the rebalance actually flattens: kept-share of the largest domain
    // shrinks vs its raw share (the point of τ=0.5 sampling)
    val rawMax = bal.map(_._2).max.toDouble / bal.map(_._2).sum
    val keptMax = bal.map(_._4).max.toDouble / bal.map(_._4).sum
    assert(keptMax <= rawMax + 1e-9, s"kept share $keptMax vs raw $rawMax")
  }

  test("semdedup: no false drops; cluster blocking recalls within-cell dups") {
    val res = run("llm_semdedup")
      .select($"cell", $"n_vecs", $"n_dropped", $"sum_dropped_ids")
      .as[(Int, Long, Long, Long)].collect()
    assert(res.map(_._2).sum == math.min(500,
      Tables.embeddings(spark, sf).count()), "every sliced vector in a cell")
    // brute-force ALL cos>=0.4 pairs on the slice (no blocking)
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 500)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val brutePartners = (for {
      a <- emb; b <- emb if b._1 < a._1
      if BigDecimal(cos(a._2, b._2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
    } yield a._1).toSet
    // every drop must be a REAL near-dup (blocking can miss, never invent):
    // total drops <= brute drop candidates, and if brute finds none the key
    // must drop none
    val nDropped = res.map(_._3).sum
    assert(nDropped <= brutePartners.size,
      s"dropped $nDropped > brute candidates ${brutePartners.size}")
    // the sum_dropped_ids checksum must be composable from brute partners
    // (cell-blocked drops are a subset of brute drops by id)
    assert(res.map(_._4).sum <= brutePartners.toSeq.sum,
      "drop checksum exceeds the brute-force universe")
  }

  test("semdedup multi-probe: recall dominates single-probe, no false drops") {
    // drops(multiprobe) ⊇ drops(rn=1): any pair sharing the home cell also
    // shares a probe cell (rn=1 ⊆ rn<=2), so single-probe's candidate set
    // embeds in multi-probe's — per-home-cell drop counts must dominate
    val single = run("llm_semdedup")
      .select($"cell", $"n_dropped").as[(Int, Long)].collect().toMap
    val multi = run("llm_semdedup_multiprobe")
      .select($"cell", $"n_vecs", $"n_dropped", $"sum_dropped_ids")
      .as[(Int, Long, Long, Long)].collect()
    multi.foreach { case (cell, _, nd, _) =>
      assert(nd >= single.getOrElse(cell, 0L),
        s"cell $cell: multiprobe dropped $nd < single ${single(cell)}")
    }
    // and it can only drop REAL near-dups (the brute-force universe bounds
    // it from above, same contract as the single-probe test)
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 500)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val brutePartners = (for {
      a <- emb; b <- emb if b._1 < a._1
      if BigDecimal(cos(a._2, b._2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
    } yield a._1).toSet
    val nDropped = multi.map(_._3).sum
    assert(nDropped <= brutePartners.size,
      s"dropped $nDropped > brute candidates ${brutePartners.size}")
    assert(multi.map(_._4).sum <= brutePartners.toSeq.sum,
      "drop checksum exceeds the brute-force universe")
  }

  test("kmeans: Lloyd invariants hold and every vector is assigned") {
    val row = run("llm_kmeans").as[(Long, Boolean, Boolean)].head()
    val n = Tables.embeddings(spark, sf).count()
    assert(row == ((n, true, true)), s"$row vs n=$n")
  }

  test("kmeans assign step: broadcast-BNLJ vs k rows, never corpus×corpus") {
    // PlanAuditSpec can't see this plan (each iteration is materialized via
    // localCheckpoint — its documented blind spot), so the interior
    // assignment join is audited here at its source: the non-equi argmin
    // join must BROADCAST the k-row centroid side, and the corpus side must
    // reach it without any exchange (the only shuffle is the per-vector
    // argmin aggregate AFTER the join — r21: min(struct), not a window).
    import org.apache.spark.sql.expressions.Window
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("e"))
    val cents = vecs.orderBy($"vec_id").limit(4)
      .select((row_number().over(Window.orderBy($"vec_id")) - 1)
        .cast("int").as("cid"), $"e".as("c"))
    val plan = operators.LlmSimilarity.kmeansAssign(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1000))
    assert(!plan.contains("CartesianProduct"), plan.take(1000))
    // exactly one hash exchange: the post-join argmin window on vec_id
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges == Seq("vec_id"),
      s"unexpected exchanges $exchanges:\n${plan.take(1500)}")
  }

  test("langid profile cache: repeat serves the standing artifact, mutation invalidates") {
    // same contract CacheSpec pins for ResultCache: the 5-row profile is
    // served by reference on repeat (no corpus re-shuffle), and a rewritten
    // documents table recomputes instead of serving stale rows
    val dir = TempDirs.create("graft_langsrc")
    Tables.documents(spark, sf).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    GenScale.stamp(dir) // straight copy of current-version data
    val p1 = operators.LlmText.langProfile(spark, dir)
    val p2 = operators.LlmText.langProfile(spark, dir)
    assert(p1 eq p2, "repeat must serve the cached profile object")
    val nLangs = p1.count()
    assert(nLangs > 1, "fixture should carry several languages")
    // mutate: collapse the corpus to one language; bump mtime explicitly so
    // the test is deterministic on coarse-mtime filesystems
    Tables.documents(spark, sf).filter($"lang" === "en")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    new java.io.File(s"$dir/documents.parquet")
      .setLastModified(System.currentTimeMillis() + 5000)
    val p3 = operators.LlmText.langProfile(spark, dir)
    assert(!(p3 eq p1), "source mutation must recompute the profile")
    assert(p3.count() == 1, "recomputed profile must reflect the new corpus")
  }

  test("cosine is 1.0 for self-similarity") {
    import graft.text.TextOps
    graft.functions.CosineSim.register(spark)
    val one = Tables.embeddings(spark, sf).limit(1)
      .select(round(TextOps.cosine($"embedding", $"embedding"), 6).as("c"))
      .as[Double].head()
    assert(one == 1.0)
  }

  test("native cosine_sim expression is bit-identical to the HOF spelling") {
    import graft.text.TextOps
    graft.functions.CosineSim.register(spark)
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 50)
    val both = emb.as("a").crossJoin(emb.as("b"))
      .select(TextOps.cosine($"a.embedding", $"b.embedding").as("native"),
        TextOps.cosineHof($"a.embedding", $"b.embedding").as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("multimodal BMP decode is deterministic, schema-stable, and honors " +
    "the format's padding + bottom-up rows") {
    val a = run("llm_multimodal").collect()
    val b = run("llm_multimodal").collect()
    assert(a.sameElements(b))
    assert(run("llm_multimodal").schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "bpp", "n_bytes", "mean_px", "topleft"))
    // decoded metadata must match the generator formulas row by row —
    // any header/padding/row-order mistake in the decoder shifts these
    a.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 4 + (id % 13).toInt, s"width of doc $id")
      assert(r.getInt(2) == 3 + (id % 7).toInt, s"height of doc $id")
      assert(r.getInt(3) == 24)
      val rowBytes = (3 * r.getInt(1) + 3) & ~3
      assert(r.getInt(4) == 54 + rowBytes * r.getInt(2), s"size of doc $id")
      assert(r.getInt(6) == (id % 256).toInt, s"topleft of doc $id")
    }
  }

  test("exact dedup stats are consistent") {
    val r = run("llm_dedup_exact")
      .as[(Long, Long, Long, Long)].head()
    val (distinct, docs, removed, groups) = r
    assert(docs == Tables.documents(spark, sf).count())
    assert(docs - removed == distinct)
    assert(groups <= removed || removed == 0)
  }

  test("bloom dedup: counts equal the exact path; phase-2 join is bloom-gated") {
    // cross-operator consistency: the two-phase bloom path must land on the
    // SAME exact counts as the join-everything incremental path (bloom can
    // only add false positives, and those are filtered by the confirm join)
    val b = operators.LlmDedup.bloomDedup(spark, sf).collect().head
    val e = run("llm_dedup_incremental").collect().head
    assert(b.getAs[Long]("n_delta") == e.getAs[Long]("n_delta"))
    assert(b.getAs[Long]("n_dup_vs_base") == e.getAs[Long]("n_dup_vs_base"))
    assert(b.getAs[Long]("n_new") ==
      e.getAs[Long]("n_intra_dup") + e.getAs[Long]("n_new_unique"))
    // FP bound on the RAW count (5% of true negatives, 5x margin over the
    // configured 1% fpp) lives HERE, not in the oracle hash: it is a
    // statistical property of the sketch, not replayable SQL (ADVICE r10)
    assert(b.getAs[Long]("n_false_pos") <=
      math.max(1L, (b.getAs[Long]("n_new") * 0.05).toLong),
      s"bloom FP bound violated: ${b.getAs[Long]("n_false_pos")} FPs")
    // plan contract: exactly ONE exact join (the confirm), and both sides
    // of the bloom split are UDF-gated filters — the whole-delta join the
    // operator exists to avoid would show as a second join or an ungated
    // index probe
    val plan = run("llm_dedup_bloom").queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one confirm join, got $joins:\n$plan")
    assert("UDF".r.findAllIn(plan).size >= 2,
      s"bloom probe filters missing from plan:\n$plan")
  }

  test("int8 quantization: per-element error bounded by scale/2, fidelity high") {
    // symmetric round-to-nearest guarantees |v - dequant(quant(v))| <= sc/2
    val bad = Tables.embeddings(spark, sf)
      .withColumn("sc", expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"))
      .withColumn("maxerr", expr(
        "aggregate(zip_with(embedding, " +
          "transform(embedding, x -> round(CAST(x AS DOUBLE) / sc) * sc), " +
          "(a, b) -> abs(CAST(a AS DOUBLE) - b)), " +
          "CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))"))
      .filter($"maxerr" > $"sc" / 2 + 1e-12).count()
    assert(bad == 0L, s"$bad vectors exceed the scale/2 quantization bound")
    val minCos = run("llm_embed_quantize")
      .agg(min($"recon_cos")).as[Double].head()
    assert(minCos >= 0.999, s"int8 reconstruction cosine dropped to $minCos")
  }

  test("llm_tfidf: top-k pushes into the sort and equals a driver brute force") {
    val plan = run("llm_tfidf").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-3 must plan as WindowGroupLimit, not full rank:\n$plan")
    val rows = run("llm_tfidf")
      .as[(Long, String, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // brute force the same scoring on the driver (same JVM Math.log Spark's
    // log codegen calls, so scores are bit-identical, rounding included)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val n = docs.length.toDouble
    val tokd = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val dfm = tokd.flatMap(_._2.distinct).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val exp = tokd.flatMap { case (id, ts) =>
      ts.groupBy(identity).toSeq
        .map { case (tok, occ) => (id, tok, occ.size * math.log(n / dfm(tok))) }
        .sortBy { case (_, tok, sc) => (-sc, tok) }.take(3)
        .map { case (i, tok, sc) => (i, tok,
          BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(rows == exp,
      s"diff=${rows.diff(exp).take(3)} / ${exp.diff(rows).take(3)}")
  }

  test("llm_winnow: equals brute force; shared-run guarantee holds") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fps(text: String): Seq[Long] = {
      val toks = text.split("\\s+")
      val grams = (0 until math.max(toks.length - 3, 1)).map { i =>
        java.lang.Long.parseLong(
          md5hex(toks.slice(i, i + 4).mkString(" ")).take(8), 16)
      }
      (0 until math.max(grams.length - 4, 1))
        .map(j => grams.slice(j, j + 5).min).distinct
    }
    val rows = run("llm_winnow").as[(Long, Int, Int, Long, Long)].collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    docs.foreach { case (id, t) =>
      val f = fps(t)
      val r = rows.find(_._1 == id).get
      assert(r._2 == math.max(t.split("\\s+").length - 3, 1) &&
        r._3 == f.length && r._4 == f.min && r._5 == f.max,
        s"doc $id fingerprint mismatch")
    }
    // the winnowing guarantee: two docs sharing a contiguous run of
    // >= w+k-1 = 8 tokens must share at least one fingerprint
    val run8 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two " + run8 + " tail tokens trailing here"
    assert(fps(run8).intersect(fps(other)).nonEmpty,
      "shared 10-token run produced disjoint fingerprint sets")
    // and the blocked pair key equals the brute-force all-pairs scan
    val bySet = docs.map { case (id, t) => id -> fps(t).toSet }
    val expPairs = (for {
      (i, fi) <- bySet; (j, fj) <- bySet
      if i < j && fi.intersect(fj).nonEmpty
    } yield (i, j)).toSet
    val gotPairs = run("llm_winnow_pairs").as[(Long, Long)].collect().toSet
    assert(gotPairs == expPairs,
      s"pair diff: got-only=${(gotPairs -- expPairs).take(3)} " +
        s"exp-only=${(expPairs -- gotPairs).take(3)}")
  }

  test("llm_chunk: stride-48 windows tile every doc, tails kept, slices exact") {
    val rows = run("llm_chunk").as[(Long, Int, Int, String)].collect()
    val docs = Tables.documents(spark, sf).filter($"doc_id" < 60)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect().toMap
    assert(rows.map(_._1).toSet == docs.keySet, "every doc must chunk")
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs(id).split("\\s+")
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until cs.length), s"doc $id gaps")
      sorted.foreach { case (_, i, n, chunk) =>
        val exp = toks.slice(i * 48, i * 48 + 64)
        assert(n == exp.length && chunk == exp.mkString(" "),
          s"doc $id chunk $i mismatch")
      }
      // the last chunk must reach the document's final token (tail kept)
      assert((sorted.length - 1) * 48 + sorted.last._3 == toks.length,
        s"doc $id tail dropped")
    }
  }

  test("BPE fold expression = reference greedy left-to-right merge " +
    "(property over random words, incl. runs and alternating chains)") {
    import graft.operators.LlmText
    // reference greedy: scan left to right, merge (a,b) when adjacent,
    // consumed symbols never re-match
    def greedy(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val rnd = new scala.util.Random(17)
    val alphabet = Vector("a", "b", "c", "ab", "aa")
    val words: Seq[Seq[String]] =
      Seq("aaaa", "ababab", "aab", "abb", "bab", "aaab", "abab", "a", "")
        .map(_.map(_.toString)) ++
        Seq.fill(200)(Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(5))))
    val pairs = Seq(("a", "b"), ("a", "a"), ("b", "a"), ("a", "ab"), ("ab", "a"))
    for ((a, b) <- pairs) {
      val df = words.zipWithIndex.map { case (w, i) => (i, w) }
        .toDF("id", "syms")
        .select($"id", expr(LlmText.bpeFoldExpr(a, b)).as("merged"))
      val got = df.as[(Int, Seq[String])].collect().toMap
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i) == greedy(w, a, b),
          s"pair ($a,$b) word=$w got=${got(i)} want=${greedy(w, a, b)}")
      }
    }
  }

  test("llm_bpe_train: merge table well-formed; rank-1 merge is the true " +
    "corpus argmax recomputed independently") {
    val rows = run("llm_bpe_train")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.length == 6 && rows.map(_._1).toSeq == (1 to 6))
    rows.foreach { case (_, lhs, rhs, merged, c) =>
      assert(merged == lhs + rhs && c > 0) }
    // independent argmax of iteration 1: adjacent char-pair counts weighted
    // by word frequency, straight over the corpus
    val freq = Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "\\s+")).as("w"))
      .as[String].collect().groupBy(identity).view.mapValues(_.size.toLong)
    val pc = scala.collection.mutable.Map.empty[(String, String), Long]
    freq.foreach { case (w, n) =>
      val syms = w.map(_.toString) :+ "</w>"
      syms.sliding(2).foreach { p =>
        pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + n }
    }
    val best = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
    assert((rows(0)._2, rows(0)._3) == best._1 && rows(0)._5 == best._2,
      s"rank-1 merge ${rows(0)} != independent argmax $best")
  }

  test("llm_bpe_encode: every doc covered; merges only shrink symbol " +
    "counts; at least one word actually compressed") {
    val rows = run("llm_bpe_encode")
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, s"${rows.length} of $nDocs docs encoded")
    rows.foreach { case (id, nWords, nSub, nSym0) =>
      assert(nSub >= nWords, s"doc $id: fewer symbols than words")
      assert(nSub <= nSym0, s"doc $id: merge grew the symbol count")
    }
    assert(rows.exists { case (_, _, nSub, nSym0) => nSub < nSym0 },
      "six merges compressed nothing — degenerate corpus or broken fold")
  }

  test("llm_bpe_fertility: per-language totals tie out against the " +
    "per-doc encode; fertility >= 1 everywhere") {
    val byLang = run("llm_bpe_fertility")
      .as[(String, Long, Long, Double)].collect()
    val langs = Tables.documents(spark, sf).select($"lang").distinct()
      .as[String].collect().toSet
    assert(byLang.map(_._1).toSet == langs)
    byLang.foreach { case (l, nWords, nSub, fert) =>
      assert(nSub >= nWords && fert >= 1.0, s"$l: fertility below 1")
      assert(math.abs(fert - nSub.toDouble / nWords) < 2e-4, s"$l: ratio off")
    }
    val enc = run("llm_bpe_encode")
      .agg(sum($"n_words"), sum($"n_subtokens")).as[(Long, Long)].head()
    assert((byLang.map(_._2).sum, byLang.map(_._3).sum) == enc,
      "fertility totals diverge from the per-doc encode")
  }

  test("BPE model cache: repeat serves the standing artifact, corpus " +
    "mutation retrains (the langProfile/termStats freshness contract)") {
    val dir = TempDirs.create("graft_bpesrc")
    Tables.documents(spark, sf).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    GenScale.stamp(dir)
    val m1 = operators.LlmText.bpeLearned(spark, dir)
    val m2 = operators.LlmText.bpeLearned(spark, dir)
    assert(m1.words eq m2.words, "repeat must serve the cached model")
    assert(m1.merges.size == 6)
    // mutate: keep only the shortest docs — a different corpus, so at
    // least the merge COUNTS must change (pair frequencies shrink);
    // bump mtime explicitly for coarse-mtime filesystems
    Tables.documents(spark, sf).filter($"n_chars" < 200)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    new java.io.File(s"$dir/documents.parquet")
      .setLastModified(System.currentTimeMillis() + 5000)
    val m3 = operators.LlmText.bpeLearned(spark, dir)
    assert(!(m3.words eq m1.words), "source mutation must retrain")
    assert(m3.merges.map(_._5) != m1.merges.map(_._5),
      "retrained merge counts must reflect the shrunken corpus")
  }

  test("llm_perplexity_bucket: per-language terciles balanced, exhaustive " +
    "over scored docs, and score-monotone head >= middle >= tail") {
    val rows = run("llm_perplexity_bucket")
      .as[(String, Int, String, Long, Long, Double, Double)].collect()
    val langs = rows.map(_._1).distinct
    val scoredPerLang = run("llm_bigram_logprob")
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    langs.foreach { l =>
      val bs = rows.filter(_._1 == l).sortBy(_._2)
      assert(bs.map(_._2).toSeq == Seq(1, 2, 3), s"$l: missing tercile")
      assert(bs.map(_._3).toSeq == Seq("head", "middle", "tail"))
      assert(bs.map(_._4).sum == scoredPerLang(l),
        s"$l: buckets don't partition the scored docs")
      assert(bs.map(_._4).max - bs.map(_._4).min <= 1,
        s"$l: ntile terciles unbalanced: ${bs.map(_._4).toSeq}")
      // bucket b's worst score is never below bucket b+1's best (ties may
      // straddle the cut, so >=)
      bs.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._6 >= lo._7,
          s"$l: bucket ${hi._2} min ${hi._6} < bucket ${lo._2} max ${lo._7}")
      }
    }
  }

  test("llm_dsir: weights rank-ordered; selection is target-enriched " +
    "(en fraction above corpus base rate)") {
    val sel = run("llm_dsir").as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(sel.length == 60 && sel.map(_._1).toSeq == (1 to 60))
    assert(sel.sliding(2).forall { case Array(x, y) =>
      x._3 > y._3 || (x._3 == y._3 && x._2 < y._2) }, "rank order broken")
    val langs = Tables.documents(spark, sf).select($"doc_id", $"lang")
      .as[(Long, String)].collect().toMap
    val base = langs.values.count(_ == "en").toDouble / langs.size
    val got = sel.count(r => langs(r._2) == "en").toDouble / sel.length
    assert(got > base,
      f"selection en-fraction $got%.3f not above base rate $base%.3f")
  }

  test("llm_rrf_fusion: fused scores bounded by best-possible dual rank, " +
    "ordered, ids distinct, every row backed by at least one ranker") {
    val rows = run("llm_rrf_fusion")
      .as[(Long, Option[Int], Option[Int], Double)].collect()
    assert(rows.length == 15)
    assert(rows.map(_._1).distinct.length == 15, "duplicate ids")
    assert(rows.sliding(2).forall { case Array(x, y) => x._4 >= y._4 },
      "not ordered by fused score")
    rows.foreach { case (id, rl, rd, rrf) =>
      assert(rl.isDefined || rd.isDefined, s"$id in neither list")
      assert(rl.forall(r => r >= 1 && r <= 30) && rd.forall(r => r >= 1 && r <= 30))
      val want = rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 2e-6, s"$id rrf=$rrf want=$want")
      assert(rrf <= math.rint((2.0 / 61 + 1e-9) * 1e6) / 1e6 + 1e-12)
    }
  }
}
