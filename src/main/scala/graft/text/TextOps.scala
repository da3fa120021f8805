package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable text-pipeline primitives (SURVEY.md §2.11, BASELINE.json
  * north-star): tokenization, shingling, MinHash signatures, SimHash,
  * embedding math. All pure Column expressions except simhash (one scalar UDF
  * over the token array).
  *
  * Scale notes: every helper is per-row (no shuffle); the dedup/kNN pipelines
  * built on top (operators.LlmText) do exactly one shuffle per logical step
  * (explode→group / band-join) and never collect to the driver. The planted
  * analogue in Doris is the 2.x inverted text index + MATCH predicates
  * ([doris: be/src/olap/rowset/segment_v2/inverted_index_reader.cpp]); here
  * the inverted index is a first-class DataFrame (token → doc posting list).
  */
object TextOps {

  /** Whitespace tokenization, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** w-token shingles ("w-grams of words"), distinct. transform over an index
    * sequence keeps this a single codegen'd expression.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= w,
        transform(sequence(lit(0), size(t) - w),
          i => array_join(slice(t, i + 1, lit(w)), " ")))
        .otherwise(array(array_join(t, " "))))
  }

  /** Imperative shingle UDF for hot dedup paths — same output (values AND
    * first-occurrence order) as the declarative [[shingles]] reference
    * above, one pass, no interpreted HOF tree (see minhashBandsUdf
    * rationale). The equivalence is pinned in LlmSpec over the documents
    * table.
    */
  def shinglesUdf(w: Int) = udf { text: String =>
    // split limit -1 keeps trailing empty tokens — Spark's split (the
    // declarative reference and the DuckDB oracles' string_split) keeps
    // them, Java's default split drops them; without -1 a document with
    // trailing whitespace would shingle differently between the two
    // spellings (ADVICE r20 — latent divergence, pinned in LlmSpec on
    // adversarial whitespace docs)
    val toks = text.toLowerCase.split("\\s+", -1)
    if (toks.length < w) Array(toks.mkString(" ")).distinct
    else Array.tabulate(toks.length - w + 1)(i => toks.slice(i, i + w).mkString(" ")).distinct
  }

  /** md5 digests of the w-token spans of a document, in span order (index =
    * span start i0) — the substring-dedup hot path (llm_dedup_substring*).
    * Same values as the declarative
    * `unhex(md5(array_join(slice(tokens, i+1, w), ' ')))` chain over
    * `transform(sequence(...))` (pinned in LlmSpec), but ONE imperative pass:
    * the HOF lambda tree never enters whole-stage codegen and re-evaluates
    * interpreted per element (the shinglesUdf/minhashBandsUdf rationale).
    * A doc shorter than w tokens contributes its whole text as one span. */
  def spanHashesUdf(w: Int) = udf { text: String => spanHashesFor(text, w) }

  /** Distinct w-token shingles PAIRED with the doc's distinct-shingle count:
    * one UDF evaluation yields both the set-size `n` and the exploded
    * shingle rows (element = (n, shingle)). The r20 shingleDocs spelling
    * `size(arr) + explode(arr)` re-evaluated the shingle UDF twice per row
    * (CollapseProject inlines it into both consumers); emitting the count
    * inside each element removes the second evaluation. Values = exactly
    * [[shinglesUdf]] zipped with its length (pinned in LlmSpec). */
  def shinglesWithNUdf(w: Int) = udf { text: String =>
    val toks = text.toLowerCase.split("\\s+", -1) // -1: see shinglesUdf
    val arr =
      if (toks.length < w) Array(toks.mkString(" ")).distinct
      else Array.tabulate(toks.length - w + 1)(i =>
        toks.slice(i, i + w).mkString(" ")).distinct
    val n = arr.length
    arr.map(s => (n, s))
  }

  /** DISTINCT span md5s per document (order of first occurrence) — the
    * detection half of llm_dedup_substring needs only the per-doc span SET,
    * so deduping inside the UDF replaces a whole-frame distinct() — i.e. an
    * exchange on (doc_id, h) — with per-row work. Equality/dedup key is the
    * digest bytes (wrapped for value equality), matching the old
    * frame-level distinct over the unhex(md5(...)) column exactly. */
  def spanHashSetUdf(w: Int) = udf { text: String =>
    val all = spanHashesFor(text, w)
    val seen = scala.collection.mutable.LinkedHashSet
      .empty[scala.collection.immutable.ArraySeq[Byte]]
    all.foreach(a =>
      seen += scala.collection.immutable.ArraySeq.unsafeWrapArray(a))
    seen.iterator.map(_.unsafeArray.asInstanceOf[Array[Byte]]).toArray
  }

  /** Shared imperative body of the two span-hash UDFs above. */
  private def spanHashesFor(text: String, w: Int): Array[Array[Byte]] = {
    val toks = text.toLowerCase.split("\\s+", -1) // -1: see shinglesUdf
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Array[Byte] =
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (toks.length < w) Array(h(toks.mkString(" ")))
    else Array.tabulate(toks.length - w + 1)(i =>
      h(toks.slice(i, i + w).mkString(" ")))
  }

  /** MinHash LSH band keys in ONE pass over the shingle set: for each of
    * bands*rows seeded hash functions take the min over shingles, then fold
    * each band's `rows` minima into one band key. Returns array<long> of
    * length `bands` (index = band id).
    *
    * This is the hot path of MinHash at scale, so it's a single imperative
    * UDF rather than nested higher-order expressions: HOF lambdas
    * (transform/array_min) don't enter whole-stage codegen, and Catalyst's
    * CollapseProject re-inlines the signature expression into every band
    * projection and join side — measured 16x recompute (719 s at sf0.1 vs
    * ~2 s for this UDF).
    */
  def minhashBandsUdf(bands: Int, rows: Int) = udf { shingles: Seq[String] =>
    val k = bands * rows
    val mins = Array.fill(k)(Long.MaxValue)
    shingles.foreach { sh =>
      var i = 0
      while (i < k) {
        val h1 = scala.util.hashing.MurmurHash3.stringHash(sh, 0x100 + i)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(sh, 0x9e3779b9 + i)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    Array.tabulate(bands) { b =>
      var key = 1125899906842597L
      var r = 0
      while (r < rows) { key = key * 31 + mins(b * rows + r); r += 1 }
      key
    }
  }

  /** 64-bit SimHash over a token array (stable MurmurHash3 per token). */
  private def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      // two 32-bit murmur hashes -> one stable 64-bit token hash
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  /** Hamming distance between two 64-bit signatures (pure expression). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Dot product of two float/double arrays — sequential fold, deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native codegen expression (one fused loop; the HOF
    * spelling below runs the lambda interpreter per element). Callers must
    * have run [[graft.functions.CosineSim.register]] on the session. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** The composed higher-order-function spelling — kept as the reference
    * implementation; bit-equality with [[cosine]] is asserted in LlmSpec. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
