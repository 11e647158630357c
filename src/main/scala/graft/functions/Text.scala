package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. All pure Catalyst built-ins (whole-stage-codegen'd, no UDFs),
  * so they stay inside WholeStageCodegen spans in the hot path.
  */
object Text {

  /** Whitespace tokens, empties dropped. Previously
    * `filter(split(c, " "), t => t =!= "")`; now the native codegen'd
    * [[WsTokens]] — same value (spec-pinned element-for-element in
    * TextExpressionsSpec), one byte scan instead of a per-row regex
    * split plus an interpreted ArrayFilter lambda walk. */
  def tokens(c: Column): Column = TextExpressions.wsTokens(c)

  /** dd15/pp17's canonicalizer seam. ASCII mode (default) is the
    * cross-engine fold the oracle replays byte-for-byte (lowercase, every
    * non-[a-z0-9] run → one space, trim). `unicode = true` swaps in the
    * production pipeline on the SAME column shape: NFKC first (fullwidth
    * → ASCII, ligatures decomposed, combining sequences composed — the
    * native [[NfkcNormalize]] expression, codegen'd), then lowercase,
    * then every non-letter/digit run (Unicode classes, so é survives as a
    * letter instead of splitting) → one space. This approximates NFKC
    * casefold as NFKC→toLowerCase — full NFKC_CF needs ICU, which is not
    * a declared dependency; the difference is confined to locale-special
    * casings (dotless-i family), documented rather than hidden.
    * Oracle-exempt by design (DuckDB has no NFKC); UnicodeCanonSpec pins
    * it with hand-built fixtures, golden-style like F1–F25. */
  def canonical(c: Column, unicode: Boolean = false): Column =
    if (unicode)
      trim(regexp_replace(lower(NfkcNormalize(c)), "[^\\p{L}\\p{N}]+", " "))
    else
      trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Word n-grams (space-joined) over a token array; < n tokens → empty.
    * Previously `when(size ≥ n, transform(sequence(0, size−n), i =>
    * concat_ws(" ", element_at(toks, i+1)…))).otherwise(array())` — and
    * because Catalyst does NO subexpression elimination inside lambda
    * bodies, a composed `wordNGrams(tokens(text), 2)` re-ran the whole
    * split+filter per `element_at`, i.e. O(tokens²) per document (the
    * same trap [[shingles]] documents). Now the native codegen'd
    * [[WordNGrams]]: same value including the null contracts
    * (spec-pinned in TextExpressionsSpec), one fused pass. */
  def wordNGrams(toks: Column, n: Int): Column =
    TextExpressions.wordNGrams(toks, n)

  private def shingleArr(t: String, n: Int): Array[String] = {
    if (t == null) return Array.empty
    val toks = t.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Array.empty
    else (0 to toks.length - n).iterator
      .map(i => toks.slice(i, i + n).mkString(" ")).distinct.toArray
  }

  private val shingleUdfs: Map[Int, org.apache.spark.sql.expressions.UserDefinedFunction] =
    (1 to 8).map(n => n -> udf((t: String) => shingleArr(t, n))).toMap

  private val seedPrefixes: Array[Array[Byte]] =
    (0 until 8).map(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  private def minhash8Arr(t: String): Array[Long] = {
    val sh = shingleArr(t, 3)
    if (sh.isEmpty) null
    else {
      val mins = Array.fill(8)(Long.MaxValue)
      var j = 0
      while (j < sh.length) {
        val bytes = sh(j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        while (i < 8) {
          val f = graft.functions.Md5Fold32.fold2(seedPrefixes(i), bytes)
          if (f < mins(i)) mins(i) = f
          i += 1
        }
        j += 1
      }
      mins
    }
  }
  // asNondeterministic: semantically the UDF IS deterministic (the oracle
  // replays it), but the marker stops the optimizer from inlining the call
  // into every consumer projection/filter — collapse would re-run the
  // whole shingle+digest pass per signature column (perf trap #2).
  private val minhash8Udf = udf((t: String) => minhash8Arr(t)).asNondeterministic()

  /** The word-3gram shingle set as a plain array — for row-local scorers
    * that fold over it in one UDF pass (streaming contamination). */
  private[graft] def shingleSet(t: String): Array[String] = shingleArr(t, 3)

  /** The 4 LSH band keys of a [[minhashSigs]] array, as array<string>:
    * `bkey(b) = md5(sig(2b) || ":" || sig(2b+1))` — THE band-key formula;
    * every derivation site (batch sigBandsLocal, streaming docBands) must
    * use this helper so batch/stream bucket parity can never drift. */
  def bandKeys(sigs: Column): Column =
    array((0 until 4).map(b =>
      md5(concat_ws(":", sigs(2 * b), sigs(2 * b + 1)))): _*)

  /** All 8 MinHash signature minima of the text's word-3gram shingle set
    * in ONE row-local pass — `sig(i) = min over shingles of
    * md5_fold32("i:" + shingle)`, element-for-element identical to the
    * exploded `groupBy(doc).agg(min(...)×8)` aggregation, but with no
    * explode (no ~300× row blowup) and NO SHUFFLE: signatures and band
    * keys become plain projected columns, so the first exchange of any
    * LSH pipeline is the band-bucket join itself. Null for docs with no
    * shingles (such docs simply vanish from the explode path too). */
  def minhashSigs(text: Column): Column = minhash8Udf(text)

  /** Distinct word n-gram shingle set of a text column.
    *
    * Implemented as a Scala UDF, deliberately: the pure-Catalyst form
    * (`array_distinct(transform(sequence…, element_at(tokens…)))`) defeats
    * subexpression elimination inside the lambda, re-running split+filter
    * per gram — O(tokens²) per document, measured 14× slower at sf0.1.
    * The UDF is one linear pass. Output set is identical. */
  def shingles(text: Column, n: Int = 3): Column = {
    require(n >= 1 && n <= 8,
      s"shingles: n must be in 1..8 (pre-built UDF table), got $n")
    shingleUdfs(n)(text)
  }

  /** Stopword ratio for the language-ID heuristic. NULL for a zero-token
    * doc (ANSI division would throw; DuckDB's x/0 is NULL — aligned). */
  def stopwordRatio(toks: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
      nullif(size(toks), lit(0))
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set (near-identical docs with shuffled wording collide). */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))
}
