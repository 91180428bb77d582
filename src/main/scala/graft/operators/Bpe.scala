package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding tokenizer induction — learn the merge table from
  * the corpus (public recipe: Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units": start from
  * characters, repeatedly merge the most frequent adjacent symbol pair)
  * and segment the corpus under the learned vocabulary. This upgrades
  * the engine's token accounting from the BPE-ish regex to an actual
  * learned subword vocabulary.
  *
  * Spark-first shape (the 100 TB argument): the corpus is scanned ONCE
  * to build the word-frequency vocabulary; every merge iteration runs
  * over that TYPE frame (unique words — orders of magnitude smaller
  * than the corpus), as `nMerges` bounded rounds of
  * pair-count → 1-row argmax → symbol-fold, with an eager
  * localCheckpoint per round to truncate the iterative lineage (the
  * [[Similarity]] Lloyd-rounds discipline; the driver holds exactly one
  * row per round). Segmentation never re-walks documents per token:
  * token counts come from JOINING doc tokens to the merged vocabulary
  * (segment the types, count the tokens — how production tokenizers
  * batch).
  *
  * Determinism + portability: pair counts are exact integer sums;
  * argmax ties break (count DESC, sym_a, sym_b) in both engines; merge
  * application is greedy leftmost non-overlapping — a single
  * `aggregate` fold over the symbol array in Spark, provably equal to
  * DuckDB's `replace` over a control-char-wrapped symbol string (both
  * scan left to right and never re-match inside a replacement). The
  * whole family is oracle-checked via GENERATED SQL (one CTE stage per
  * merge round — the [[TextAnalytics.winnowTuning]] generated-oracle
  * discipline).
  *
  * Deviation, documented: no end-of-word marker (Sennrich's `</w>`) —
  * marker-ful BPE is a pre-transform appending one sentinel symbol per
  * word and changes nothing structural here; the synthetic corpus's
  * whitespace tokens keep the demo registration marker-free.
  */
object Bpe {

  /** Registered-query defaults, interpolated into the generated oracle
    * (repo convention). 8 merges is demo-sized against the synthetic
    * 31-word vocabulary; real tokenizers run 10⁴–10⁵ rounds — each
    * round stays a vocab-sized job, so the knob trades driver rounds,
    * not corpus scans.
    */
  val DefaultMerges = 8

  /** The word-frequency vocabulary with each word as its character
    * symbol array — the type frame every merge round iterates on.
    * Empty tokens (consecutive spaces) are excluded in BOTH engines:
    * they have no characters and would only add a zero-pair row.
    */
  private def vocab(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("tok"), "").as("syms"))

  /** Adjacent symbol pairs of one vocab frame, weighted by word count. */
  private def pairCounts(voc: DataFrame): DataFrame =
    voc.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("sym_a"),
          element_at(col("syms"), i + 1).as("sym_b")))).as("p"))
      .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
      .agg(sum(col("cnt")).as("n"))

  /** Greedy leftmost non-overlapping application of one merge (a, b) →
    * ab to a symbol array: one `aggregate` fold — the lambda variables
    * are bound values, and the input array is consumed exactly once
    * (the [[TextAnalytics.winnowFpArray]] cost rule). Also the
    * streaming segmenter's building block: chaining N of these keeps
    * each fold's input consumed once, so a full merge-table application
    * is N× linear, never multiplicative.
    */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) >= 1 && element_at(acc, -1) === a && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** One learned merge round: (rank, sym_a, sym_b, merged, pair_count). */
  private case class Merge(rank: Int, a: String, b: String, n: Long)

  /** The learned rounds plus the final merged vocabulary — shared by all
    * three registered queries so they cannot desynchronize.
    */
  private def learn(spark: SparkSession, dir: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    var voc = vocab(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val best = pairCounts(voc)
        .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
        .limit(1).collect() // the per-round 1-row driver decision
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, a, b, n)
        val prev = voc
        voc = voc.select(col("cnt"),
          applyMerge(col("syms"), a, b).as("syms")).localCheckpoint()
        prev.unpersist()
        r += 1
      }
    }
    (merges.result(), voc)
  }

  /** The frozen-model export for streaming consumers (the
    * [[Dsir.logRatios]] device): the learned merge pairs in application
    * order, as driver values a stateless gate can compile into its
    * per-row expression.
    */
  def mergePairs(spark: SparkSession, dir: String,
      nMerges: Int = DefaultMerges): Seq[(String, String)] =
    learn(spark, dir, nMerges)._1.map(m => (m.a, m.b))

  /** The learned merge table: one row per round, ranked. */
  def learnMerges(spark: SparkSession, dir: String,
      nMerges: Int = DefaultMerges): DataFrame = {
    import spark.implicits._
    val (merges, _) = learn(spark, dir, nMerges)
    merges.map(m => (m.rank, m.a, m.b, m.a + m.b, m.n))
      .toDF("merge_rank", "sym_a", "sym_b", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** The subword vocabulary AFTER the learned merges: every surviving
    * symbol with its corpus occurrence count — the frame whose size vs
    * the character alphabet measures what the merges bought.
    */
  def bpeVocab(spark: SparkSession, dir: String,
      nMerges: Int = DefaultMerges): DataFrame = {
    val (_, voc) = learn(spark, dir, nMerges)
    voc.select(col("cnt"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy("symbol")
  }

  /** Per-document token counts under the learned BPE vocabulary —
    * whitespace tokens vs subword tokens per doc, the real form of the
    * brief's "BPE-ish token counting". Segmentation is a TYPE join:
    * each word type's subword length comes from the merged vocab frame
    * (broadcast — vocab-sized), so no document is re-segmented
    * per-token. NULL-text docs report zero counts (the content-neutral
    * rule).
    */
  def bpeTokenCounts(spark: SparkSession, dir: String,
      nMerges: Int = DefaultMerges): DataFrame = {
    val (_, voc) = learn(spark, dir, nMerges)
    val typeLen = voc.select(array_join(col("syms"), "").as("tok"),
      size(col("syms")).cast("long").as("n_sub"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode_outer(
        when(col("text").isNotNull,
          filter(split(col("text"), " "), t => t =!= ""))).as("tok"))
      .join(broadcast(typeLen), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(col("tok")).as("n_words"),
        coalesce(sum(col("n_sub")), lit(0L)).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Per-source compression under the learned vocabulary — chars per BPE
    * token, the standard tokenizer-quality signal (higher = the merges
    * capture more of that source's regularity; a source that resists
    * compression is morphologically out-of-domain for this vocab).
    * chars = non-space characters (summed per word occurrence through
    * the same type join as [[bpeTokenCounts]]); sources whose docs are
    * all NULL-text have no tokens and are absent by contract (the
    * sourceDatasheet rule). The ratio is ONE division of exactly-
    * represented integer sums, portable-rounded — oracle-checkable.
    */
  def bpeCompression(spark: SparkSession, dir: String,
      nMerges: Int = DefaultMerges): DataFrame = {
    val (_, voc) = learn(spark, dir, nMerges)
    val typeLen = voc.select(array_join(col("syms"), "").as("tok"),
      size(col("syms")).cast("long").as("n_sub"))
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .join(broadcast(typeLen), Seq("tok"))
      .groupBy("source")
      .agg(sum(length(col("tok"))).as("n_chars"),
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        graft.functions.PortableRound.r(
          col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"), 4))
      .orderBy("source")
  }

  // ------------------------------------------------------------- oracle

  /** Wrapped-symbol string machinery: every symbol is wrapped
    * chr(1)·sym·chr(2), so a pair pattern can never straddle a symbol
    * boundary and DuckDB `replace` (leftmost non-overlapping) applies a
    * merge exactly like the Spark fold.
    */
  private def dWrap(s: String) = s"chr(1) || $s || chr(2)"

  /** Generated oracle chain: v0 = char-wrapped word vocab; per round i,
    * p{i} = weighted adjacent-pair counts, s{i} = the argmax row,
    * v{i} = the vocab with that merge applied. Returns (CTE chain,
    * final vocab CTE name, per-round sel names). Every CTE is
    * MATERIALIZED: s{i} is referenced twice inside v{i} and each round
    * chains on the previous vocab, so DuckDB's default inline-CTE
    * planning would re-evaluate the chain ~3^N times.
    */
  private def bpeCtes(nMerges: Int): (String, String, Seq[String]) = {
    val sb = new StringBuilder
    sb.append(
      s"""v0 AS MATERIALIZED (
         |  SELECT count(*) AS cnt,
         |         regexp_replace(tok, '(.)', chr(1) || '\\1' || chr(2), 'g') AS w
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE tok <> '' GROUP BY tok)""".stripMargin)
    val sels = (1 to nMerges).map { i =>
      val prev = s"v${i - 1}"
      sb.append(s""",
        |p$i AS MATERIALIZED (
        |  SELECT s[j] AS sym_a, s[j + 1] AS sym_b,
        |         CAST(sum(cnt) AS BIGINT) AS n
        |  FROM (SELECT cnt,
        |               string_split(substring(w, 2, length(w) - 2),
        |                            chr(2) || chr(1)) AS s
        |        FROM $prev WHERE length(w) >= 2) t,
        |       unnest(range(1, len(s))) AS u(j)
        |  WHERE len(s) >= 2
        |  GROUP BY 1, 2),
        |s$i AS MATERIALIZED (SELECT sym_a, sym_b, n FROM p$i
        |        ORDER BY n DESC, sym_a, sym_b LIMIT 1),
        |v$i AS MATERIALIZED (
        |  SELECT cnt,
        |         replace(w,
        |           (SELECT ${dWrap("sym_a")} || ${dWrap("sym_b")} FROM s$i),
        |           (SELECT ${dWrap("sym_a || sym_b")} FROM s$i)) AS w
        |  FROM $prev)""".stripMargin)
      s"s$i"
    }
    (sb.toString, s"v$nMerges", sels)
  }

  val oracles: Map[String, String] = {
    val (ctes, vFinal, sels) = bpeCtes(DefaultMerges)
    val mergeRows = sels.zipWithIndex.map { case (s, i) =>
      s"""SELECT ${i + 1} AS merge_rank, sym_a, sym_b,
         |       sym_a || sym_b AS merged, n AS pair_count FROM $s""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map(
      "q_bpe_merges" ->
        s"""WITH $ctes
           |SELECT * FROM ($mergeRows) ORDER BY merge_rank""".stripMargin,
      "q_bpe_vocab" ->
        s"""WITH $ctes
           |SELECT sym AS symbol, CAST(sum(cnt) AS BIGINT) AS n_occurrences
           |FROM (SELECT cnt,
           |             unnest(string_split(substring(w, 2, length(w) - 2),
           |                                 chr(2) || chr(1))) AS sym
           |      FROM $vFinal WHERE length(w) >= 2)
           |GROUP BY sym ORDER BY sym""".stripMargin,
      "q_bpe_compression" ->
        s"""WITH $ctes,
           |tl AS (
           |  SELECT replace(replace(w, chr(1), ''), chr(2), '') AS tok,
           |         CAST(len(string_split(substring(w, 2, length(w) - 2),
           |                               chr(2) || chr(1))) AS BIGINT)
           |           AS n_sub
           |  FROM $vFinal WHERE length(w) >= 2),
           |dt AS (
           |  SELECT source, unnest(list_filter(string_split(text, ' '),
           |                                    t -> t <> '')) AS tok
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT dt.source,
           |       CAST(sum(length(dt.tok)) AS BIGINT) AS n_chars,
           |       CAST(count(*) AS BIGINT) AS n_words,
           |       CAST(sum(tl.n_sub) AS BIGINT) AS n_bpe_tokens,
           |       floor(CAST(sum(length(dt.tok)) AS DOUBLE)
           |             / sum(tl.n_sub) * 10000 + 0.5) / 10000.0
           |         AS chars_per_token
           |FROM dt JOIN tl USING (tok)
           |GROUP BY dt.source ORDER BY dt.source""".stripMargin,
      "q_bpe_token_counts" ->
        s"""WITH $ctes,
           |tl AS (
           |  SELECT replace(replace(w, chr(1), ''), chr(2), '') AS tok,
           |         CAST(len(string_split(substring(w, 2, length(w) - 2),
           |                               chr(2) || chr(1))) AS BIGINT)
           |           AS n_sub
           |  FROM $vFinal WHERE length(w) >= 2),
           |dt AS (
           |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
           |                                    t -> t <> '')) AS tok
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT d.doc_id,
           |       CAST(count(dt.tok) AS BIGINT) AS n_words,
           |       CAST(coalesce(sum(tl.n_sub), 0) AS BIGINT) AS n_bpe_tokens
           |FROM documents d
           |LEFT JOIN dt ON dt.doc_id = d.doc_id
           |LEFT JOIN tl ON tl.tok = dt.tok
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
  }
}
