package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter primitives over 64-bit digests, as native codegen'd
  * Catalyst expressions (the repo's zero-UDF rule) — the membership
  * sketch behind [[graft.operators.Decontam.bloomContamination]]'s
  * large-benchmark scale path.
  *
  * Probe positions come from Kirsch–Mitzenmacher double hashing (public
  * recipe: "Less Hashing, Same Performance", ESA'06): position_i =
  * (m + i·h2) mod numBits with h2 = (m >>> 32) | 1 — k positions from
  * ONE 64-bit digest, no per-probe rehash. The `| 1` keeps h2 odd, so
  * successive probes never collapse onto one position for even strides.
  * `m` is the digest passed through a murmur-style fmix64 finalizer
  * FIRST: raw KM double hashing is adversarially fragile to structured
  * input (two digests congruent in both `v mod numBits` and the h2
  * stride collide in ALL k positions — arithmetic progressions hit this
  * band, and a caller feeding small sequential longs degenerates h2 to
  * 1), while the finalizer's xor-shift/multiply avalanche makes every
  * input bit flip ~half the output bits, restoring the independent-ish
  * position family the (1−e^(−kn/m))^k sizing formula assumes for ANY
  * caller input — not just pre-hashed xxhash64. The i·h2 accumulation
  * deliberately wraps (Java long overflow): build and probe run the
  * SAME static method, and identical-input/identical-position is the
  * only property a Bloom filter needs from its hash family. One
  * compatibility consequence (r10 advice): the fmix64 pre-finalizer
  * landed in round 10 and moved EVERY probe position, so a filter's
  * words and its probes must come from the same code version — no
  * persisted-filter compatibility across that boundary. No consumer
  * persists filters today (every registered path builds and probes
  * in-session; the streaming gate's plan literal is rebuilt at each
  * gate construction); anyone adding a persisted-filter path must
  * version the filter artifact alongside this hash family. There is
  * no cross-engine twin to match (which is also why every consumer
  * registers rows-only).
  *
  * The filter itself is a dense little-endian bitset: word w =
  * bits [64w, 64w+64), bit j of word w = position 64w + j. Built in
  * DataFrame algebra by [[graft.operators.Decontam.bloomFrom]]; probed
  * here in O(k) with an early exit on the first clear bit.
  */
object BloomFunctions {

  /** Word-index arithmetic uses `(pos >>> 6).toInt`, so the bitset is
    * addressable only while numBits/64 fits an Int — the typechecks
    * reject anything above 2³⁷ bits (16 GB — far past the 2²⁷ broadcast
    * budget documented on [[graft.operators.Decontam.bloomFrom]])
    * instead of silently wrapping to negative indices at analysis-clean
    * sizings.
    */
  val MaxNumBits: Long = 1L << 37

  /** MurmurHash3's 64-bit finalizer (public domain, Austin Appleby):
    * two xor-shift/multiply rounds → full avalanche. Applied to every
    * digest before deriving KM probe positions (see class doc).
    */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  /** The k probe positions of digest `v` in a `numBits` filter.
    * Build-side twin of [[bloomContains]] — the two MUST stay one
    * formula (spec-pinned: positions set by the builder are exactly the
    * positions the probe reads).
    */
  def bloomPositions(v: Long, numBits: Long, k: Int): ArrayData = {
    val m = fmix64(v)
    val h2 = (m >>> 32) | 1L
    val out = new Array[Long](k)
    var p = m
    var i = 0
    while (i < k) {
      out(i) = java.lang.Math.floorMod(p, numBits)
      p += h2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** True iff every probe position of `v` is set in the bitset `words`
    * (array<bigint>, [[bloomPositions]] layout). False ⇒ definitely not
    * inserted; true ⇒ inserted OR a false positive — the one-sided
    * error every caller documents. Early-exits on the first clear bit,
    * so the expected cost on non-members is ~1 probe, not k.
    */
  def bloomContains(words: ArrayData, v: Long, numBits: Long, k: Int): Boolean = {
    val m = fmix64(v)
    val h2 = (m >>> 32) | 1L
    var p = m
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(p, numBits)
      if ((words.getLong((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      p += h2
      i += 1
    }
    true
  }

  /** Plain-array twin of [[bloomContains]] for the broadcast probe path
    * (a Broadcast ships a JVM long[], not Catalyst ArrayData). Same
    * formula line-for-line — the literal-vs-broadcast equality spec
    * pins the two against drift.
    */
  def bloomContainsWords(words: Array[Long], v: Long, numBits: Long, k: Int): Boolean = {
    val m = fmix64(v)
    val h2 = (m >>> 32) | 1L
    var p = m
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(p, numBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      p += h2
      i += 1
    }
    true
  }

  /** Above this filter size the streaming gates switch from a plan
    * literal to an `sc.broadcast` handle: a literal is serialized into
    * EVERY task of every micro-batch (free at the registered 2²⁰ =
    * 128 KB, but 16 MB/task at the 2²⁷ production ceiling), while a
    * torrent broadcast ships each executor one copy once. Below the
    * threshold the literal stays preferable — no broadcast-manager
    * bookkeeping, and the value is visible in the plan for debugging.
    */
  val BroadcastThresholdBits: Long = 1L << 25

  /** `bloom_positions(digest)` → ARRAY<BIGINT> (see [[bloomPositions]]).
    * numBits/k are construction-time constants, baked into the
    * generated code as literals.
    */
  case class BloomPositions64(child: Expression, numBits: Long, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || numBits > MaxNumBits || k < 1 || k > 64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_positions requires 64 <= numBits <= $MaxNumBits and 1 <= k <= 64, got ($numBits, $k)")
      else if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_positions requires bigint input, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      bloomPositions(input.asInstanceOf[Long], numBits, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.bloomPositions($c, ${numBits}L, $k);")
    override protected def withNewChildInternal(newChild: Expression): BloomPositions64 =
      copy(child = newChild)
  }

  /** `bloom_contains(words, digest)` → BOOLEAN (see [[bloomContains]]). */
  case class BloomContains64(left: Expression, right: Expression,
      numBits: Long, k: Int) extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || numBits > MaxNumBits || k < 1 || k > 64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains requires 64 <= numBits <= $MaxNumBits and 1 <= k <= 64, got ($numBits, $k)")
      else (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"bloom_contains requires (array<bigint>, bigint), got $other")
      }
    override protected def nullSafeEval(a: Any, v: Any): Any =
      bloomContains(a.asInstanceOf[ArrayData], v.asInstanceOf[Long], numBits, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, v) =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.bloomContains($a, $v, ${numBits}L, $k);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomContains64 =
      copy(left = newLeft, right = newRight)
  }

  /** `bloom_contains_bc(digest)` → BOOLEAN — [[BloomContains64]] with
    * the bitset behind an `sc.broadcast` handle instead of a plan
    * literal (see [[BroadcastThresholdBits]] for when). The expression
    * itself carries only the lightweight Broadcast reference; codegen
    * resolves `.value()` ONCE into a mutable member at operator init,
    * so the per-row probe reads a plain long[] exactly as the literal
    * path reads its ArrayData — same formula, same early exit
    * ([[bloomContainsWords]]).
    */
  case class BloomContainsBroadcast64(child: Expression,
      words: org.apache.spark.broadcast.Broadcast[Array[Long]],
      numBits: Long, k: Int) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || numBits > MaxNumBits || k < 1 || k > 64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_bc requires 64 <= numBits <= $MaxNumBits and 1 <= k <= 64, got ($numBits, $k)")
      else if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_bc requires bigint input, got ${child.dataType}")
    override protected def nullSafeEval(v: Any): Any =
      bloomContainsWords(words.value, v.asInstanceOf[Long], numBits, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftBloomBc", words,
        "org.apache.spark.broadcast.Broadcast")
      val arr = ctx.addMutableState("long[]", "graftBloomWords",
        v => s"$v = (long[]) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.bloomContainsWords($arr, $c, ${numBits}L, $k);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomContainsBroadcast64 =
      copy(child = newChild)
  }

  /** Dense little-endian bitset from the SPARSE (word-index, word)
    * pairs the builder's bit_or aggregation produces: one pass placing
    * each pair at its index, absent words zero — O(sparse + numWords),
    * replacing the per-slot map lookup that made the one-row assembly
    * O(numWords²) (each `try_element_at` over a map is a linear scan in
    * Catalyst). Order-insensitive: word indices are distinct after the
    * groupBy, so placement commutes and the collect_list needs no sort.
    * Caller contract (the builder's own aggregation guarantees both):
    * indices in [0, numWords), each at most once. An out-of-range index
    * fails loudly with the message below (r10 advice: a bare
    * ArrayIndexOutOfBoundsException here would read as an engine bug);
    * duplicate indices cannot be detected in O(1) and last-write-wins —
    * the expression is internal to bloomFrom's groupBy contract, which
    * cannot produce them.
    */
  def denseBitset(pairs: ArrayData, numWords: Int): ArrayData = {
    val out = new Array[Long](numWords)
    var i = 0
    val n = pairs.numElements()
    while (i < n) {
      val row = pairs.getStruct(i, 2)
      val idx = row.getLong(0)
      if (idx < 0 || idx >= numWords)
        throw new IllegalArgumentException(
          s"dense_bitset: word index $idx outside [0, $numWords) — input " +
            "violates the (index, word) contract of Decontam.bloomFrom")
      out(idx.toInt) = row.getLong(1)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Allocatable ceiling for [[DenseBitset64]]: 2²⁵ words = 2³¹ bits
    * (a 256 MB long array — already far past any broadcastable filter;
    * [[graft.operators.Decontam.bloomFrom]] documents 2²⁷ BITS as the
    * production budget). A ceiling derived from [[MaxNumBits]] >> 6 =
    * 2³¹ would exceed Int.MaxValue and could never fire on an Int
    * numWords (r10 advice: that guard was dead code).
    */
  val MaxDenseWords: Int = 1 << 25

  /** `dense_bitset(pairs)` → ARRAY<BIGINT> of length numWords (see
    * [[denseBitset]]). Input: array<struct<bigint, bigint>> of sparse
    * (word-index, word) pairs.
    */
  case class DenseBitset64(child: Expression, numWords: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numWords < 1 || numWords > MaxDenseWords)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dense_bitset requires 1 <= numWords <= $MaxDenseWords, got $numWords")
      else child.dataType match {
        case ArrayType(s: org.apache.spark.sql.types.StructType, _)
            if s.length == 2 && s.forall(_.dataType == LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"dense_bitset requires array<struct<bigint, bigint>>, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      denseBitset(input.asInstanceOf[ArrayData], numWords)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.denseBitset($c, $numWords);")
    override protected def withNewChildInternal(newChild: Expression): DenseBitset64 =
      copy(child = newChild)
  }

  /** Digest family selectors for [[shingleHits]] — which 64-bit digest
    * the per-shingle Bloom probe feeds. Must mirror the batch side's
    * family exactly (the lockstep contract of each gate).
    */
  val FamilyFingerprint62 = 0
  val FamilyXxhash64 = 1

  /** Distinct word-n-gram census + Bloom hit count of a raw text value
    * in ONE compiled pass — the streaming decontam gates' hot loop,
    * fused (r15 verdict ask #4: the Bloom stage owned ~0.91 ms/row of
    * the admission composite, most of it the INTERPRETED
    * `array_distinct(transform(...))` shingle assembly plus the
    * per-element `filter(shingles, probe)` higher-order functions —
    * HOFs never codegen, and each window allocated a concat'd string).
    *
    * Exact semantics of the algebra it replaces, via the byte-span
    * identity [[TextHashes.ngramHashes64]] proved: splitting on every
    * 0x20 and rejoining a window with single spaces is the identity on
    * the original substring, so each window IS a byte span of the
    * input — no window string is materialized. Distinctness matches
    * `array_distinct` (byte equality via UTF8String views into the
    * span); each distinct shingle probes ONCE, exactly like probing
    * the distinct array. Digests: [[FamilyFingerprint62]] →
    * [[TextHashes.fingerprint62]] over the span (the artifact-serving
    * gate's batch family), [[FamilyXxhash64]] → Spark's `xxhash64`
    * seed 42 over the span bytes (the self-building gate's family).
    *
    * Returns total·2³² + hits packed in one BIGINT (both counts are
    * bounded by the token count of a ≤ 2³¹-byte string, so the packing
    * is exact); fewer than n tokens → 0 (total 0, hits 0).
    */
  def shingleHits(s: org.apache.spark.unsafe.types.UTF8String, n: Int,
      words: Array[Long], numBits: Long, k: Int, family: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < n) return 0L
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    val nWin = nTok - n + 1
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      nWin * 2)
    var total = 0L
    var hits = 0L
    var w = 0
    while (w < nWin) {
      val s0 = starts(w)
      val e = if (w + n < nTok) starts(w + n) - 1 else len
      val span = org.apache.spark.unsafe.types.UTF8String
        .fromAddress(base, off + s0, e - s0)
      if (seen.add(span)) {
        total += 1
        val digest =
          if (family == FamilyFingerprint62) TextHashes.fingerprint62(span)
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(base, off + s0, e - s0, 42L)
        if (bloomContainsWords(words, digest, numBits, k)) hits += 1
      }
      w += 1
    }
    (total << 32) | hits
  }

  /** `shingle_hits(text)` → BIGINT total·2³² + hits (see
    * [[shingleHits]]) with the bitset carried as a plain constructor
    * array — the same task-serialization class as the literal probe
    * (below [[BroadcastThresholdBits]]).
    */
  case class BloomShingleHits(child: Expression, words: Array[Long],
      n: Int, numBits: Long, k: Int, family: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || numBits > MaxNumBits || k < 1 || k > 64 || n < 1)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hits requires 64 <= numBits <= $MaxNumBits, 1 <= k <= 64, n >= 1, got ($numBits, $k, $n)")
      else if (family != FamilyFingerprint62 && family != FamilyXxhash64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hits: unknown digest family $family")
      else if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hits requires string input, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      shingleHits(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        n, words, numBits, k, family)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val arr = ctx.addReferenceObj("graftShingleWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.shingleHits($c, $n, $arr, ${numBits}L, $k, $family);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomShingleHits =
      copy(child = newChild)
  }

  /** [[BloomShingleHits]] with the bitset behind an `sc.broadcast`
    * handle — the at/above-[[BroadcastThresholdBits]] form, same
    * resolve-once pattern as [[BloomContainsBroadcast64]].
    */
  case class BloomShingleHitsBroadcast(child: Expression,
      words: org.apache.spark.broadcast.Broadcast[Array[Long]],
      n: Int, numBits: Long, k: Int, family: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || numBits > MaxNumBits || k < 1 || k > 64 || n < 1)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hits_bc requires 64 <= numBits <= $MaxNumBits, 1 <= k <= 64, n >= 1, got ($numBits, $k, $n)")
      else if (family != FamilyFingerprint62 && family != FamilyXxhash64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hits_bc: unknown digest family $family")
      else if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hits_bc requires string input, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      shingleHits(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        n, words.value, numBits, k, family)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftShingleBc", words,
        "org.apache.spark.broadcast.Broadcast")
      val arr = ctx.addMutableState("long[]", "graftShingleWords",
        v => s"$v = (long[]) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomFunctions$$.MODULE$$.shingleHits($c, $n, $arr, ${numBits}L, $k, $family);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomShingleHitsBroadcast =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def bloomPositionsCol(digest: Column, numBits: Long, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      BloomPositions64(org.apache.spark.sql.GraftShim.expression(digest), numBits, k))
  def bloomContainsCol(words: Column, digest: Column, numBits: Long, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      BloomContains64(org.apache.spark.sql.GraftShim.expression(words),
        org.apache.spark.sql.GraftShim.expression(digest), numBits, k))
  def bloomContainsBroadcastCol(
      words: org.apache.spark.broadcast.Broadcast[Array[Long]],
      digest: Column, numBits: Long, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      BloomContainsBroadcast64(
        org.apache.spark.sql.GraftShim.expression(digest), words, numBits, k))
  def denseBitsetCol(pairs: Column, numWords: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      DenseBitset64(org.apache.spark.sql.GraftShim.expression(pairs), numWords))

  /** [[shingleHits]] with the literal-vs-broadcast switch applied at
    * the [[BroadcastThresholdBits]] boundary — the one factory both
    * streaming decontam gates call.
    */
  def shingleHitsCol(spark: org.apache.spark.sql.SparkSession,
      text: Column, n: Int, words: Array[Long], numBits: Long, k: Int,
      family: Int): Column =
    if (numBits >= BroadcastThresholdBits)
      org.apache.spark.sql.GraftShim.column(
        BloomShingleHitsBroadcast(org.apache.spark.sql.GraftShim.expression(text),
          spark.sparkContext.broadcast(words), n, numBits, k, family))
    else
      org.apache.spark.sql.GraftShim.column(
        BloomShingleHits(org.apache.spark.sql.GraftShim.expression(text),
          words, n, numBits, k, family))

  // ------------------------------------------------ oracle interpolation

  /** DuckDB replay of [[fmix64]] + [[bloomPositions]] — the SQL twin
    * that turned the Bloom consumers oracle-checkable in round 13.
    *
    * Java semantics an ANSI engine can't state directly: fmix64's two
    * multiplications wrap mod 2⁶⁴, and the KM stride accumulation wraps
    * signed int64. Both are exact in DuckDB HUGEINT:
    *   - values live UNSIGNED in [0, 2⁶⁴): Java `x >>> s` is `x >> s`
    *     there, and `xor` is bit-identical;
    *   - `h · C mod 2⁶⁴` via split multiply (hL·cL + ((hL·cH + hH·cL)
    *     mod 2³²)·2³² mod 2⁶⁴ — every intermediate < 2⁶⁵, far inside
    *     HUGEINT);
    *   - `floorMod(m + i·h2, numBits)` — the Java sum wraps signed, but
    *     for power-of-two numBits (all registered sizings) 2⁶⁴ ≡ 0 mod
    *     numBits, so the UNWRAPPED hugeint sum reduces mod numBits to
    *     the identical position. Enforced by the `require`.
    *
    * Emits CTEs `bf1..bf5, bfx, bfpos` over an existing CTE
    * `digestsCte(v)` of BIGINT digests (digests must be non-negative —
    * true for every portable 62-bit digest the repo feeds blooms):
    * `bfpos(v, i, pos)` holds each digest's k probe positions.
    */
  def duckPositionCtes(digestsCte: String, numBits: Long, k: Int): String = {
    require(numBits > 0 && (numBits & (numBits - 1)) == 0,
      s"oracle replay needs power-of-two numBits, got $numBits")
    def mulmod(c: Long): String = {
      val cL = c & 0xFFFFFFFFL
      val cH = c >>> 32
      s"((h % 4294967296) * $cL + " +
        s"(((h % 4294967296) * $cH + (h >> 32) * $cL) % 4294967296) " +
        s"* 4294967296) % 18446744073709551616"
    }
    s"""bf1 AS (SELECT v, xor(CAST(v AS HUGEINT), CAST(v AS HUGEINT) >> 33) AS h
       |        FROM $digestsCte),
       |bf2 AS (SELECT v, ${mulmod(0xFF51AFD7ED558CCDL)} AS h FROM bf1),
       |bf3 AS (SELECT v, xor(h, h >> 33) AS h FROM bf2),
       |bf4 AS (SELECT v, ${mulmod(0xC4CEB9FE1A85EC53L)} AS h FROM bf3),
       |bf5 AS (SELECT v, xor(h, h >> 33) AS m FROM bf4),
       |bfx AS (SELECT v, m,
       |               (m >> 32) + CASE WHEN (m >> 32) % 2 = 0 THEN 1 ELSE 0 END
       |                 AS h2
       |        FROM bf5),
       |bfpos AS MATERIALIZED (
       |  SELECT v, i, CAST((m + i * h2) % $numBits AS BIGINT) AS pos
       |  FROM bfx CROSS JOIN (SELECT unnest(range(0, $k)) AS i))""".stripMargin
  }
}
