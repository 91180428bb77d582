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
  * (v + i·h2) mod numBits with h2 = (v >>> 32) | 1 — k positions from
  * ONE 64-bit digest, no per-probe rehash. The `| 1` keeps h2 odd, so
  * successive probes never collapse onto one position for even strides.
  * The i·h2 accumulation deliberately wraps (Java long overflow): build
  * and probe run the SAME static method, and identical-input/identical-
  * position is the only property a Bloom filter needs from its hash
  * family — there is no cross-engine twin to match (which is also why
  * every consumer registers rows-only).
  *
  * The filter itself is a dense little-endian bitset: word w =
  * bits [64w, 64w+64), bit j of word w = position 64w + j. Built in
  * DataFrame algebra by [[graft.operators.Decontam.bloomFrom]]; probed
  * here in O(k) with an early exit on the first clear bit.
  */
object BloomFunctions {

  /** The k probe positions of digest `v` in a `numBits` filter.
    * Build-side twin of [[bloomContains]] — the two MUST stay one
    * formula (spec-pinned: positions set by the builder are exactly the
    * positions the probe reads).
    */
  def bloomPositions(v: Long, numBits: Long, k: Int): ArrayData = {
    val h2 = (v >>> 32) | 1L
    val out = new Array[Long](k)
    var p = v
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
    val h2 = (v >>> 32) | 1L
    var p = v
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

  /** `bloom_positions(digest)` → ARRAY<BIGINT> (see [[bloomPositions]]).
    * numBits/k are construction-time constants, baked into the
    * generated code as literals.
    */
  case class BloomPositions64(child: Expression, numBits: Long, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (numBits < 64 || k < 1 || k > 64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_positions requires numBits >= 64 and 1 <= k <= 64, got ($numBits, $k)")
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
      if (numBits < 64 || k < 1 || k > 64)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains requires numBits >= 64 and 1 <= k <= 64, got ($numBits, $k)")
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

  /** Column-API entry points. */
  def bloomPositionsCol(digest: Column, numBits: Long, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      BloomPositions64(org.apache.spark.sql.GraftShim.expression(digest), numBits, k))
  def bloomContainsCol(words: Column, digest: Column, numBits: Long, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      BloomContains64(org.apache.spark.sql.GraftShim.expression(words),
        org.apache.spark.sql.GraftShim.expression(digest), numBits, k))
}
