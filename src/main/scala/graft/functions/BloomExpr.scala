package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter n-gram probe: per document, the number of DISTINCT word
  * n-gram hashes whose k Bloom positions are ALL set in a fixed bit
  * array — the zero-join form of benchmark decontamination
  * (`operators.Decontam.bloomReport`).
  *
  * The bit array is a MODEL ARTIFACT (k·|bench grams| positions folded
  * into mBits bits — bounded by mBits = 2^20 bits = 128 KiB regardless
  * of benchmark size), shipped into the generated code as one
  * `addReferenceObj` long[]: the corpus side needs no explode, no
  * broadcast join and no shuffle at all — the whole probe is one
  * codegen scan, which is what survives a 100 TB corpus. False
  * positives are the standard Bloom trade (rate ≈ fill^k) and are
  * DETERMINISTIC: the DuckDB oracle replays the identical position
  * arithmetic, so reports hash-match cross-engine; false negatives are
  * impossible (every benchmark gram sets its own bits).
  *
  * Position j of gram hash g (g ≥ 0 by `NgramHashes` construction):
  *
  *   pos_j = ((g mod P) · K_j + K_(j+3)) mod P mod mBits
  *
  * with P = `Text.minhashPrime` (2^31 − 1) and K = `NgramHashes.keys`
  * (all < 2^32, so every product stays inside i64 under ANSI mode on
  * both engines). Reference behavior: the same 13-gram-overlap test as
  * `Decontam.report` (bench/queries.rf decontamination shape), probed
  * through a filter instead of a join.
  */
case class BloomGramHits(child: Expression, n: Int, k: Int, mBits: Int,
                         bits: Array[Long]) extends UnaryExpression {
  require(k >= 1 && k <= 3, s"bloom k $k outside 1..3")
  require(mBits > 0 && (mBits & 63) == 0, s"mBits $mBits must be a multiple of 64")
  require(bits.length == mBits / 64,
    s"bits length ${bits.length} != mBits/64 = ${mBits / 64}")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloomGramHits expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BloomGramHits.compute(input.asInstanceOf[UTF8String], n, k, mBits, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomGramHits.compute($c, $n, $k, $mBits, $bitsRef)")
  }

  // the bit array is payload, not identity: two filters with the same
  // params but different bits must not compare equal under Catalyst
  // (e.g. ReuseSubquery / expression dedup across different benchmarks)
  override def equals(other: Any): Boolean = other match {
    case o: BloomGramHits =>
      o.child == child && o.n == n && o.k == k && o.mBits == mBits &&
        java.util.Arrays.equals(o.bits, bits)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(n), Int.box(k), Int.box(mBits),
      Int.box(java.util.Arrays.hashCode(bits)))

  override protected def withNewChildInternal(newChild: Expression)
      : BloomGramHits = copy(child = newChild)
}

object BloomGramHits {
  private val P: Long = Text.minhashPrime

  /** Bloom position j of a non-negative gram hash. Shared by the probe,
    * the builder (`Decontam.bloomBits`'s Column form) and the oracle
    * SQL generator — ONE home for the formula. */
  def position(g: Long, j: Int, mBits: Int): Int =
    (((g % P) * NgramHashes.keys(j) + NgramHashes.keys(j + 3)) % P % mBits).toInt

  /** The same position as a DuckDB SQL fragment over a BIGINT gram
    * expression (replay of [[position]] bit for bit). */
  def positionSql(g: String, j: Int, mBits: Int): String =
    s"((($g % $P) * ${NgramHashes.keys(j)} + ${NgramHashes.keys(j + 3)})" +
      s" % $P % $mBits)"

  def compute(text: UTF8String, n: Int, k: Int, mBits: Int,
              bits: Array[Long]): Int = {
    val grams = NgramHashes.gramHashes(text.toString, n)
    java.util.Arrays.sort(grams)
    var cnt = 0
    var i = 0
    while (i < grams.length) {
      if (i == 0 || grams(i) != grams(i - 1)) { // distinct grams only
        var hit = true
        var j = 0
        while (hit && j < k) {
          val p = position(grams(i), j, mBits)
          if (((bits(p >> 6) >>> (p & 63)) & 1L) == 0L) hit = false
          j += 1
        }
        if (hit) cnt += 1
      }
      i += 1
    }
    cnt
  }
}

object BloomExpr {
  /** Column: per-doc count of distinct n-gram hashes probing positive
    * against the Bloom bit array (0 for clean docs). */
  def bloomGramHits(text: Column, n: Int, k: Int, mBits: Int,
                    bits: Array[Long]): Column =
    ColumnInternals.column(
      BloomGramHits(ColumnInternals.expr(text), n, k, mBits, bits))
}
