package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word-n-gram hashes of a document in ONE pass — the corpus-scale
  * form of `Decontam.ngrams`: instead of materializing each gram as a
  * string (array-of-slices HOFs are CodegenFallback, and the strings
  * then carry through explode + shuffle), tokenize once, compute each
  * token's code once, and slide an n-window emitting
  *
  *   hash(p) = XOR_{j<n} code(token_{p+j}) · K_j
  *
  * with fixed odd constants K_j. Codes are < 2^22 + 29791·len and the
  * K_j < 2^32, so every product stays well inside i64 (no ANSI
  * overflow) and the SAME arithmetic evaluates bit-identically in
  * DuckDB (`Text.duck` builds the replay SQL) — collisions, if any,
  * are deterministic and shared by both engines, so distinct-hit
  * counts still hash-match. Position-distinct constants keep the hash
  * order-sensitive; 8 bytes/gram replaces ~3 words of UTF-8 on the
  * shuffle wire.
  *
  * Token semantics match `split(text, ' ')` limit=-1 (empty tokens
  * kept), codes match `Text.tokenCodeSql` — both pinned by spec
  * against the string/HOF forms.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= NgramHashes.keys.length,
    s"ngram width $n outside 1..${NgramHashes.keys.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngramHashes expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  /** Position constants (public xxHash/Knuth/FNV-family odd constants,
    * < 2^32 so code·K stays inside i64 for any sane token — wraps only
    * past ~100k-char tokens, and a wrap is still just a hash). 16 slots
    * covers the standard 13-gram decontamination width. */
  val keys: Array[Long] = Array(
    2654435761L, 2246822519L, 3266489917L, 668265263L, 374761393L,
    2654435769L, 40503L, 2166136261L, 16777619L, 2147483647L,
    1000000007L, 998244353L, 754974721L, 167772161L, 469762049L,
    3221225473L)

  def compute(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(gramHashes(text.toString, n))

  /** Raw gram-hash array — shared with `ShingleMinHashes`. */
  def gramHashes(s: String, n: Int): Array[Long] = {
    // token codes, one pass
    var codes = new Array[Long](8)
    var nTok = 0
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (nTok == codes.length)
          codes = java.util.Arrays.copyOf(codes, nTok * 2)
        codes(nTok) = MinHashes.tokenCode(s, start, i)
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](math.max(0, nTok - n + 1))
    var p = 0
    while (p < out.length) {
      var h = 0L
      var j = 0
      while (j < n) { h ^= codes(p + j) * keys(j); j += 1 }
      out(p) = h
      p += 1
    }
    out
  }
}

object NgramHashExpr {
  /** Column of all word-n-gram hashes (array<long>), one pass. */
  def ngramHashes(text: Column, n: Int): Column =
    ColumnInternals.column(NgramHashes(ColumnInternals.expr(text), n))

  /** 0-based positions whose element REPEATS an earlier element of the
    * array (keep-first: occurrence 1 is never flagged) — the
    * within-document half of ExactSubstr over `ngramHashes` output.
    * Row-local, no shuffle ([[RepeatStarts]]). */
  def repeatStarts(arr: Column): Column =
    ColumnInternals.column(RepeatStarts(ColumnInternals.expr(arr)))

  /** Column of adjacent bounded-token-code pairs
    * (array<struct<h1:long,h2:long>>), one pass — the hash-space twin
    * of `NgramLm.pairArr` (the join-fallback scan side; the production
    * path is the fully-folded [[LmScore64]]). */
  def bigramHashPairs(text: Column): Column =
    ColumnInternals.column(BigramHashPairs(ColumnInternals.expr(text)))

  /** Per-document folded LM score struct<n_tok,n_big,s64> — one pass,
    * no explode, no joins ([[LmScore64]]). */
  def lmScore64(text: Column, model: LmFoldModel): Column =
    ColumnInternals.column(LmScore64(ColumnInternals.expr(text), model))

  /** Column of all-k shingle-MinHash values (array<long>), one pass. */
  def shingleMinhashes(text: Column, n: Int, seeds: Seq[(Long, Long)]): Column =
    ColumnInternals.column(ShingleMinHashes(ColumnInternals.expr(text), n,
      seeds.map(_._1), seeds.map(_._2)))
}

/** Adjacent BOUNDED-token-code pairs of a document in ONE pass — the
  * join-fallback scan side of hash-space bigram-LM scoring
  * (`NgramLm.fitHashed`/`scoreHashed`): tokenize once, bound each
  * token's code to 22 bits (tokenCode mod 2^22 — the DuckDB replay is
  * `tokenCodeSql % 4194304`; the mod is the deterministic aliasing
  * both engines share, and it licenses the INJECTIVE i64 pair pack
  * `(m1 << 23) | m2` downstream), and emit the sliding pairs as
  * (h1, h2) structs. Replaces the measured-4.5s-per-500k-docs
  * string-struct materialization of the exact path (the
  * `NgramLm.pairArr` scaladoc's cost decomposition) with two i64s per
  * pair; the no-explode production path is [[LmScore64]]. Codes are
  * non-negative, so −1 stays a safe OOV sentinel in the join path. */
case class BigramHashPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramHashPairs.tpe

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigramHashPairs expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BigramHashPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BigramHashPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : BigramHashPairs = copy(child = newChild)
}

object BigramHashPairs {
  import org.apache.spark.sql.types.StructType

  val tpe: DataType = ArrayType(
    new StructType()
      .add("h1", LongType, nullable = false)
      .add("h2", LongType, nullable = false),
    containsNull = false)

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // bounded per-token codes, one pass (tokenCode mod 2^22)
    var codes = new Array[Long](8)
    var nTok = 0
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (nTok == codes.length)
          codes = java.util.Arrays.copyOf(codes, nTok * 2)
        codes(nTok) = MinHashes.tokenCode(s, start, i) & LmScore64.CodeMask
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](math.max(0, nTok - 1))
    i = 0
    while (i < out.length) {
      out(i) =
        org.apache.spark.sql.catalyst.InternalRow(codes(i), codes(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Within-document repeat detection in ONE row-local pass: the 0-based
  * positions of `arr` (an `NgramHashes` gram-hash array) whose value
  * already occurred at an EARLIER position — keep-first semantics, so
  * for a span repeated k times inside one document the occurrences
  * 2..k are flagged and the first stays (the suffix-array construction
  * of Lee et al. 2022 likewise keeps one copy). Composed with the
  * cross-document census in `CorpusStats.dupSpanRemoveFull`; each doc
  * is self-contained, so this half of ExactSubstr costs NO shuffle at
  * any scale. The DuckDB replay is `row_number() OVER (PARTITION BY
  * doc, g ORDER BY i) > 1` over the exploded grams. */
case class RepeatStarts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repeatStarts expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    RepeatStarts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepeatStarts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : RepeatStarts = copy(child = newChild)
}

object RepeatStarts {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n <= 1) return new GenericArrayData(Array.emptyIntArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    var out = new Array[Int](4)
    var m = 0
    var i = 0
    while (i < n) {
      if (!seen.add(arr.getLong(i))) {
        if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
        out(m) = i
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** MinHash signature over word-n-gram SHINGLES — the production form of
  * document MinHash (unigram-token MinHash, `MinHashes`, loses word
  * order; shingles keep local structure, so the Jaccard estimate tracks
  * edit locality). One pass: tokenize → gram hashes (`NgramHashes`
  * arithmetic) → fold all k (a·(h mod P) + b) mod P minima. A doc with
  * fewer than n tokens has NO shingles; its signature slots take the
  * sentinel P itself (unreachable: real values are < P), which the
  * DuckDB replay mirrors as `coalesce(list_min(...), P)`. */
case class ShingleMinHashes(child: Expression, n: Int,
                            seedsA: Seq[Long], seedsB: Seq[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingleMinhashes expects a string input, got ${child.dataType}")

  @transient private lazy val aArr: Array[Long] = seedsA.toArray
  @transient private lazy val bArr: Array[Long] = seedsB.toArray

  override def nullSafeEval(input: Any): Any =
    ShingleMinHashes.compute(input.asInstanceOf[UTF8String], n, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("shMinhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("shMinhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleMinHashes.compute($c, $n, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleMinHashes = copy(child = newChild)
}

object ShingleMinHashes {
  val P: Long = Text.minhashPrime

  def compute(text: UTF8String, n: Int,
              a: Array[Long], b: Array[Long]): ArrayData = {
    val grams = NgramHashes.gramHashes(text.toString, n)
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P) // sentinel: no shingles → P
    var i = 0
    while (i < grams.length) {
      val hm = grams(i) % P // grams are non-negative (XOR of products < 2^62)
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
