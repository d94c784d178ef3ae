package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Session-level registration of the engine's function library for SQL
  * users — the parity surface for the reference's `loadfn` runtime
  * extension loading (`/root/reference/core/env.c:262`). After
  * `Graft.enableSql(spark)`, the functions are callable from
  * `spark.sql(...)` text.
  *
  * Builders return plain Catalyst trees (the analyzer's type coercion
  * finishes them); `dot_product` resolves to the native codegen
  * Expression. No UDF closures anywhere.
  */
object Graft {

  private def ediv(a: Expression, b: Expression): Expression =
    Floor(Divide(Cast(a, DoubleType),
      If(EqualTo(b, Literal(0)), Literal.create(null, DoubleType),
        Cast(b, DoubleType))))

  /** The function library as (name, builder) pairs — one list powering
    * both the imperative `enableSql` and the `GraftExtensions`
    * config-time install. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      // Cast both sides to array<double> so e.g. an array<float> argument
      // is converted rather than misread byte-wise by ArrayData.getDouble.
      "dot_product" -> ((exprs: Seq[Expression]) => functions.DotProduct(
        Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
        Cast(exprs(1), ArrayType(DoubleType, containsNull = true)))),
      "euclid_div" -> ((exprs: Seq[Expression]) => ediv(exprs.head, exprs(1))),
      "euclid_mod" -> ((exprs: Seq[Expression]) => Subtract(exprs.head,
        Multiply(ediv(exprs.head, exprs(1)), exprs(1)))),
      "xbar" -> ((exprs: Seq[Expression]) =>
        Subtract(exprs(1), Pmod(exprs(1), exprs.head))),
      "sorted_intersect_size" -> ((exprs: Seq[Expression]) =>
        functions.SortedIntersectSize(exprs.head, exprs(1))),
      // the text/dedup expression library, SQL-callable (all codegen):
      "lang_id" -> ((exprs: Seq[Expression]) =>
        functions.LangId(exprs.head)),
      "simhash16" -> ((exprs: Seq[Expression]) =>
        functions.SimHash16(exprs.head)),
      "simhash64" -> ((exprs: Seq[Expression]) =>
        functions.SimHash64(exprs.head)),
      "quality_stats" -> ((exprs: Seq[Expression]) =>
        functions.QualityStats(exprs.head)),
      "rep_stats" -> ((exprs: Seq[Expression]) =>
        functions.RepStats(exprs.head)),
      "ngram_hashes" -> ((exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, _) => functions.NgramHashes(exprs.head, n)
        case x => throw new IllegalArgumentException(
          s"ngram_hashes(text, n) needs a literal n, got $x")
      }),
      "micros_as_nanos" -> ((exprs: Seq[Expression]) =>
        functions.MicrosAsNanos(exprs.head)),
      // integer 1/64-bit surprisal (the t33/t34/t39 log2 primitive):
      // 64·floor(log2 q) + mantissa interpolation, exact shifts + bin()
      "surprisal64" -> ((exprs: Seq[Expression]) => {
        val q = Cast(exprs.head, org.apache.spark.sql.types.LongType)
        val b = Cast(Subtract(Length(Bin(q)), Literal(1)),
          org.apache.spark.sql.types.LongType)
        Subtract(Add(Multiply(Literal(64L), b),
          ShiftRight(ShiftLeft(q, Literal(6)),
            Cast(b, org.apache.spark.sql.types.IntegerType))), Literal(64L))
      }),
      // vector quantization/assignment kernels (the PQ/IVF family):
      "nearest_centroid" -> ((exprs: Seq[Expression]) =>
        functions.NearestCentroid(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
          Cast(exprs(1), ArrayType(ArrayType(DoubleType, containsNull = true),
            containsNull = true)))),
      "nearest_centroid_l2" -> ((exprs: Seq[Expression]) =>
        functions.NearestCentroidL2(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
          Cast(exprs(1), ArrayType(ArrayType(DoubleType, containsNull = true),
            containsNull = true)))),
      "array_sub" -> ((exprs: Seq[Expression]) =>
        functions.ArraySub(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
          Cast(exprs(1), ArrayType(DoubleType, containsNull = true)))),
      "adc_lookup" -> ((exprs: Seq[Expression]) =>
        functions.AdcLookup(
          Cast(exprs.head, ArrayType(
            org.apache.spark.sql.types.IntegerType, containsNull = true)),
          Cast(exprs(1), ArrayType(DoubleType, containsNull = true)))),
      "sq8_dot" -> ((exprs: Seq[Expression]) =>
        functions.Sq8Dot(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
          Cast(exprs(1), ArrayType(ArrayType(DoubleType, containsNull = true),
            containsNull = true)))),
      "sq8_codes" -> ((exprs: Seq[Expression]) =>
        functions.Sq8Codes(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)),
          Cast(exprs(1), ArrayType(ArrayType(DoubleType, containsNull = true),
            containsNull = true)))),
      // the round-15 text kernels, SQL-callable:
      "html_extract" -> ((exprs: Seq[Expression]) => exprs(1) match {
        case Literal(mw: Int, _) => functions.HtmlExtract(exprs.head, mw)
        case x => throw new IllegalArgumentException(
          s"html_extract(html, minWords) needs a literal minWords, got $x")
      }),
      "char_grams" -> ((exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, _) => functions.CharGrams(exprs.head, n)
        case x => throw new IllegalArgumentException(
          s"char_grams(text, n) needs a literal n, got $x")
      }),
      "nfc_normalize" -> ((exprs: Seq[Expression]) =>
        functions.NfcNormalize(exprs.head)),
      // binary (sign-bit) quantization kernels (the s20 family):
      "sign_pack" -> ((exprs: Seq[Expression]) =>
        functions.SignPack(
          Cast(exprs.head, ArrayType(DoubleType, containsNull = true)))),
      "hamming_dist" -> ((exprs: Seq[Expression]) =>
        functions.HammingDist(
          Cast(exprs.head, ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true)),
          Cast(exprs(1), ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true)))),
      "cdc_chunks" -> ((exprs: Seq[Expression]) =>
        (exprs(1), exprs(2)) match {
          case (Literal(w: Int, _), Literal(mb: Int, _)) =>
            functions.CdcChunks(exprs.head, w, mb)
          case (x, y) => throw new IllegalArgumentException(
            s"cdc_chunks(text, w, maskBits) needs literal ints, got $x, $y")
        }),
      // row-local information-density kernels (the t90/t91 family):
      "char_entropy64" -> ((exprs: Seq[Expression]) =>
        functions.CharEntropy64(exprs.head)),
      "lzw_phrases" -> ((exprs: Seq[Expression]) =>
        functions.LzwPhrases(exprs.head)),
      // URL canonicalization / host: the one dual-dialect chain
      // (functions.Url.canonSql) parsed once with a placeholder child
      // spliced out — SQL users get the exact arithmetic the t68
      // oracle replays.
      "url_canon" -> ((exprs: Seq[Expression]) =>
        splice(functions.Url.canonSql("__graft_u__", duck = false),
          exprs.head)),
      "url_host" -> ((exprs: Seq[Expression]) =>
        splice(functions.Url.hostSql("__graft_u__", duck = false),
          exprs.head)))

  /** Parse a generated SQL fragment mentioning the `__graft_u__`
    * placeholder column and splice the real child expression in — how
    * a dual-dialect SQL-text kernel (Url.canonSql) becomes a registry
    * builder without a second Catalyst spelling of the chain. */
  private def splice(fragment: String, child: Expression): Expression =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(fragment).transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_u__") => child
      }

  def enableSql(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  /** Register a FITTED language-ID scorer as `name(text)` in this
    * session — the folded LangNb kernel (one codegen pass, no
    * explode/join) reachable from SQL text. Unlike the stateless
    * [[builders]] this binds a model ARTIFACT, so it registers
    * per-session on demand (the loadfn-with-state analog). Returns
    * the predicted language, null on null input. */
  def registerLangNb(spark: SparkSession,
                     kernel: functions.LangNbKernel,
                     name: String = "lang_nb"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (exprs: Seq[Expression]) => functions.LangNbScore(exprs.head, kernel),
      "scala_udf")

  /** Register a FITTED WordPiece encoder as `name(text)` in this
    * session — the t86 greedy longest-match walk (incl. the
    * `##`-continuation-only rule and whole-word `[UNK]`) reachable
    * from SQL text as one codegen pass. Binds a model artifact like
    * [[registerLangNb]]. */
  def registerWordPiece(spark: SparkSession, vocab: Set[String],
                        name: String = "wordpiece_encode",
                        unk: String = "[UNK]"): Unit = {
    require(vocab.nonEmpty, "registerWordPiece needs a non-empty vocabulary")
    val v = vocab.toSeq.sorted // deterministic expression equality
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (exprs: Seq[Expression]) =>
        functions.WordPieceEncode(exprs.head, v, unk),
      "scala_udf")
  }

  /** Register a FITTED unigram (SentencePiece-style) Viterbi segmenter
    * as `name(text)` — the t72 exact-integer DP reachable from SQL
    * text. `census`/`cv` come from [[operators.Unigram.censusCosts]]
    * (or an emFit round). */
  def registerUnigram(spark: SparkSession, census: Map[String, Long],
                      cv: Long, maxPieceSyms: Int,
                      name: String = "unigram_segment"): Unit = {
    val c = census.toSeq.sortBy(_._1) // deterministic expression equality
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (exprs: Seq[Expression]) =>
        functions.UnigramSegment(exprs.head, c, cv, maxPieceSyms),
      "scala_udf")
  }

  /** Register the testdata tables and the function library in one call —
    * a SQL user's session bootstrap. */
  def bootstrap(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerAll(spark, sfDir)
    enableSql(spark)
  }

  /** The cluster profile this engine is designed for (a ~1000-executor
    * job over ~100 TB of partitioned Parquet). Local test sessions set
    * shuffle.partitions to the core count instead; everything else
    * applies as-is.
    *
    *  - AQE on with skew-join splitting: hot keys in joins/aggregations
    *    re-plan at runtime instead of straggling;
    *  - coalescePartitions trims the fixed shuffle width after filters;
    *  - 128 MB scan splits / 256 MB shuffle targets keep task counts in
    *    the tens-of-thousands, not millions, at 100 TB;
    *  - shuffle.partitions sized ~2 tasks per core at 1000×16 cores —
    *    AQE coalesces down, skew split fans out.
    */
  val clusterProfile: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m",
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    "spark.sql.shuffle.partitions" -> "32768",
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")
}
