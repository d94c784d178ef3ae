package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Sequence packing for LLM pre-training: assign documents to
  * fixed-token-budget context windows. Two standard layouts, both
  * deterministic (pure functions of (id, length)) so a DuckDB oracle can
  * hash-match the assignment itself, and both shard-parallel so no step
  * needs a global order at 100 TB:
  *
  *   - `packGreedy` — greedy first-fit WITHOUT document spanning: docs
  *     are streamed in id order within a shard and a new bin starts when
  *     the next doc would overflow the budget (an over-budget doc gets a
  *     bin of its own). The sequential fill state lives in one
  *     `mapPartitions` pass per shard — the only layout-correct place
  *     for it — after an explicit repartition-by-shard + in-partition
  *     sort, so each shard packs independently and in parallel.
  *
  *   - `chunkSpans` — the concat-and-chunk layout (documents
  *     concatenated in id order, token stream split every `budget`
  *     tokens, docs may span chunk boundaries): pure window arithmetic
  *     over the per-shard exclusive running token sum, no sequential
  *     state at all.
  *
  * Sharding is `id % shards` — deterministic, oracle-expressible, and
  * the unit of parallelism: at corpus scale pick shards ≈ cluster
  * cores so every shard's window/fill pass is one task's worth.
  */
object Packing {

  /** Greedy first-fit packing. Returns (doc_id, shard, bin) — bin ids
    * are dense per shard, in id order. */
  def packGreedy(df: DataFrame, idCol: String, lenCol: Column,
                 budget: Long, shards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepped = df.select(col(idCol).cast("long").as("id"),
        lenCol.cast("long").as("len"))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
      .as[(Long, Long, Long)]
    prepped
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions { it =>
        // a hash partition may hold several shards; fill state resets
        // on the sorted shard boundary
        var curShard = Long.MinValue
        var bin = 0
        var filled = 0L
        it.map { case (id, len, shard) =>
          if (shard != curShard) { curShard = shard; bin = 0; filled = len }
          else if (filled + len <= budget) { filled += len }
          else { bin += 1; filled = len }
          (id, shard, bin)
        }
      }
      .toDF("doc_id", "shard", "bin")
  }

  /** Concat-and-chunk spans: for each doc, the chunk index its first
    * token lands in, the chunk its last token lands in, and the offset
    * of its first token within that chunk. Zero-length docs pin both
    * spans to the start chunk. */
  /** Overlapping token windows per document (RAG/context-window prep):
    * windows of `size` tokens advancing by `stride` (< size ⇒ overlap
    * of size−stride), last window clipped to the doc end. Chunk count
    * is `1 + ceil(max(0, len−size)/stride)` — the standard convention:
    * every token is covered, no degenerate tail windows.
    *
    * Pure per-row arithmetic + explode: no shuffle, no state — the
    * narrow map shape that scales to any corpus. Emits (doc_id,
    * chunk_idx, start_tok, end_tok, n_toks), 1-based inclusive. */
  def chunkOverlap(df: DataFrame, idCol: String, lenCol: Column,
                   size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= size, "need 1 <= stride <= size")
    val len = lenCol.cast("long")
    df.select(col(idCol).as("doc_id"), len.as("len"))
      .filter($"len" > 0)
      .select($"doc_id", $"len",
        // ceil div on non-negative ints: (a + b - 1) div b
        expr(s"1L + (greatest(len - ${size}L, 0L) + ${stride}L - 1L) " +
          s"div ${stride}L").as("n_chunks"))
      .select($"doc_id", $"len",
        explode(sequence(lit(0L), $"n_chunks" - 1)).as("chunk_idx"))
      .select($"doc_id", $"chunk_idx",
        ($"chunk_idx" * stride + 1).as("start_tok"),
        least($"chunk_idx" * stride + size, $"len").as("end_tok"))
      .select($"doc_id", $"chunk_idx", $"start_tok", $"end_tok",
        ($"end_tok" - $"start_tok" + 1).as("n_toks"))
  }

  /** Assemble position-sorted token-id arrays per (shard, chunk) from
    * a (shard, chunk, pos, id) row stream — ONE shuffle; chunk groups
    * are budget-bounded by construction, so the per-group collect is
    * safe at any corpus size. Returns (shard, chunk, n_tokens,
    * token_ids array<long>). */
  def assembleShards(rows: DataFrame): DataFrame =
    rows.groupBy($"shard", $"chunk")
      .agg(count(lit(1)).as("n_tokens"),
        transform(array_sort(collect_list(struct($"pos", $"id"))),
          x => x.getField("id")).as("token_ids"))

  /** Materialize the packed training shards as the consumable parquet
    * artifact — array<long> token ids per (shard, chunk), partitioned
    * by shard so a trainer's data loader reads its shard's files and
    * nothing else (partition pruning on `shard`). This is the chain's
    * true last mile; the dash-joined STRING form in the t37 query
    * exists only for the driver's hash compare. */
  def writeShards(rows: DataFrame, path: String): Unit =
    assembleShards(rows).write.mode("overwrite")
      .partitionBy("shard").parquet(path)

  /** Read shards back (optionally one shard — partition-pruned). */
  def readShards(spark: org.apache.spark.sql.SparkSession, path: String,
                 shard: Option[Int] = None): DataFrame = {
    val df = spark.read.parquet(path)
    shard.map(s => df.filter($"shard" === s)).getOrElse(df)
  }

  def chunkSpans(df: DataFrame, idCol: String, lenCol: Column,
                 budget: Long, shards: Int): DataFrame = {
    val id = col(idCol).cast("long")
    val shard = pmod(id, lit(shards.toLong))
    val w = Window.partitionBy(shard).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val len = lenCol.cast("long")
    val cumExcl = coalesce(sum(len).over(w), lit(0L))
    df.select(id.as("doc_id"), shard.as("shard"), len.as("len"),
        cumExcl.as("cum_excl"))
      .select($"doc_id", $"shard",
        // integer div, not Column./ (double division — CLAUDE.md)
        expr(s"cum_excl div ${budget}L").as("start_chunk"),
        expr(s"if(len > 0, (cum_excl + len - 1) div ${budget}L, " +
          s"cum_excl div ${budget}L)").as("end_chunk"),
        pmod($"cum_excl", lit(budget)).as("chunk_offset"))
  }
}
