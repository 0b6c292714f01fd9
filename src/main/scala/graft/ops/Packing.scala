package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data export: concatenate documents in a
  * deterministic order and split the token stream at fixed budget
  * boundaries ("concat-and-chunk" — the standard pretraining packing
  * scheme). Each document is assigned the chunk where its first token
  * lands; a document whose tokens cross a boundary is flagged
  * (`straddles`) so the exporter can decide to split or pad.
  *
  * Scale design: packing is a prefix-sum, which is inherently sequential
  * — so the corpus is first sharded (`id % nShards`) and each shard packs
  * independently. The window is partitioned by shard: one shuffle on the
  * shard key, then partition-local cumulative sums. At 100 TB you set
  * nShards ~ cluster parallelism and every shard becomes an independent
  * output file group; no global ordering bottleneck exists.
  */
object Packing {

  /** Per-document chunk assignment.
    *
    * Output: (shard, id, n_tokens, cum_before, chunk_id, straddles) where
    * chunk_id = floor(cumulative-tokens-before / budgetTokens) within the
    * shard's id-ordered document stream.
    */
  def assignChunks(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, budgetTokens: Int): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1)
    val base = df.select(
      pmod(col(idCol), lit(nShards)).cast(LongType).as("shard"),
      col(idCol).as("id"),
      TextOps.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("cum_before") / lit(budgetTokens)))
      .withColumn("straddles", col("n_tokens") > 0 &&
        floor((col("cum_before") + col("n_tokens") - 1) / lit(budgetTokens)) > col("chunk_id"))
  }

  /** Chunk-level packing summary: documents, tokens, and boundary
    * straddlers per (shard, chunk). */
  def chunkSummary(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, budgetTokens: Int): DataFrame =
    assignChunks(df, idCol, textCol, nShards, budgetTokens)
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))

  /** [[assignChunks]] over a PRECOMPUTED per-document token count
    * (`countCol`) instead of the whitespace/regex count — the seam that
    * lets a trained tokenizer ([[Bpe.tokenCounts]]) drive the packing:
    * chunk budgets then mean model tokens, not word-ish proxies. Same
    * shard/prefix-sum shape (one shuffle on the shard key). */
  def assignChunksCounts(df: DataFrame, idCol: String, countCol: String,
      nShards: Int, budgetTokens: Int): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1)
    val base = df.select(
      pmod(col(idCol), lit(nShards)).cast(LongType).as("shard"),
      col(idCol).as("id"),
      col(countCol).cast(LongType).as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("cum_before") / lit(budgetTokens)))
      .withColumn("straddles", col("n_tokens") > 0 &&
        floor((col("cum_before") + col("n_tokens") - 1) / lit(budgetTokens)) > col("chunk_id"))
  }

  /** [[chunkSummary]] over precomputed counts. */
  def chunkSummaryCounts(df: DataFrame, idCol: String, countCol: String,
      nShards: Int, budgetTokens: Int): DataFrame =
    assignChunksCounts(df, idCol, countCol, nShards, budgetTokens)
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))

  /** Chunk assignment in a SUPPLIED read order: packs the token stream
    * along existing (`shardCol`, `orderCol`) coordinates instead of
    * [[assignChunks]]' `id % nShards` / id order — the seam that lets
    * [[Sampling.epochShuffle]]'s per-epoch permutation DRIVE the packing
    * (shard-major, position-minor is exactly the training read order).
    * Both windows partition by the same shard key, so Catalyst reuses
    * one hash partitioning across the rank and the prefix sum — the
    * epoch shuffle's single exchange is the composition's single
    * exchange too; only a partition-local re-sort (hash order →
    * position order) is added. */
  def assignChunksBy(df: DataFrame, shardCol: String, orderCol: String,
      textCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1)
    val base = df.select(
      col(shardCol).cast(LongType).as("shard"),
      col(orderCol).cast(LongType).as("pos"),
      TextOps.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("cum_before") / lit(budgetTokens)))
      .withColumn("straddles", col("n_tokens") > 0 &&
        floor((col("cum_before") + col("n_tokens") - 1) / lit(budgetTokens)) > col("chunk_id"))
  }

  /** [[chunkSummary]] over a supplied read order, with the position
    * span each chunk covers — first_pos/last_pos make the gate prove
    * the ORDER drove the packing, not just the totals. */
  def chunkSummaryBy(df: DataFrame, shardCol: String, orderCol: String,
      textCol: String, budgetTokens: Int): DataFrame =
    assignChunksBy(df, shardCol, orderCol, textCol, budgetTokens)
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
}
