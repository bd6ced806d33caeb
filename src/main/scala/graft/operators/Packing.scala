package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing plan — the concat-and-chunk layout step of an LLM
  * training pipeline: documents are concatenated in the deterministic
  * shuffle order and chunked into fixed-length training sequences;
  * this operator computes, for every document, exactly where its
  * tokens land (shard, first/last sequence, offset) WITHOUT
  * materializing token streams.
  *
  * Not part of the reference's surface — a SURVEY.md §7.4 north-star
  * extension composing [[Sharding]].
  *
  * Scale shape: placement is a per-shard prefix sum — one shuffle on
  * `shard`, then a running-sum window INSIDE each shard (shards are
  * the parallel unit, sized thousands-of-docs each at 100 TB; there
  * is never a corpus-global window). All arithmetic is integer, so
  * the DuckDB oracle replays it bit-for-bit.
  */
object Packing {

  /** Per-doc placement: shard, okey-ordered position prefix sums, and
    * the half-open token interval [start, cum) chunked at `seqLen`:
    * `seq_first`/`seq_last` are the sequence ids holding the doc's
    * first/last token, `offset` the in-sequence position of its first
    * token. Docs with `seq_first != seq_last` straddle a boundary
    * (they get split across training sequences — the packing loss
    * metric). */
  def packPlan(docs: DataFrame, idCol: String, tokenCount: Column,
      nShards: Int, seed: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "packPlan needs seqLen > 0")
    val sharded = Sharding.withShard(
      docs.withColumn("n_tok", tokenCount.cast("long")), idCol, nShards, seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("okey").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("start", col("cum") - col("n_tok"))
      .withColumn("seq_first", floor(col("start") / seqLen).cast("long"))
      .withColumn("seq_last", floor((col("cum") - 1) / seqLen).cast("long"))
      .withColumn("offset", pmod(col("start"), lit(seqLen.toLong)))
  }

  /** Per-shard packing summary: doc/token totals, how many `seqLen`
    * sequences the shard fills (ceil), and how many docs straddle a
    * sequence boundary. */
  def packSummary(docs: DataFrame, idCol: String, tokenCount: Column,
      nShards: Int, seed: String, seqLen: Int): DataFrame =
    packPlan(docs, idCol, tokenCount, nShards, seed, seqLen)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tok")).as("tokens"),
        floor((max(col("cum")) + seqLen - 1) / seqLen).cast("long").as("n_seqs"),
        sum(when(col("seq_first") =!= col("seq_last"), 1L).otherwise(0L)).as("split_docs"))
      .orderBy(col("shard").asc)
}
