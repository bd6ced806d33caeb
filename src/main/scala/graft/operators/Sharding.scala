package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling and training-shard assignment — the
  * last step of a training-data pipeline: give every document a
  * reproducible pseudo-random position, split the corpus into N
  * shards, and write shard files whose concatenation in shard order
  * replays the full shuffled sequence.
  *
  * Not part of the reference's surface (its pipeline ends at the
  * analytics marts, /root/reference/dbt/models/marts/) — this is a
  * SURVEY.md §7.4 north-star extension for LLM-data workloads.
  *
  * Design rules, in 100 TB order of importance:
  *  - **No global sort for shard ASSIGNMENT.** `shard` is a pure
  *    map-side function of the order key (48-bit hex-prefix value mod
  *    N), so assignment is embarrassingly parallel and any worker can
  *    recompute a row's shard without coordination.
  *  - **Engine-portable order key.** md5(seed:id) — not xxhash64/rand
  *    — so a different engine (the DuckDB oracle, a Python reader)
  *    reproduces the exact order. Changing `seed` reshuffles; keeping
  *    it replays byte-identically (epoch reproducibility).
  *  - **Position is per-shard**, not global: row_number windows over
  *    each shard independently (parallel over N), never over the
  *    whole corpus.
  *  - The hex fold is UNROLLED arithmetic (12 chained `when`s), not an
  *    `aggregate` HOF — it stays inside WholeStageCodegen (see memory:
  *    interpreted lambdas re-evaluate per downstream reference).
  */
object Sharding {

  /** Reproducible pseudo-random order key: md5 over seed and id.
    * Distinct ids ⇒ distinct keys (md5 collisions aside — positions
    * additionally tiebreak on id so even a collision stays total). */
  def orderKey(seed: String, id: Column): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** First `chars` hex chars of `key` as a non-negative long (4 bits
    * per char; `chars` ≤ 15 keeps the fold inside 60 bits). Unrolled
    * so codegen sees plain arithmetic, no lambda. */
  def hexPrefixValue(key: Column, chars: Int = 12): Column = {
    require(chars >= 1 && chars <= 15, "hexPrefixValue supports 1..15 hex chars")
    (1 to chars).foldLeft(lit(0L)) { (acc, i) =>
      val a = ascii(substring(key, i, 1))
      acc * 16 + when(a >= 97, a - 87).otherwise(a - 48).cast("long")
    }
  }

  /** Adds `okey` (the deterministic shuffle key) and `shard`
    * (0..nShards-1, hash-assigned — balanced in expectation, no
    * coordination). */
  def withShard(df: DataFrame, idCol: String, nShards: Int, seed: String): DataFrame = {
    require(nShards > 0, "withShard needs nShards > 0")
    df.withColumn("okey", orderKey(seed, col(idCol)))
      .withColumn("shard", (hexPrefixValue(col("okey")) % nShards).cast("int"))
  }

  /** Adds `pos` — the row's 1-based position within its shard under
    * the shuffled order. Windows per shard (parallel over N shards),
    * never over the global corpus. */
  def withPosition(sharded: DataFrame, idCol: String): DataFrame =
    sharded.withColumn("pos", row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("okey"), col(idCol))))

  /** Writes `df` as `nShards` parquet shard files under `outDir`,
    * RANGE-partitioned on the order key: shard boundaries are strict
    * key ranges, so reading shard 0, 1, … in order and concatenating
    * replays one global deterministic shuffle of the corpus — the
    * property a training loader needs for multi-epoch determinism
    * with per-shard parallel readers.
    *
    * Range (not mod) sharding is deliberate here: boundaries come
    * from Spark's range sampler, so shard sizes are approximate — the
    * trade for a globally ordered concatenation without a global
    * sort. Use [[withShard]] when exact mod-N assignment matters more
    * than cross-shard order. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, seed: String,
      outDir: String): Unit = {
    require(nShards > 0, "writeShards needs nShards > 0")
    df.withColumn("okey", orderKey(seed, col(idCol)))
      .repartitionByRange(nShards, col("okey"), col(idCol))
      .sortWithinPartitions(col("okey"), col(idCol))
      .write.mode("overwrite").parquet(outDir)
  }
}
