package graft.operators

import graft.sources.SwapFs
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** MERGE-emulation upsert without a table format (SURVEY.md §2.3 J3,
  * §7.4 risk #1; reference MERGE at
  * /root/reference/sql/02_load_data.sql:78-165).
  *
  * Logical form: `target ANTI JOIN source ∪ source` — matched keys
  * take the source row wholesale (reference updates every column on
  * match), unmatched target rows survive, new keys insert. Re-running
  * with the same source is idempotent.
  *
  * Physical form for parquet directories: write the merged result to
  * a temp sibling path, then atomically swap directories — never read
  * and overwrite the same location in one job (Spark would corrupt
  * the input it is still scanning). All filesystem operations go
  * through the Hadoop `FileSystem` API ([[graft.sources.SwapFs]]), so
  * the same code runs on `file:`, HDFS, and object stores; the
  * atomic-rename caveat for flat object stores is documented there.
  *
  * Single-writer fencing: every path-mutating entry point runs inside
  * [[SwapFs.withLease]] — a second concurrent merge against the same
  * target fails loudly instead of interleaving swap renames with the
  * first (which could destroy the `.old-*` recovery copies both crash
  * protocols depend on). A lease older than the stale threshold is
  * presumed abandoned and taken over with a warning.
  *
  * Scale: the anti-join shuffles both sides by key once (or broadcasts
  * the source batch when it is small — the common incremental case,
  * which Catalyst/AQE picks automatically); unmatched target rows are
  * NOT rewritten row-by-row anywhere except the final write, which is
  * unavoidable without a transactional format's file-level rewrite.
  */
object Upsert {

  /** Pure-frame upsert: rows in `source` replace same-key rows in
    * `target`; all other target rows pass through. */
  def upsertBatch(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source, keys, "left_anti").unionByName(source)

  /** Phase timer for the merge paths, dormant unless
    * SPARK_GRAFT_MERGE_TIMING=1 — per-phase wall-clock to stderr, the
    * measurement tool behind the fixed-latency accounting in SCALE.md. */
  private val mergeTiming = sys.env.get("SPARK_GRAFT_MERGE_TIMING").contains("1")
  private def timed[T](label: String)(f: => T): T =
    if (!mergeTiming) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"MERGE-PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

  /** Keyed upsert into a parquet directory via rename-based swap:
    * write merged → tmp, rename target → .old (atomic on
    * rename-capable filesystems), rename tmp → target, drop .old. No
    * crash window loses data — at worst the previous state survives
    * at `.old-merge` and is restored on the next call. Creates the
    * target on first use. Fenced by a single-writer lease (sibling
    * `.lock-merge` file). Returns the merged row count. */
  def mergeIntoPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String],
      leaseStaleMs: Long = SwapFs.DefaultLeaseStaleMs): Long = {
    val io = SwapFs.forPath(spark, targetPath)
    io.withLease(targetPath, leaseStaleMs) {
      val tgt = io.path(targetPath)
      val tmp = io.path(targetPath + ".tmp-merge")
      val old = io.path(targetPath + ".old-merge")
      // crash recovery: a missing target with a surviving .old means a
      // prior run died mid-swap — restore before merging
      if (!io.exists(tgt) && io.exists(old)) io.rename(old, tgt)
      val merged =
        if (io.exists(tgt)) upsertBatch(spark.read.parquet(targetPath), source, keys)
        else source
      io.delete(tmp)
      // row count via observe metrics on the write job itself — a
      // re-read-and-count would scan the whole merged output a second
      // time, which at scale doubles the cost of every merge
      val obs = Observation()
      merged.observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(tmp.toString)
      val n = obs.get("n").asInstanceOf[Long]
      io.delete(old)
      if (io.exists(tgt)) io.rename(tgt, old)
      io.rename(tmp, tgt)
      io.delete(old)
      n
    }
  }

  /** PARTITION-SCOPED MERGE into a hive-partitioned parquet layout —
    * the incremental form [[mergeIntoPath]] cannot give (it rewrites
    * the WHOLE target every batch, documented): only partitions that
    * can change are rewritten. Affected set = partitions holding
    * source rows ∪ target partitions holding MATCHED keys (found with
    * one column-pruned semi probe — the scan reads the key columns
    * only; partition values come from directory names). Untouched
    * partitions' files are never rewritten (byte-identical after the
    * merge — UpsertSpec pins this), so a date-partitioned 100 TB fact
    * pays O(touched partitions) per batch, not O(target).
    *
    * The matched-key probe is itself BOUNDED by a per-partition key
    * index (`_keyidx` inside the target — [[KeyIdx]]): one tiny
    * parquet file per partition holding (a) min/max of every key
    * column and (b) a capped per-partition Bloom bitset over the key
    * TUPLES. Before the semi probe runs, the batch's key ranges and
    * key-tuple hashes are tested against the index and the probe scan
    * is partition-pruned to the candidates. Range intersection bounds
    * the probe for range-clustered keys (sequential ids, dates); the
    * Bloom sidecar bounds it for HASH-DISTRIBUTED keys — the
    * reference's own surrogate-key type (sha256 `observation_sk`,
    * /root/reference/sql/02_load_data.sql:86-91), where every
    * partition's [min,max] spans the whole key space and range
    * pruning alone degrades to the full O(target) scan. With the
    * sidecar, a batch touching one partition of a 100 TB fact reads
    * one partition's key columns whichever key shape it has
    * (UpsertSpec pins this with scan-metric accounting for BOTH key
    * shapes; ProbeScaling measures both curves flat in the
    * untouched-partition count).
    *
    * Index soundness is crash-first: a `_PENDING` marker is created
    * inside the index before any data-directory swap and removed only
    * after the post-swap index rewrite — any crash in between leaves
    * the marker, and a marked (or missing, malformed, differently
    * keyed/typed — the index carries a binding signature of partCol,
    * key names, key types, and Bloom geometry) index degrades to the
    * full-scan probe and is rebuilt in the same merge. Index rows for
    * rewritten partitions are recomputed EXACTLY from the just-written
    * data (never widened), so pruning power does not decay under
    * key-churn; untouched partitions keep their rows byte-identical.
    * External writers that bypass this method must drop `_keyidx`
    * ([[graft.sources.LayerWriter.overwriteBatchPartitions]] does).
    *
    * Semantics are identical to [[mergeIntoPath]]: matched keys take
    * the source row wholesale — INCLUDING a changed partition value
    * (the old row's partition is in the affected set via the semi
    * probe, so the row MOVES; a scoped-to-source-partitions-only
    * design would leave a stale duplicate behind). A partition whose
    * rows ALL move away is deleted. Affected partition values are a
    * bounded driver fetch capped at `maxPartitions` (loud failure —
    * a batch touching more partitions than that should take the full
    * [[mergeIntoPath]] path instead). Physical form: merged affected
    * partitions land in a temp sibling, then swap per-partition-
    * directory (atomic renames on rename-capable filesystems). A
    * crash mid-swap leaves each partition either old or new, never
    * mixed; re-running the same merge is idempotent and heals —
    * EXPLICITLY: entry first restores any `*.old-pmerge` leftover
    * whose live directory is missing (and drops leftovers whose
    * install completed), so crashed-partition rows rejoin the probe
    * (the `_PENDING` marker guarantees no index pruning can run until
    * the index is rebuilt; UpsertSpec pins both windows). Fenced by a
    * single-writer lease. Creates the target (full partitioned write)
    * on first use. Partition values compare in CAST-to-string space,
    * matching Spark's own partition-path rendering for
    * string/date/integral columns. Returns the merged row count over
    * the AFFECTED partitions. */
  def mergePartitionedPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String,
      maxPartitions: Int = 4096,
      leaseStaleMs: Long = SwapFs.DefaultLeaseStaleMs): Long = {
    require(!keys.contains(partCol),
      s"mergePartitionedPath: partition column $partCol cannot also be a merge key")
    val io = SwapFs.forPath(spark, targetPath)
    io.withLease(targetPath, leaseStaleMs) {
      mergePartitionedLocked(spark, io, targetPath, source, keys, partCol, maxPartitions)
    }
  }

  private def mergePartitionedLocked(spark: SparkSession, io: SwapFs, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String, maxPartitions: Int): Long = {
    require(graft.sources.ManifestStore.generations(io, targetPath).isEmpty,
      s"mergePartitionedPath: $targetPath is manifest-committed — use mergePartitionedManifest " +
        "(mixing in-place swaps into a manifest target would mutate referenced directories)")
    val tgt = io.path(targetPath)
    val old = io.path(targetPath + ".old-merge")
    if (!io.exists(tgt) && io.exists(old)) io.rename(old, tgt)
    if (!io.exists(tgt)) {
      val obs0 = Observation()
      source.observe(obs0, count(lit(1)).as("n"))
        .write.mode("overwrite").partitionBy(partCol).parquet(targetPath)
      // index from the WRITTEN layout, not a second execution of the
      // caller's source plan (which may be an arbitrarily expensive
      // upstream job): a column-pruned read-back of the fresh parquet
      // yields the same per-partition stats for one metadata-cheap
      // scan — the merge path's own tmp-read pattern
      val wroteSchema = StructType(source.schema.map(f =>
        if (f.name == partCol) f.copy(dataType = StringType) else f))
      KeyIdx.rebuild(spark, io, targetPath,
        spark.read.schema(wroteSchema).parquet(targetPath), partCol, keys)
      return obs0.get("n").asInstanceOf[Long]
    }
    val prefix = s"$partCol="
    // crash recovery BEFORE anything reads the target: a leftover
    // `d=X.old-pmerge` means a prior run died inside the swap window.
    // If d=X is absent the install never happened — rename the old
    // copy back (the pre-merge rows must rejoin the probe, or the
    // swap loop's leading delete would destroy the only copy: silent
    // data loss). If d=X exists the install completed — drop the
    // leftover. The prior run's `_PENDING` marker is still in place
    // (it is only removed after a completed post-swap index rewrite),
    // so no stale index row can prune the restored rows out of the
    // probe below.
    for (name <- io.listDirNames(tgt) if name.endsWith(".old-pmerge")) {
      val live = new HPath(tgt, name.stripSuffix(".old-pmerge"))
      val leftover = new HPath(tgt, name)
      if (io.exists(live)) io.delete(leftover)
      else io.rename(leftover, live)
    }
    val target = spark.read.parquet(targetPath)
    // ONE thin (partition, keys) frame is consulted several times per
    // merge (partition values, range bounds, Bloom positions, the semi
    // probe) — persist it so the caller's source plan (often a full
    // dedupe over an upstream fact) executes once, not once per
    // consultation. srcKeys needs no dedup of its own: the bounds
    // aggregate, the position fetch (distinct inside), and the semi
    // join are all duplicate-insensitive.
    val srcPK = source.select(col(partCol).cast("string").as("__graft_p") +: keys.map(col): _*)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val srcKeys = srcPK.select(keys.map(col): _*)
    // bounded driver fetch: a batch accidentally keyed on a
    // high-cardinality partition column must not materialize every
    // distinct value before the loud budget failure below fires —
    // the truncated set alone already exceeds maxPartitions
    val srcPartRows = timed("srcparts")(srcPK.select(col("__graft_p")).distinct()
      .limit(maxPartitions + 1).collect())
    val srcHasNull = srcPartRows.exists(_.isNullAt(0))
    val srcPartVals = srcPartRows.filterNot(_.isNullAt(0)).map(_.getString(0))
    val srcPartCanon = srcPartVals.toSet ++ (if (srcHasNull) Set(KeyIdx.NullPart) else Set.empty)
    // candidate-partition prefilter from the key index: the probe
    // below only READS partitions whose recorded key ranges AND Bloom
    // sidecars admit the batch — O(touched) I/O instead of O(target)
    val validIdx = timed("readValid")(KeyIdx.readValid(spark, io, targetPath, target.schema,
      io.listDirNames(tgt), prefix, partCol, keys))
    val probed = validIdx match {
      case Some(idx) =>
        val cand = timed("candidates")(KeyIdx.candidates(idx, srcKeys, srcPartCanon, target.schema, keys))
        val hasDefault = cand.contains(KeyIdx.NullPart)
        val vals = cand.filterNot(_ == KeyIdx.NullPart)
        val inCand = col(partCol).cast("string").isin(vals.toIndexedSeq: _*)
        target.filter(if (hasDefault) inCand || col(partCol).isNull else inCand)
      case None => target
    }
    val hitRows = timed("affected")(probed.join(srcKeys, keys, "left_semi")
      .select(col(partCol).cast("string").as("p")).distinct()
      .limit(maxPartitions + 1).collect())
    val hasNull = srcHasNull || hitRows.exists(_.isNullAt(0))
    val parts = (srcPartVals ++ hitRows.filterNot(_.isNullAt(0)).map(_.getString(0))).distinct
    require(parts.length + (if (hasNull) 1 else 0) <= maxPartitions,
      s"mergePartitionedPath: batch touches more than $maxPartitions partitions " +
        s"of $targetPath — use mergeIntoPath (full rewrite) for rewrite-everything batches")
    val inParts = col(partCol).cast("string").isin(parts.toIndexedSeq: _*)
    val scoped = target.filter(if (hasNull) inParts || col(partCol).isNull else inParts)
    val merged = upsertBatch(scoped, source, keys)
    val tmp = io.path(targetPath + ".tmp-pmerge")
    io.delete(tmp)
    val obs = Observation()
    timed("write")(merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString))
    val n = obs.get("n").asInstanceOf[Long]
    // EXACT index rows for the affected partitions, computed from the
    // just-written tmp (column-pruned read) BEFORE the swap moves its
    // directories, staged in the index's own temp sibling. Exact —
    // never widened — so pruning power does not decay under key churn
    // (the r13 design widened old∪new and only ever grew; this
    // rewrite replaces it, with the `_PENDING` marker carrying crash
    // soundness instead of over-inclusion).
    val tmpSchema = StructType(merged.schema.map(f =>
      if (f.name == partCol) f.copy(dataType = StringType) else f))
    val staged = validIdx.map { idx =>
      timed("stage-idx")(KeyIdx.stage(spark, io, targetPath,
        spark.read.schema(tmpSchema).parquet(tmp.toString), partCol, keys,
        target.schema, idx.mBits, idx.nHash, idx.nextVer))
    }
    // marker BEFORE the first live-directory mutation; removed only
    // after the post-swap index rewrite completes. Any crash between
    // leaves the marker and the next merge full-probes and rebuilds —
    // the index can never be trusted against data it wasn't written
    // for, whichever side of a torn swap the layout landed on.
    KeyIdx.markPending(io, targetPath)
    val tmpDirNames = io.listDirNames(tmp).filter(_.startsWith(prefix))
    for (name <- tmpDirNames) {
      val dst = new HPath(tgt, name)
      val oldPart = io.path(dst.toString + ".old-pmerge")
      io.delete(oldPart)
      if (io.exists(dst)) io.rename(dst, oldPart)
      io.rename(new HPath(tmp, name), dst)
      io.delete(oldPart)
    }
    // an affected partition ABSENT from the merged output lost every
    // row (all its keys moved to other partitions) — drop it, or the
    // stale rows would duplicate their moved selves
    val affectedNames = parts.map(v => prefix + ExternalCatalogUtils.escapePathName(v)).toSet ++
      (if (hasNull) Set(prefix + ExternalCatalogUtils.DEFAULT_PARTITION_NAME) else Set.empty[String])
    val removedNames = affectedNames -- tmpDirNames
    for (name <- removedNames)
      io.delete(new HPath(tgt, name))
    // post-swap index rewrite: install the staged exact rows (and drop
    // rows for deleted partitions), or rebuild from scratch when the
    // pre-merge index was missing/invalid (one-time backfill, same
    // cost class as the full probe this merge just paid)
    timed("install-idx")(staged match {
      case Some(stagedPath) =>
        KeyIdx.install(spark, io, targetPath, stagedPath, partCol,
          validIdx.get.nextVer, io.listDirNames(tgt), prefix)
      case None =>
        KeyIdx.rebuild(spark, io, targetPath,
          spark.read.schema(tmpSchema).parquet(targetPath), partCol, keys)
    })
    KeyIdx.clearPending(io, targetPath)
    io.delete(tmp)
    n
    } finally srcPK.unpersist(blocking = false)
  }

  /** MANIFEST-COMMITTED partition-scoped MERGE — the flat-object-store
    * form of [[mergePartitionedPath]] ([[graft.sources.ManifestStore]]
    * for the commit protocol and why it exists). Identical MERGE
    * semantics, probe pruning (the same `_keyidx`, validated against
    * the manifest's live-partition list instead of directory names),
    * partition budget, fencing, and row-count return; different
    * physical install: affected partitions land in a fresh generation
    * directory and become visible through ONE manifest-file commit,
    * so a reader ([[readManifest]]) sees exactly the pre-merge or
    * post-merge table even where directory renames are torn
    * copy+delete. Referenced directories are never mutated;
    * superseded generations are garbage-collected after the next
    * commit. Opt-in per target: a target created by this method must
    * always be merged by it (both modes guard against mixing). */
  def mergePartitionedManifest(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String,
      maxPartitions: Int = 4096,
      leaseStaleMs: Long = SwapFs.DefaultLeaseStaleMs): Long = {
    require(!keys.contains(partCol),
      s"mergePartitionedManifest: partition column $partCol cannot also be a merge key")
    val io = SwapFs.forPath(spark, targetPath)
    io.withLease(targetPath, leaseStaleMs) {
      mergeManifestLocked(spark, io, targetPath, source, keys, partCol, maxPartitions)
    }
  }

  /** Resolve a manifest-committed target to a DataFrame: the highest
    * committed generation's live partitions, partition column
    * reconstructed from the directory names. Loud failure on a
    * non-manifest target. */
  def readManifest(spark: SparkSession, targetPath: String): DataFrame = {
    val io = SwapFs.forPath(spark, targetPath)
    val state = graft.sources.ManifestStore.read(io, targetPath).getOrElse(
      sys.error(s"readManifest: $targetPath has no committed manifest — not a manifest target " +
        "(plain partitioned layouts read directly with spark.read.parquet)"))
    manifestFrame(spark, targetPath, state)
  }

  private def manifestFrame(spark: SparkSession, targetPath: String,
      state: graft.sources.ManifestStore.State): DataFrame = {
    // one read per generation group (basePath recovers the partition
    // column from the directory names), unioned with the head group's
    // schema as the alignment target — partition-column TYPE INFERENCE
    // runs per group and may disagree across generations (a group
    // holding only the null partition infers differently), so later
    // groups cast to the head's types. Groups sort by NUMERIC
    // generation, newest first, so the cast anchor is deterministically
    // the highest generation's schema (a lexicographic sort would rank
    // '_g10' before '_g2' and let the anchor flip between merges)
    val byGen = state.parts.values.groupBy(_.takeWhile(_ != '/')).toSeq
      .sortBy { case (gen, _) => -gen.drop(2).toLong }
    val frames = byGen.map { case (gen, rels) =>
      spark.read.option("basePath", s"$targetPath/$gen")
        .parquet(rels.map(r => s"$targetPath/$r").toSeq: _*)
    }
    val head = frames.head
    frames.tail.foldLeft(head) { (acc, f) =>
      acc.unionByName(f.select(head.schema.map(fd => col(fd.name).cast(fd.dataType)): _*))
    }
  }

  private def mergeManifestLocked(spark: SparkSession, io: SwapFs, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String, maxPartitions: Int): Long = {
    import graft.sources.ManifestStore
    val prefix = s"$partCol="
    val tgt = io.path(targetPath)
    require(!io.listDirNames(tgt).exists(_.startsWith(prefix)),
      s"mergePartitionedManifest: $targetPath holds an in-place partitioned layout — " +
        "use mergePartitionedPath, or migrate by rewriting into a fresh manifest target")
    val state0 = ManifestStore.read(io, targetPath)
    if (state0.isEmpty) {
      val gen0 = s"$targetPath/_g0"
      io.delete(io.path(gen0))
      val obs0 = Observation()
      source.observe(obs0, count(lit(1)).as("n"))
        .write.mode("overwrite").partitionBy(partCol).parquet(gen0)
      val parts = io.listDirNames(io.path(gen0)).filter(_.startsWith(prefix))
      ManifestStore.commit(io, targetPath,
        ManifestStore.State(0L, parts.map(n => n -> s"_g0/$n").toMap))
      val wroteSchema = StructType(source.schema.map(f =>
        if (f.name == partCol) f.copy(dataType = StringType) else f))
      KeyIdx.rebuild(spark, io, targetPath,
        spark.read.schema(wroteSchema).parquet(gen0), partCol, keys)
      return obs0.get("n").asInstanceOf[Long]
    }
    val state = state0.get
    val target = manifestFrame(spark, targetPath, state)
    val srcPK = source.select(col(partCol).cast("string").as("__graft_p") +: keys.map(col): _*)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val srcKeys = srcPK.select(keys.map(col): _*)
    val srcPartRows = srcPK.select(col("__graft_p")).distinct()
      .limit(maxPartitions + 1).collect()
    val srcHasNull = srcPartRows.exists(_.isNullAt(0))
    val srcPartVals = srcPartRows.filterNot(_.isNullAt(0)).map(_.getString(0))
    val srcPartCanon = srcPartVals.toSet ++ (if (srcHasNull) Set(KeyIdx.NullPart) else Set.empty)
    val validIdx = KeyIdx.readValid(spark, io, targetPath, target.schema,
      state.parts.keySet, prefix, partCol, keys)
    val probed = validIdx match {
      case Some(idx) =>
        val cand = KeyIdx.candidates(idx, srcKeys, srcPartCanon, target.schema, keys)
        val hasDefault = cand.contains(KeyIdx.NullPart)
        val vals = cand.filterNot(_ == KeyIdx.NullPart)
        val inCand = col(partCol).cast("string").isin(vals.toIndexedSeq: _*)
        target.filter(if (hasDefault) inCand || col(partCol).isNull else inCand)
      case None => target
    }
    val hitRows = probed.join(srcKeys, keys, "left_semi")
      .select(col(partCol).cast("string").as("p")).distinct()
      .limit(maxPartitions + 1).collect()
    val hasNull = srcHasNull || hitRows.exists(_.isNullAt(0))
    val parts = (srcPartVals ++ hitRows.filterNot(_.isNullAt(0)).map(_.getString(0))).distinct
    require(parts.length + (if (hasNull) 1 else 0) <= maxPartitions,
      s"mergePartitionedManifest: batch touches more than $maxPartitions partitions " +
        s"of $targetPath — rewrite into a fresh generation wholesale instead")
    val inParts = col(partCol).cast("string").isin(parts.toIndexedSeq: _*)
    val scoped = target.filter(if (hasNull) inParts || col(partCol).isNull else inParts)
    val merged = upsertBatch(scoped, source, keys)
    val tmp = io.path(targetPath + ".tmp-pmerge")
    io.delete(tmp)
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    val tmpSchema = StructType(merged.schema.map(f =>
      if (f.name == partCol) f.copy(dataType = StringType) else f))
    val staged = validIdx.map { idx =>
      KeyIdx.stage(spark, io, targetPath,
        spark.read.schema(tmpSchema).parquet(tmp.toString), partCol, keys,
        target.schema, idx.mBits, idx.nHash, idx.nextVer)
    }
    KeyIdx.markPending(io, targetPath)
    // install into a FRESH generation: these renames move just-written
    // unreferenced data — a torn copy here is invisible (nothing
    // resolves through it until the manifest commits below)
    val newGen = state.gen + 1
    val genDir = io.path(s"$targetPath/_g$newGen")
    io.delete(genDir) // stale leftover from a crashed attempt at this generation
    io.fs.mkdirs(genDir)
    val tmpDirNames = io.listDirNames(tmp).filter(_.startsWith(prefix))
    for (name <- tmpDirNames)
      io.rename(new HPath(tmp, name), new HPath(genDir, name))
    val affectedNames = parts.map(v => prefix + ExternalCatalogUtils.escapePathName(v)).toSet ++
      (if (hasNull) Set(prefix + ExternalCatalogUtils.DEFAULT_PARTITION_NAME) else Set.empty[String])
    val removedNames = affectedNames -- tmpDirNames
    val newParts = (state.parts -- removedNames -- tmpDirNames) ++
      tmpDirNames.map(nm => nm -> s"_g$newGen/$nm")
    // THE commit: one manifest file; before it readers resolve the old
    // table, after it the new one — never a mix
    ManifestStore.commit(io, targetPath, ManifestStore.State(newGen, newParts))
    staged match {
      case Some(stagedPath) =>
        KeyIdx.install(spark, io, targetPath, stagedPath, partCol,
          validIdx.get.nextVer, newParts.keySet, prefix)
      case None =>
        KeyIdx.rebuild(spark, io, targetPath, readManifest(spark, targetPath), partCol, keys)
    }
    KeyIdx.clearPending(io, targetPath)
    ManifestStore.gc(io, targetPath)
    io.delete(tmp)
    n
    } finally srcPK.unpersist(blocking = false)
  }
}

/** The per-partition key index behind [[Upsert.mergePartitionedPath]]
  * — `<target>/_keyidx/`, underscore-prefixed so Spark's file index
  * never picks it up as data.
  *
  * Layout: versioned CHUNK files (`c<ver>-<n>.parquet`) holding one
  * row per partition the writing merge touched; readers take the
  * max-`ver` row per partition, and [[install]] compacts back to one
  * chunk past [[MaxChunks]] files. Per-merge maintenance is therefore
  * O(1) files and O(affected partitions) bytes, never O(all
  * partitions) — at a 100 TB fact's 3–10k partitions a monolithic
  * index file would make every merge pay a full index rewrite, while
  * a file-per-partition layout (measured) makes a broad batch pay one
  * parquet-writer open per touched partition. Each row:
  *
  *  - `p_<partCol>`: the partition value in CAST-to-string space
  *    (NULL canonicalized to Hive's default-partition name so index
  *    joins never drop it);
  *  - `min_<key>` / `max_<key>` per key column, in the key's native
  *    type — named after the ACTUAL key columns, so an index built
  *    for different keys (or a renamed key) can never validate
  *    against this merge's definition;
  *  - `pb`/`pbm`/`pbk`: a Bloom bitset over
  *    `xxhash64(i, key₁, …, keyₙ)` double-hashed key TUPLES, with its
  *    geometry — stored as a SPARSE map of set 64-bit words (word
  *    index → word), so the row costs O(set bits), not O(cap).
  *    NULL `pb` = always-candidate (the partition's key
  *    cardinality saturated the capped bitset — over-inclusive, so
  *    pruning stays sound). Keys hash through the TARGET's column
  *    types on both build and probe side (a batch with coercible but
  *    differently-typed keys would otherwise hash differently —
  *    xxhash64 is type-sensitive — and a false NEGATIVE here is data
  *    loss, not a missed optimization);
  *  - `sig`: the binding signature — partCol, key names, key types,
  *    Bloom geometry. [[readValid]] recomputes the expected signature
  *    from the CURRENT target schema and merge definition and rejects
  *    any mismatch (the r13 index validated by positional column
  *    names only, so a same-arity key swap could prune against the
  *    wrong column's ranges and silently miss matched keys).
  *
  * Sizing: per-partition bitsets are sized for the partition's
  * distinct-tuple count at fpp ≈ [[KeyIdx.TargetFpp]], floored at
  * 2^17 and capped at [[KeyIdx.MaxPartBloomBits]] (2^22 bits =
  * 512 KiB). Within budget a one-partition batch probes ~one
  * partition even with sha256-distributed keys; a partition whose
  * cardinality outgrows the cap saturates and degrades to
  * always-candidate for itself only. The reference's own fact shape
  * (~1.5k entities per trade date) sits orders of magnitude inside
  * the budget. Geometry is chosen at rebuild time and held fixed
  * until the next rebuild so rows stay mergeable.
  */
private[operators] object KeyIdx {

  /** Index directory name inside a partitioned target. */
  val Dir = "_keyidx"

  /** Marker file inside [[Dir]]: present ⇔ a merge's swap window is
    * (or was, at a crash) open and the index must not be trusted. */
  val PendingName = "_PENDING"

  /** Canonical index representation of the NULL partition value. */
  val NullPart: String = ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** Target per-tuple false-positive rate for the per-partition Bloom
    * sidecars. The cost of a false positive is one extra partition's
    * key columns in the probe scan, paid per BATCH KEY that hits it —
    * 1e-4 keeps the expected false-candidate count ≪ 1 partition for
    * thousand-key batches against thousands of partitions. */
  val TargetFpp = 1e-4

  /** Per-partition bitset cap: 2^22 bits = 512 KiB — holds ~200k
    * distinct tuples at [[TargetFpp]]. Beyond it the partition's
    * bitset saturates and is stored as NULL (always-candidate). */
  val MaxPartBloomBits: Int = 1 << 22

  /** Per-partition bitset floor: 2^17 bits = 16 KiB — headroom so an
    * index born on a small partition keeps pruning as it grows. */
  val MinPartBloomBits: Int = 1 << 17

  /** Distinct-key-tuple budget for the batch side of the Bloom
    * candidate test (a bounded driver fetch of position arrays,
    * ≤ ~1.8 MiB at 7 probes). Batches beyond it skip the Bloom
    * refinement and fall back to range-only pruning — at that batch
    * size the probe is no longer the dominant cost of the merge. */
  val BatchProbeMax: Int = 1 << 16

  private def pName(partCol: String) = s"p_$partCol"

  private def canonicalP(partCol: String): Column =
    coalesce(col(partCol).cast("string"), lit(NullPart))

  private def expectedCols(partCol: String, keys: Seq[String]): Seq[String] =
    pName(partCol) +: (keys.flatMap(k => Seq(s"min_$k", s"max_$k")) ++
      Seq("pb", "pbm", "pbk", "sig", "ver"))

  /** The binding signature for the current merge definition against
    * the current target schema, with the geometry suffix left to the
    * row's own recorded values. */
  private def sigPrefix(partCol: String, keys: Seq[String], schema: StructType): String =
    s"v2|part=$partCol|keys=" +
      keys.map(k => s"$k:${schema(k).dataType.sql}").mkString(",")

  private def keyType(schema: StructType, k: String): DataType = schema(k).dataType

  /** `xxhash64(i, key₁…keyₙ)` double-hash positions, keys cast to the
    * target's column types (see class doc). */
  private def posCols(schema: StructType, keys: Seq[String], mBits: Int, nHash: Int): Seq[Column] = {
    val casted = keys.map(k => col(k).cast(keyType(schema, k)))
    (0 until nHash).map(i =>
      pmod(xxhash64((lit(i) +: casted): _*), lit(mBits.toLong)).cast("int"))
  }

  private def allKeysNotNull(keys: Seq[String]): Column =
    keys.map(col(_).isNotNull).reduce(_ && _)

  /** One exact index row per partition of `df`: ranges + Bloom bitset
    * at the given geometry. Two column-pruned aggregates over `df`
    * (both shuffle only (partition, small-payload) rows). The bitset
    * is stored SPARSE — a map of set 64-bit words keyed by word index
    * — both because most partitions set a small fraction of the capped
    * bitset (the index stays proportional to the keys, not the cap)
    * and because a dense array would need a per-index `transform`
    * whose map lookup CollapseProject re-inlines PER ELEMENT
    * (measured: a 200k-key partition's index row went from
    * milliseconds to minutes — the documented HOF-inlining class).
    * The probe treats a missing word as zero. */
  private def stats(df: DataFrame, partCol: String, keys: Seq[String],
      targetSchema: StructType, mBits: Int, nHash: Int): DataFrame = {
    val pn = pName(partCol)
    val rangeAggs = keys.flatMap(k => Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    val ranges = df.groupBy(canonicalP(partCol).as(pn)).agg(rangeAggs.head, rangeAggs.tail: _*)
    // no distinct before the aggregate: bit_or is idempotent, so
    // duplicate (partition, position) rows cost nothing and skipping
    // the dedup saves a full extra shuffle of the position stream
    val words = df.where(allKeysNotNull(keys))
      .select(canonicalP(partCol).as(pn),
        explode(array(posCols(targetSchema, keys, mBits, nHash): _*)).as("pos"))
      .groupBy(col(pn), shiftrightunsigned(col("pos"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), pos % 64))").as("word"))
      .groupBy(col(pn))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("wm"),
        expr("sum(bit_count(word))").as("nbits"))
      .select(col(pn),
        when(col("nbits") * 2 > lit(mBits.toLong), lit(null))
          .otherwise(col("wm"))
          .as("pb"))
    ranges.join(words, Seq(pn), "left")
      .withColumn("pbm", lit(mBits))
      .withColumn("pbk", lit(nHash))
      .withColumn("sig", lit(sigPrefix(partCol, keys, targetSchema) + s"|m=$mBits|k=$nHash"))
  }

  /** Chunk-count ceiling before [[install]] compacts the index back to
    * one file. Chunks make per-merge index maintenance O(1) files and
    * O(affected) bytes; superseded rows accumulate until compaction
    * folds them out (amortized O(index / MaxChunks) per merge). */
  val MaxChunks = 16

  /** Geometry for a fresh index: sized from the largest partition's
    * approximate distinct-tuple count (HLL++ — sizing only tunes the
    * false-positive rate, never correctness). */
  private def chooseGeometry(df: DataFrame, partCol: String, keys: Seq[String]): (Int, Int) = {
    // per-partition ROW count, not distinct-tuple count: an
    // over-estimate only makes the bitset larger (capped), and the
    // plain count is one cheap partial-aggregated scan instead of an
    // HLL-over-struct pass
    val maxN = df.where(allKeysNotNull(keys))
      .groupBy(canonicalP(partCol))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).getOrElse(0L)
    // 25% headroom over the estimate (the BloomFilterJoin.buildAuto
    // rationale), then floor/cap per the class doc. Probe count is
    // capped at 7: index build and batch-side probing both cost
    // O(rows × probes), and 7 probes at ~19 bits/key sit within ~2×
    // of the optimal-k false-positive rate for half the build work.
    val (m0, _) = BloomFilterJoin.sizeFor(math.ceil(maxN * 1.25).toLong max 1L, TargetFpp)
    val m = math.min(math.max(m0, MinPartBloomBits), MaxPartBloomBits)
    val k = math.max(1, math.min(7,
      math.round(m.toDouble / (maxN max 1L).toDouble * math.log(2.0)).toInt))
    (m, k)
  }

  def markPending(io: SwapFs, targetPath: String): Unit = {
    val marker = io.path(targetPath + "/" + Dir + "/" + PendingName)
    // presence flag only — content is never read, so a torn create
    // still invalidates
    val out = io.fs.create(marker, true)
    out.close()
  }

  def clearPending(io: SwapFs, targetPath: String): Unit =
    io.delete(io.path(targetPath + "/" + Dir + "/" + PendingName))

  /** Stage exact index rows for `df`'s partitions (the just-written
    * merge tmp) into `_keyidx.tmp` as ONE chunk file stamped `ver` —
    * a single small write regardless of how many partitions the batch
    * touched (an earlier layout wrote one file per affected partition;
    * at a 60-partition batch the per-file writer overhead dominated
    * the whole maintenance step). Runs BEFORE the data swap — it reads
    * the tmp layout and touches nothing live. */
  def stage(spark: SparkSession, io: SwapFs, targetPath: String, df: DataFrame,
      partCol: String, keys: Seq[String], targetSchema: StructType,
      mBits: Int, nHash: Int, ver: Long): HPath = {
    val stagedPath = io.path(targetPath + "/" + Dir + ".tmp")
    io.delete(stagedPath)
    stats(df, partCol, keys, targetSchema, mBits, nHash)
      .withColumn("ver", lit(ver))
      .coalesce(1)
      .write.parquet(stagedPath.toString)
    stagedPath
  }

  /** Install a staged chunk into the live index: move its data files
    * in as `c<ver>-<n>.parquet` — O(1) renames per merge. Readers take
    * the max-`ver` row per partition, so superseded rows are inert
    * until the chunk count passes [[MaxChunks]], at which point the
    * surviving rows are compacted back to one chunk (amortized
    * O(index/MaxChunks) per merge). Rows for partitions the merge
    * deleted simply stop being refreshed: a stale winner for a
    * nonexistent partition is an inert phantom candidate
    * (over-inclusive, prune-safe) that the next compaction drops. */
  def install(spark: SparkSession, io: SwapFs, targetPath: String, stagedPath: HPath,
      partCol: String, ver: Long, liveDirNames: Set[String], prefix: String): Unit = {
    val live = io.path(targetPath + "/" + Dir)
    var i = 0
    for (st <- io.fs.listStatus(stagedPath) if st.getPath.getName.endsWith(".parquet")) {
      io.rename(st.getPath, new HPath(live, s"c$ver-$i.parquet"))
      i += 1
    }
    io.delete(stagedPath)
    val chunks = io.fs.listStatus(live).count(_.getPath.getName.endsWith(".parquet"))
    if (chunks > MaxChunks) {
      // compact: winners only, live partitions only, one chunk
      val pn = pName(partCol)
      val liveVals = liveDirNames.iterator
        .filter(n => n.startsWith(prefix) && !n.contains(".old-pmerge"))
        .map(_.stripPrefix(prefix))
        .map(d => if (d == NullPart) NullPart else ExternalCatalogUtils.unescapePathName(d))
        .toSeq
      val winners = spark.read.parquet(live.toString)
        .filter(col(pn).isin(liveVals: _*))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(pn))
            .orderBy(col("ver").desc)))
        .filter(col("__rk") === 1).drop("__rk")
      val tmp = io.path(targetPath + "/" + Dir + ".tmp")
      io.delete(tmp)
      winners.coalesce(1).write.parquet(tmp.toString)
      io.delete(live)
      io.rename(tmp, live)
    }
  }

  /** Rebuild the whole index from (post-merge) target data: fresh
    * geometry, every partition, one chunk at ver 0. The one-time
    * backfill path — entered at target creation and whenever
    * [[readValid]] rejected the index (first merge over an older
    * layout, external writer, crash marker, changed merge
    * definition). */
  def rebuild(spark: SparkSession, io: SwapFs, targetPath: String, df: DataFrame,
      partCol: String, keys: Seq[String]): Unit = {
    val (m, k) = chooseGeometry(df, partCol, keys)
    val staged = io.path(targetPath + "/" + Dir + ".tmp")
    io.delete(staged)
    stats(df, partCol, keys, df.schema, m, k)
      .withColumn("ver", lit(0L))
      .coalesce(1)
      .write.parquet(staged.toString)
    val live = io.path(targetPath + "/" + Dir)
    io.delete(live)
    io.rename(staged, live)
  }

  /** A validated index: its WINNER stats frame (max-ver row per
    * partition), geometry, and the version the next chunk should
    * carry. */
  final case class Valid(stats: DataFrame, mBits: Int, nHash: Int, nextVer: Long)

  /** Read the index, validating it against reality before trusting it
    * for pruning: no pending marker, the exact column set this writer
    * produces (key-NAME-bound), a single geometry, the binding
    * signature matching the CURRENT merge definition and target key
    * types, and an index row for every live partition directory
    * (extra rows for since-deleted partitions are fine —
    * over-inclusion never breaks pruning soundness). Any doubt → None
    * → the caller full-scans and rebuilds. */
  def readValid(spark: SparkSession, io: SwapFs, targetPath: String,
      targetSchema: StructType, liveDirNames: Set[String], prefix: String,
      partCol: String, keys: Seq[String]): Option[Valid] = {
    val live = io.path(targetPath + "/" + Dir)
    if (!io.exists(live)) return None
    if (io.exists(new HPath(live, PendingName))) return None
    val pn = pName(partCol)
    val expected = expectedCols(partCol, keys)
    val statsRaw =
      try {
        val df = spark.read.parquet(live.toString)
        val dropped = if (df.columns.contains("pd")) df.drop("pd") else df
        if (dropped.columns.sorted.toSeq != expected.sorted) return None
        dropped.select(expected.map(col): _*)
      } catch { case scala.util.control.NonFatal(_) => return None }
    // key TYPES must match the current target schema — an index built
    // before a type-widening merge would Bloom-hash the old type
    for (k <- keys)
      if (statsRaw.schema(s"min_$k").dataType != keyType(targetSchema, k)) return None
    // ONE bounded job validates signature uniformity, geometry,
    // versioning, and partition coverage together (per-merge fixed
    // latency is paid three times per incremental gate — every
    // collapsed job shows)
    val metaRows = statsRaw.select(col(pn), col("sig"), col("pbm"), col("pbk"), col("ver")).collect()
    if (metaRows.isEmpty) return None
    val metas = metaRows.map(r => (r.getString(1), r.getInt(2), r.getInt(3))).distinct
    if (metas.length != 1) return None
    val (sig, m, k) = metas(0)
    if (sig != sigPrefix(partCol, keys, targetSchema) + s"|m=$m|k=$k") return None
    // winner per partition = its max-ver row (later chunks supersede)
    val winnerVer = metaRows.groupBy(_.getString(0))
      .map { case (pv, rs) => pv -> rs.map(_.getLong(4)).max }
    val statVals = winnerVer.keySet
    val diskVals = liveDirNames.iterator
      .filter(n => n.startsWith(prefix) && !n.contains(".old-pmerge"))
      .map(_.stripPrefix(prefix))
      .toSet
    // disk names are escaped; index values are raw canonical strings
    if (!diskVals.forall(d =>
      statVals.contains(
        if (d == NullPart) NullPart else ExternalCatalogUtils.unescapePathName(d))))
      return None
    val winnerKeys = winnerVer.map { case (pv, v) => s"$pv\u0000$v" }.toSeq
    val winners = statsRaw.filter(
      concat_ws("\u0000", col(pn), col("ver")).isin(winnerKeys: _*))
    Some(Valid(winners, m, k, metaRows.map(_.getLong(4)).max + 1))
  }

  /** Candidate partitions for the batch: range intersection AND (when
    * the batch's distinct key-tuple count fits [[BatchProbeMax]]) a
    * Bloom membership test of every batch tuple against each
    * surviving partition's bitset. Returns canonical partition-value
    * strings ([[NullPart]] for the null partition). The Bloom pass is
    * the piece that keeps the probe O(touched) for hash-distributed
    * keys, where every partition survives range intersection. */
  def candidates(idx: Valid, srcKeys: DataFrame, srcPartVals: Set[String],
      targetSchema: StructType, keys: Seq[String]): Seq[String] = {
    val pn = idx.stats.columns.head
    val boundAggs = keys.flatMap { k =>
      Seq(min(col(k)).as(s"bmin_$k"), max(col(k)).as(s"bmax_$k")) }
    val bounds = srcKeys.agg(boundAggs.head, boundAggs.tail: _*)
    val overlap = keys.map { k =>
      col(s"max_$k") >= col(s"bmin_$k") && col(s"min_$k") <= col(s"bmax_$k")
    }.reduce(_ && _)
    // phase 1 — ranges only: the projection excludes `pb`, so the
    // columnar scan never decodes any partition's words map here
    val ranged = idx.stats
      .select(col(pn) +: keys.flatMap(k => Seq(col(s"min_$k"), col(s"max_$k"))): _*)
      .crossJoin(broadcast(bounds)).filter(overlap)
      .select(col(pn)).collect().map(_.getString(0)).toIndexedSeq
    // Bloom-test ONLY range survivors the batch is not already
    // rewriting: a partition in the batch's own write set is read and
    // rewritten regardless, so testing it buys nothing — and for
    // broad batches (a backfill touching every date) this skips the
    // whole membership pass INCLUDING the batch-position fetch below
    val toTest = ranged.filterNot(srcPartVals)
    if (toTest.isEmpty) return ranged
    // batch tuple positions, computed IN-ENGINE with the same
    // expressions the index rows were built with, fetched as a bounded
    // parameter set
    val posRows = srcKeys.where(allKeysNotNull(keys))
      .select(array(posCols(targetSchema, keys, idx.mBits, idx.nHash): _*).as("ps"))
      .distinct().limit(BatchProbeMax + 1).collect()
    if (posRows.length > BatchProbeMax || posRows.isEmpty) ranged
    else {
      val posLit = typedlit(posRows.map(_.getSeq[Int](0)).toSeq)
      // phase 2 — Bloom membership, reading `pb` ONLY for the range
      // survivors: does ANY batch tuple pass every probe? All builtin
      // expressions (element_at/getbit over the sparse words map —
      // absent word = zero), early-exiting exists/forall — no UDF, no
      // kernel. For range-clustered keys the survivors are already
      // ~the touched partitions and this phase reads almost nothing;
      // for hash keys it is the phase doing the real pruning.
      val hit = exists(posLit, ps => forall(ps, pp =>
        call_function("getbit",
          coalesce(element_at(col("pb"), shiftrightunsigned(pp, 6)), lit(0L)),
          pmod(pp, lit(64))).cast("int") === lit(1)))
      val passed = idx.stats.filter(col(pn).isin(toTest: _*))
        .filter(col("pb").isNull || hit)
        .select(col(pn)).collect().map(_.getString(0)).toIndexedSeq
      ranged.filter(srcPartVals) ++ passed
    }
  }
}
