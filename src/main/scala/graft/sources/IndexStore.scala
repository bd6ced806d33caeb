package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.Pq

/** Persistence for trained ANN index ARTIFACTS — k-means centroids
  * and PQ codebooks as schema'd parquet — so a trained index ships
  * between jobs (train once offline, load everywhere: the
  * [[graft.analytics.DataOps.streamAnnIngest]] deployment shape)
  * instead of living only in one driver's memory.
  *
  * Round trips are EXACT: coordinates are stored as parquet DOUBLEs
  * (IEEE bits preserved), ids (`cell`, `sub`) are part of each row so
  * file/row order is immaterial, and loaders return the canonical
  * ascending-id order the trainers emit — loaded artifacts therefore
  * reproduce assignments and ADC rankings bit-for-bit
  * (IndexStoreSpec pins both across a save/load).
  *
  * Artifacts are parameter-sized (k·dim and m·k·subDim doubles), so
  * the save is a driver-side single-file write and the load is a
  * bounded parameter fetch — the same class as broadcasting ML
  * weights, deliberately NOT a distributed dataset. */
object IndexStore {

  private val centroidSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("coords", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private val codebookSchema = StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("coords", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("cc", DoubleType, nullable = false)))

  /** Persist k-means centroids (the [[graft.operators.KMeans.fit]]
    * output shape) as one parquet file. */
  def saveCentroids(spark: SparkSession, cents: Seq[(Int, Array[Double])],
      path: String): Unit = {
    require(cents.nonEmpty, "saveCentroids needs at least one centroid")
    val rows: Seq[Row] = cents.map { case (c, v) => Row(c, v.toSeq) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), centroidSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load centroids in canonical ascending-cell order. */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Int, Array[Double])] =
    spark.read.schema(centroidSchema).parquet(path).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq

  /** Persist PQ codebooks ([[Pq.fitCodebooks]] output) as one
    * parquet file; `cc` (the precomputed self-dot) rides along so the
    * loaded books skip recomputation and stay bit-identical. */
  def savePqCodebooks(spark: SparkSession, books: Seq[Pq.Code], path: String): Unit = {
    require(books.nonEmpty, "savePqCodebooks needs at least one codeword")
    val rows: Seq[Row] = books.map(b => Row(b.sub, b.cell, b.coords.toSeq, b.cc))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), codebookSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks in canonical (sub, cell) order. */
  def loadPqCodebooks(spark: SparkSession, path: String): Seq[Pq.Code] =
    spark.read.schema(codebookSchema).parquet(path).collect()
      .map(r => Pq.Code(r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
      .sortBy(b => (b.sub, b.cell)).toSeq
}
