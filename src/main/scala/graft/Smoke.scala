package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner mirroring the driver's t1 gate: SparkEntry.entry
  * on sf0.001 must return rows > 0. Usage: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n")
    df.show(5, truncate = false)
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
