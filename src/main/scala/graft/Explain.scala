package graft

/** Plan-inspection tool: print the formatted physical plan of one
  * catalog query and time repeated executions (first run = cold scan,
  * repeats expose plan cost vs scan cost).
  * Usage: sbt "runMain graft.Explain <query> <sfdir> [reps]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build("graft-explain")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, dir)
    df.explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"run $i: rows=$n%d elapsed=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
