package graft.tools
import graft.{Sessions, Tables}
object StatProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-stat-probe")
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val fanout = graft.operators.TextDedup.indexFanout(docs, n = 3)
      val rows = graft.operators.TextDedup.totalIndexRows(docs, n = 3)
      System.err.println(s"STATS $dir fanout=$fanout indexRows=$rows")
    }
    spark.stop()
  }
}
