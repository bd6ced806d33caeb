package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.call_function
import graft.functions.DotProduct

/** Session extension registering graft's native Catalyst functions —
  * enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (or imperatively via [[GraftFunctions.register]] on an existing
  * session). Currently: `graft_dot` (codegen'd array dot product). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_dot"), DotProduct.info, DotProduct.builder))
}

/** Imperative registration + Column-level entry points for the native
  * functions, for sessions not built with the extensions config (e.g.
  * the driver's own session calling SparkEntry.queries). Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", DotProduct.builder, "built-in")

  /** Codegen'd dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
