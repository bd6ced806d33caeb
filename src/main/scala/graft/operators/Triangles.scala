package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected graph given as an
  * edge list (e.g. the near-duplicate pair graph — triangle density
  * separates genuine template clusters from chance LSH collisions,
  * the same signal host-level spam graphs use).
  *
  * Algorithm: degree-ordered edge orientation ("forward" /
  * node-iterator++). Every undirected edge is oriented from its
  * lower-ranked endpoint to the higher, where rank = (degree, id).
  * Each triangle then has exactly ONE vertex with two out-edges (its
  * minimum-rank corner), so a single wedge self-join on the oriented
  * list plus one closing-edge equi-join emits each triangle exactly
  * once — no post-hoc de-dup, O(m^{3/2}) work in total.
  *
  * Why this survives 100 TB: the naive wedge join on the UNDIRECTED
  * list explodes quadratically at hub nodes (a degree-d hub makes
  * d(d-1)/2 wedges). Orientation caps every node's out-degree at
  * O(sqrt(m)), so hub fan-out is bounded and both joins are plain
  * shuffle equi-joins Catalyst can plan (sort-merge at scale, AQE
  * free to pick broadcast when the oriented list is small).
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param pairs one row per undirected edge (any orientation;
    *              duplicates and self-loops tolerated — normalized
    *              internally). NULL endpoints are dropped.
    * @return (id, n_triangles) for every node in >=1 triangle.
    */
  def nodeTriangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .distinct()

    val deg = und.select(col("u").as("id")).unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // Orient each edge from lower (deg, id) to higher (deg, id),
    // keeping the destination's degree so wedges can be cut in the
    // SAME rank order (that makes the closing edge a pure equi-join
    // below — an OR-of-orientations join would fall off the hash-join
    // path into a nested loop).
    //
    // Persisted: `oriented` feeds THREE join subtrees below (wedge
    // e1/e2 + the closing edge). Uncached, each reference re-runs the
    // whole und → deg → 2-join chain — and, worse, everything upstream
    // of `pairs` (at the dup-graph call site that's the full LSH
    // candidate+verify pipeline), tripling the most expensive subtree
    // of the query. One MEMORY_AND_DISK block of thin (src, dst, deg)
    // rows — O(m) — is the materialized edge table a warehouse would
    // build before a self-join. Session-lived, same policy as
    // TextDedup.index.
    val oriented = Persisted.index(und
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("d"), col("dv").as("dd")))
          .otherwise(struct(col("v").as("s"), col("u").as("d"), col("du").as("dd"))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"), col("e.dd").as("ddeg")))

    // Wedges at the min-rank corner: two out-edges src→x, src→y with
    // rank(x) < rank(y). The closing edge, if present, is then
    // oriented exactly x→y, so one equi-join on (x, y) finishes.
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.ddeg") < col("e2.ddeg") ||
            (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("a"), col("e1.dst").as("x"), col("e2.dst").as("y"))

    val closing = oriented.select(col("src").as("cs"), col("dst").as("cd"))
    val tris = wedges.join(closing, col("x") === col("cs") && col("y") === col("cd"))
      .select(col("a"), col("x"), col("y"))

    tris.select(explode(array(col("a"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Global triangle count (single row). */
  def totalTriangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    nodeTriangles(pairs, aCol, bCol)
      .agg((sum(col("n_triangles")) / 3L).cast("long").as("n_triangles"))
}
