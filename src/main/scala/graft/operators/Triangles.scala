package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-node TRIANGLE counts over an undirected simple graph — the local
  * clustering signal (spam farms and boilerplate link rings are
  * triangle-dense; organic link neighborhoods are sparse), and the
  * classic why-orientation-matters distributed graph kernel.
  *
  * The naive wedge join explodes on hubs: a degree-d node contributes
  * d² wedges, and a crawl graph's top hub is millions deep. The fix is
  * the standard DEGREE ORDERING (Chiba–Nishizeki / Schank–Wagner):
  * orient every undirected edge from the (degree, node)-smaller toward
  * the larger endpoint, and every triangle then has EXACTLY ONE node
  * with two out-edges — wedges are built only from out-edges, so a
  * node's wedge count is its OUT-degree squared, and out-degree is
  * bounded by O(√m) on any graph (a node with out-degree k has k
  * higher-degree neighbors, each of degree ≥ its own) — the hub's d²
  * blow-up cannot happen regardless of skew. Each triangle is found
  * once (its source's wedge closed by the third oriented edge), then
  * exploded to its three corners for the per-node counts.
  *
  * Input edges are canonicalized here: self-loops dropped, duplicates
  * and reverse duplicates collapsed — callers pass any raw link list.
  */
object Triangles {

  /** (node, n_triangles) for every node in at least one triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient from (deg, node)-smaller to larger: a TOTAL order, so the
    // orientation is acyclic and every triangle has one 2-out source
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(StorageLevel.DISK_ONLY)
    // wedges from out-edges only (v < w under an arbitrary tiebreak so
    // each unordered out-pair forms one wedge), closed against the
    // CANONICAL undirected edge set — one two-column equi-join (an
    // either-direction OR over the oriented set would plan a
    // nested-loop join; the source's two out-neighbors' mutual
    // orientation is unrelated to the source's order anyway)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("s"), col("e1.v").as("x"), col("e2.v").as("y"))
    val closed = wedges
      .withColumn("ca", least(col("x"), col("y")))
      .withColumn("cb", greatest(col("x"), col("y")))
      .join(und, col("ca") === und("a") && col("cb") === und("b"))
    val out = closed
      .select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val result = out.localCheckpoint()
    und.unpersist(); oriented.unpersist()
    result
  }
}
