package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("hand graph: K4 gives 3 per node; an attached pendant and a " +
    "separate path give none") {
    // K4 on 1..4 (4 triangles, each node in 3), pendant 4-5, path 6-7-8
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = count(k4 ++ Seq((4L, 5L), (6L, 7L), (7L, 8L)))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$got")
  }

  test("canonicalization: duplicates, reverse edges, and self-loops " +
    "change nothing") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ Seq((2L, 1L), (3L, 2L), (1L, 2L), (1L, 1L), (3L, 3L))
    assert(count(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(count(noisy) == count(tri))
  }

  test("degree-ordered counts equal the naive canonical-triple count on " +
    "a pseudo-random graph (incl. a hub)") {
    def h(x: Long) = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      math.abs(z ^ (z >>> 27))
    }
    // 300 random edges over 40 nodes + a hub (0) wired to everyone:
    // the shape that blows up an unoriented wedge join
    val rand = (0 until 300).map(i => (h(i) % 40, h(i + 5000) % 40))
    val hub = (1L until 40L).map(v => (0L, v))
    val edges = rand ++ hub
    // naive reference: canonical a<b<c triples over the simple graph
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long]
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } Seq(a, b, c).foreach(n => naive(n) = naive.getOrElse(n, 0L) + 1L)
    assert(count(edges) == naive.toMap)
  }
}
