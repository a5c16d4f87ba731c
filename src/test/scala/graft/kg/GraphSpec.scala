package graft.kg

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mirror(edges: Seq[(String, String)], iters: Int, d: Double)
      : Map[String, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches an in-memory power iteration on a small graph") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "a", "c" -> "a", "c" -> "b", "d" -> "c")
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 10, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = mirror(edges, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}") }
    // the sink-free cycle holds most mass; sanity on ordering
    assert(got("a") > got("c") && got("b") > got("c") && got("c") > got("d"))
  }

  test("rank mass stays within (0, 1] and leaks only via sinks") {
    import spark.implicits._
    // pure cycle: no sinks => total mass conserved at 1.0
    val cyc = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    val ranks = Graph.pageRank(cyc.toDF("src", "dst"), iters = 5)
      .collect().map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-9)
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
  }
}
