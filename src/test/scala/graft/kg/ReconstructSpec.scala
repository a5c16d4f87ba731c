package graft.kg

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Model._

class ReconstructSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def randomTurns(r: scala.util.Random): List[Turn] = {
    val n = 1 + r.nextInt(40)
    List.fill(n) {
      Turn(s"conv-${r.nextInt(5)}", r.nextInt(7),
        Seq("user", "assistant", "tool")(r.nextInt(3)),
        Seq("My name is Bob.", "Bob is 3 years old.", "noise")(r.nextInt(3)),
        "", new Timestamp(r.nextInt(5).toLong))
    }
  }

  /** The BASELINE.json per-row invariant: per-turn text equality under
    * stable turn ordering — for ANY permutation of the input rows (and any
    * replay duplication), the reconstructed (conv_id, turn_idx) → row
    * mapping is identical. */
  test("output invariant under input-row permutation and replay duplication") {
    import spark.implicits._
    for (seed <- 0 until 12) {
      val r = new scala.util.Random(seed)
      val turns = randomTurns(r)
      val permuted = r.shuffle(turns ++ r.shuffle(turns).take(turns.size / 3))
      val a = Reconstruct(turns.toDS()).collect().toSet
      val b = Reconstruct(permuted.toDS()).collect().toSet
      assert(a == b, s"seed=$seed")
    }
  }

  test("exactly one row per (conv_id, turn_idx); deterministic winner") {
    import spark.implicits._
    val t0 = new Timestamp(0L)
    val t1 = new Timestamp(1L)
    val turns = Seq(
      Turn("c", 0, "user", "B-text", "", t1),
      Turn("c", 0, "user", "A-text", "", t0), // earlier ts wins
      Turn("c", 1, "user", "Z", "", t0),
      Turn("c", 1, "user", "A", "", t0) // ts tie: lexicographic text wins
    ).toDS()
    val out = Reconstruct(turns).collect().map(t => (t.turn_idx, t.text)).toMap
    assert(out == Map(0 -> "A-text", 1 -> "A"))
  }
}
