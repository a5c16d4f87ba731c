package graft.kg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("saltedCount equals plain count under heavy key skew") {
    import spark.implicits._
    // one hot key with 10k rows, 50 cold keys
    val df = spark.range(10000).select(lit("hot").as("k"), $"id")
      .unionByName(spark.range(50).select(concat(lit("cold-"), $"id").as("k"), $"id"))
    val plain = df.groupBy($"k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, $"k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 10000L)
  }

  test("saltedAgg two-phase sum/max equals direct aggregation") {
    import spark.implicits._
    val df = spark.range(5000).select(($"id" % 3).as("k"), $"id".as("v"))
    val direct = df.groupBy($"k").agg(sum($"v").as("s"), max($"v").as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(df, Seq($"k"), Seq($"v"), 8)(
      partial = Seq(sum($"v") -> "ps", max($"v") -> "pm"),
      combine = Seq(sum($"ps") -> "s", max($"pm") -> "m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("hot conversations do not change pipeline output (skew smoke, SURVEY §5.2#5)") {
    // corpus with 10% of rows in hot convs; output must equal the oracle
    val cfg = Transcripts.GenConfig(seed = 99L, nConvs = 100, turnsPerConv = 6,
      hotConvFraction = 0.05)
    val turns = Transcripts.synthetic(spark, cfg, partitions = 4)
    val r = Pipeline.run(turns, Pipeline.emptyDict(spark), Link.Config(fuzzy = false))
    val got = r.edges.count()
    val (expected, _) = Oracle.run(turns.collect().toSeq, Map.empty, fuzzy = false)
    assert(got == expected.size)

    // partition imbalance probe on the extraction partitioning
    val parts = graft.kg.Extract.extract(turns)
    val (maxRows, medRows, n) = Skew.partitionStats(parts)
    info(s"extract partitions: n=$n max=$maxRows median=$medRows")
    assert(n > 1)
  }
}
