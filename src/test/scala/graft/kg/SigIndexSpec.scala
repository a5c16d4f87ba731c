package graft.kg

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SigIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("indexed discovery == fuzzySameAsDelta; second pass bands only the delta") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sigidx").toString
    val cfg = Link.Config()

    // pass 1: everything new (first resolve — rebuild path)
    val b1 = Seq(
      ("Person", "alice smith", true), ("Person", "robert smith", true),
      ("Person", "wholly unrelated", true), ("Order", "1", true)
    ).toDF("entity_type", "dict_key", "is_new")
    val (sa1, free1, st1) = SigIndex.fuzzySameAsIndexed(spark, dir, b1, cfg, rebuild = true)
    val got1 = pairSet(sa1)
    free1()
    assert(st1.rebuilt && st1.bandedKeys == 3) // Order is not a fuzzy type
    assert(got1 == pairSet(Link.fuzzySameAs(b1.drop("is_new"), cfg)))

    // pass 2: pass-1 keys are old, four new keys (new×old, new×new, singleton)
    val b2 = Seq(
      ("Person", "alice smith", false), ("Person", "robert smith", false),
      ("Person", "wholly unrelated", false),
      ("Person", "alice smit", true), ("Person", "robert smyth", true),
      ("Person", "zanzibar qux", true), ("Person", "zanzibar quxx", true)
    ).toDF("entity_type", "dict_key", "is_new")
    val (sa2, free2, st2) = SigIndex.fuzzySameAsIndexed(spark, dir, b2, cfg, rebuild = false)
    val got2 = pairSet(sa2)
    free2()
    assert(!st2.rebuilt, "index must be reused, not rebuilt")
    assert(st2.bandedKeys == 4, s"O(delta) banding violated: ${st2.bandedKeys}")
    assert(got2 == pairSet(Link.fuzzySameAsDelta(b2, cfg)))
    assert(got2.exists { case (_, a, b) => a == "alice smit" || b == "alice smit" })
    assert(got2.contains(("Person", "zanzibar qux", "zanzibar quxx")))

    // drifted old-key set (a key the index never saw claims to be old):
    // the fingerprint guard must detect it and self-heal by rebuilding
    val b3 = Seq(
      ("Person", "alice smith", false), ("Person", "never indexed", false),
      ("Person", "brand new", true)
    ).toDF("entity_type", "dict_key", "is_new")
    val (sa3, free3, st3) = SigIndex.fuzzySameAsIndexed(spark, dir, b3, cfg, rebuild = false)
    sa3.count(); free3()
    assert(st3.rebuilt && st3.bandedKeys == 3)

    // config change (different band shape) invalidates stored signatures
    val cfg2 = cfg.copy(numHashes = 32, bands = 16)
    val (sa4, free4, st4) = SigIndex.fuzzySameAsIndexed(spark, dir,
      b3.withColumn("is_new", lit(false) || $"dict_key" === "brand new"),
      cfg2, rebuild = false)
    sa4.count(); free4()
    assert(st4.rebuilt)
  }

  test("resolver with sigIndex: delta passes equal the unindexed resolver, merged-away keys leave the index") {
    import spark.implicits._
    val ts0 = new java.sql.Timestamp(0L)
    def turn(c: String, i: Int, text: String) =
      graft.model.Model.Turn(c, i, "user", text, "", ts0)
    val b1 = Seq(
      turn("c1", 0, "My name is Bob Johnson."),
      turn("c1", 1, "Bob Johnson is 30 years old."),
      turn("c2", 0, "My name is Carol White."),
      turn("c3", 0, "My name is Erin Carter."))
    val b2 = Seq(
      turn("c4", 0, "My name is Bob Johnso."),   // fuzzy-merges with b1
      turn("c5", 0, "My name is Erin Carte."),   // fuzzy-merges with b1
      turn("c6", 0, "My name is Dave Black."),   // genuinely new singleton
      turn("c7", 0, "Carol White is 41 years old.")) // exact re-mention: not new
    // LSH path (the one the index backs); near-exhaustive banding so the
    // discovered pair set is deterministic at this scale
    val cfg = Link.Config(numHashes = 32, bands = 16, jaccardThreshold = 0.7)
    val dict = Pipeline.emptyDict(spark)

    def ingestAndResolve(useIdx: Boolean): String = {
      val out = Files.createTempDirectory(s"graft-sigres-$useIdx").toString
      Incremental.run(b1.toDS(), dict, out, "rb1", nBuckets = 1)
      val s1 = Incremental.resolveDisjoint(spark, out, cfg, sigIndex = useIdx)
      assert(s1.touched == s1.total && s1.total > 0)
      Incremental.run(b2.toDS(), dict, out, "rb2", nBuckets = 1)
      val s2 = Incremental.resolveDisjoint(spark, out, cfg, sigIndex = useIdx)
      assert(s2.touched == 3 && s2.rewritten == 2, s"$s2")
      // converged: third pass is a no-op
      assert(Incremental.resolveDisjoint(spark, out, cfg, sigIndex = useIdx).touched == 0)
      out
    }

    val outIdx = ingestAndResolve(useIdx = true)
    val outRef = ingestAndResolve(useIdx = false)
    def dump(out: String, t: String) = Materialize.readTable(spark, s"$out/$t").get
      .collect().map(_.toSeq.mkString("|")).toSet
    assert(dump(outIdx, "nodes") == dump(outRef, "nodes"))
    assert(dump(outIdx, "edges") == dump(outRef, "edges"))

    // O(delta) banding metric recorded per pass (pass 2 banded only the 3
    // genuinely-new names), and the merged-away names left the index. The
    // component rep is the lexicographic-min member — the SHORTER typo
    // variants here — so the b1 originals are the names merged away.
    val banded = Incremental.readMetrics(spark, outIdx)
      .filter(col("metric") === "sig_banded_keys")
      .select("value").collect().map(_.getLong(0)).toSeq
    assert(banded == Seq(3L, 3L), s"banded per pass: $banded")
    val idxKeys = Materialize.readTable(spark,
        s"$outIdx/_resolve/sig_index/bands").get
      .filter(col("band") === 0).select("key").collect().map(_.getString(0)).toSet
    assert(!idxKeys.contains("bob johnson") && !idxKeys.contains("erin carter"),
      s"merged-away names still indexed: $idxKeys")
    assert(idxKeys.contains("bob johnso") && idxKeys.contains("dave black"))
  }
}
