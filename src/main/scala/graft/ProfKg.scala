package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** Dev profiling harness: per-stage wall times of the exact Pipeline.run
  * sequence on a bench corpus, at a given core count — used to localize
  * which stage stops scaling with cores.
  * Usage: scripts/run.sh ProfKg [cores] [corpusDir] [reps]
  */
object ProfKg {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).getOrElse("32").toInt
    val corpus = args.lift(1).getOrElse("/tmp/graft_bench_corpus_50000_10")
    val reps = args.lift(2).getOrElse("2").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores * 4, 32))
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"    [$cores] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); x
    }
    for (rep <- 1 to reps) {
      println(s"  rep $rep (cores=$cores corpus=$corpus)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val turns = spark.read.parquet(corpus).as[graft.model.Model.Turn]
      val dict = Pipeline.syntheticDict(spark)
      val cfg = Link.Config()
      val raw = time("extract+persist+count") {
        val r = Extract.extract(turns)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        r.count(); r
      }
      val ments = time("mentions+dict (checkpoint)") {
        Link.applyDict(Link.mentions(raw), dict).localCheckpoint(eager = true)
      }
      val sameAs = time("fuzzySameAs (checkpoint+count)") {
        val s = Link.fuzzySameAs(ments, cfg).localCheckpoint(eager = true)
        println(s"      sameAs edges: ${s.count()}")
        s
      }
      val cc = time("connectedComponents") {
        val c = Canonicalize.connectedComponents(
          sameAs.select($"entity_type", $"key_a", $"key_b")).localCheckpoint(eager = true)
        c.count(); c
      }
      val reg = time("registry assemble (checkpoint)") {
        val ccr = cc.select($"entity_type".as("cc_et"), $"key".as("cc_key"), $"component")
        ments.join(ccr, ments("entity_type") === ccr("cc_et") &&
            ments("dict_key") === ccr("cc_key"), "left")
          .select(ments("entity_type"), ments("norm_key"),
            coalesce($"component", ments("dict_key")).as("canonical_key"))
          .withColumn("guid", Link.guidFor($"entity_type", $"canonical_key"))
          .localCheckpoint(eager = true)
      }
      val (regRows, regBytes) = time("registry size agg") {
        val r = reg.agg(count(lit(1)), sum(length($"entity_type") + length($"norm_key")
          + length($"canonical_key") + length($"guid"))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      println(s"      registry rows=$regRows rawBytes=$regBytes")
      val hint = regRows <= cfg.maxBroadcastRegistryRows &&
        regBytes <= cfg.maxBroadcastRegistryBytes
      println(s"      broadcast hint: $hint")
      val edges = time("label+edges dedup (count)") {
        val e = Materialize.edges(Link.label(raw, reg, hintBroadcast = hint))
        println(s"      edges: ${e.count()}")
        e
      }
      val out = java.nio.file.Files.createTempDirectory("prof-merge").toString
      time("mergeSnapshot write") {
        Materialize.mergeSnapshot(spark, s"$out/edges", edges, Materialize.edgeKey)
      }
      raw.unpersist()
    }
    spark.stop()
  }
}
