package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the memoized kg() pipeline exactly as the
  * kg_* driver queries run it (fromTestdata corpus, emptyDict,
  * fuzzy = false) — localizes the kg_degrees-pays-the-pipeline cost.
  * Usage: scripts/run.sh ProfEntry [sfDir] [reps]
  */
object ProfEntry {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () } // warm-up

    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"[prof] $n%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); x
    }

    import graft.kg._
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val turns = time("fromTestdata (lazy)") { Transcripts.fromTestdata(spark, sfDir) }
      val raw = time("extract + persist + count") {
        val r = Extract.extract(turns)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        println(s"       raw rows: ${r.count()}")
        r
      }
      val dict = Pipeline.emptyDict(spark)
      val reg = time("registry (no fuzzy) + checkpoint") {
        val (rr, free) = Link.registryManaged(raw, dict, Link.Config(fuzzy = false))
        val c = rr.localCheckpoint(eager = true)
        free(); c
      }
      val (regRows, regBytes) = time("registry size agg") {
        val r = reg.agg(count(lit(1)), sum(length(col("entity_type")) + length(col("norm_key"))
          + length(col("canonical_key")) + length(col("guid")))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      println(s"       registry rows=$regRows bytes=$regBytes")
      val labeled = Link.label(raw, reg, hintBroadcast = true)
      val edges = time("edges (label+dedup) checkpoint") {
        Materialize.edges(labeled).localCheckpoint(eager = true)
      }
      val nodes = time("nodes checkpoint") {
        Materialize.nodes(reg).localCheckpoint(eager = true)
      }
      val mentions = time("mentions projection checkpoint") {
        raw.filter(col("subj_type") === "Person")
          .groupBy(col("conv_id"))
          .agg(countDistinct(Link.normKey(col("subj_tuid"))).as("n_persons"))
          .localCheckpoint(eager = true)
      }
      time("kg_degrees query off checkpoints") {
        val e = edges
        val out = e.groupBy(col("subj_guid").as("guid")).agg(count(lit(1)).as("out_deg"))
        val in = e.filter(col("obj_guid").isNotNull)
          .groupBy(col("obj_guid").as("guid")).agg(count(lit(1)).as("in_deg"))
        nodes.select(col("guid"), col("entity_type"))
          .join(out, Seq("guid"), "left").join(in, Seq("guid"), "left")
          .select(col("guid"), col("entity_type"),
            coalesce(col("out_deg"), lit(0L)).as("out_deg"),
            coalesce(col("in_deg"), lit(0L)).as("in_deg"))
          .orderBy(col("entity_type"), col("guid"))
          .write.mode("overwrite").format("noop").save()
      }
      Seq(edges, nodes, mentions, reg).foreach(_.unpersist())
      raw.unpersist()
    }
    spark.stop()
  }
}
