package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract bench: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Timing notes: results are fully materialized through the `noop` sink
  * (a bare `.count()` would let Catalyst prune columns and drop sorts,
  * under-measuring the real work). A warm-up query runs first so JVM/codegen
  * cold-start (~30-60 s) is not attributed to the first timed query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up: smallest sf, exercises scan/window/join/agg codegen paths
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    // a crashing query must be visible in the JSON (negative time + errors
    // list), not recorded as a normal-looking elapsed time
    // SPARK_GRAFT_ONLY=q1,q2 — iterate on a subset without the full sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { materialize(fn(spark, sfDir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      // single-rep times on this host carry documented hypervisor CPU-steal
      // variance (BENCH/BASELINE.md: identical stage 53 s vs 187 s) — rerun
      // heavy queries and take the MIN so BENCH_rN reproduces within ~2x.
      // kgCache-memoized queries are EXCLUDED from the rerun: their reruns
      // hit the cache, so the MIN would collapse to cached-projection time
      // and the shared pipeline cost would vanish from the total.
      val secs =
        if (ok1 && t1 > 10.0 && !SparkEntry.memoizedQueries.contains(name))
          (t1 +: Seq.fill(2)(once()).collect { case (t, true) => t }).min
        else t1
      (name, if (ok1) secs else -secs, ok1)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // cap/candidate observability summary (stderr; the stdout JSON line is
    // the driver contract and stays single-line)
    Seq("dedup.minhash", "dedup.simhash", "link.lsh",
        "simjoin.ngram", "simjoin.link.exact").foreach { site =>
      val m = graft.ops.CapMetrics.latest(site)
      if (m.nonEmpty) System.err.println(s"[bench] metrics $site: " +
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
