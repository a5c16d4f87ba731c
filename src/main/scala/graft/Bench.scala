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

    // SECOND SCALE POINT: the deterministic 10× fixture (documents /
    // embeddings / events), headline queries only, same min-of-3 rule for
    // >10 s queries. `total` above stays the sf-dir sweep (comparable to
    // prior rounds); the 10× numbers land under "queries_10x"/"total_10x".
    // On by default for the driver's sf0.1 run; SPARK_GRAFT_SCALE2=0/1
    // overrides (generation time is excluded and reported separately).
    val scale2 = sys.env.get("SPARK_GRAFT_SCALE2") match {
      case Some(v) => v == "1"
      case None => sfDir.contains("sf0.1") && only.isEmpty
    }
    val scaleJson =
      if (!scale2) ""
      else try {
        val t0 = System.nanoTime()
        val dir10 = ScaleFixture.ensure(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_10X_DIR", "/tmp/graft-10x"))
        val genSecs = (System.nanoTime() - t0) / 1e9
        val r10 = SparkEntry.scaleQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
          def once(): (Double, Boolean) = {
            val t = System.nanoTime()
            val ok = try { materialize(fn(spark, dir10)); true } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name@10x failed: ${e.getMessage}")
                false
            }
            ((System.nanoTime() - t) / 1e9, ok)
          }
          val (t1, ok1) = once()
          val secs =
            if (ok1 && t1 > 10.0)
              (t1 +: Seq.fill(2)(once()).collect { case (t, true) => t }).min
            else t1
          (name, if (ok1) secs else -secs, ok1)
        }
        val qs10 = r10.map { case (k, v, _) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val total10 = r10.collect { case (_, v, true) => v }.sum
        s""","queries_10x":$qs10,"total_10x":$total10,"gen_10x_sec":$genSecs""" +
          s""","fixture_10x":"$dir10""""
      } catch {
        // a fixture-generation failure must not swallow the whole sweep's
        // JSON line (the same rule as per-query errors) — report and go on
        case e: Throwable =>
          System.err.println(s"[bench] 10x scale point failed: ${e.getMessage}")
          s""","scale2_error":${"\"" + e.getClass.getSimpleName + "\""}"""
      }
    // cap/candidate observability summary (stderr; the stdout JSON line is
    // the driver contract and stays single-line)
    Seq("dedup.minhash", "dedup.simhash", "link.lsh",
        "simjoin.ngram", "simjoin.link.exact").foreach { site =>
      val m = graft.ops.CapMetrics.latest(site)
      if (m.nonEmpty) System.err.println(s"[bench] metrics $site: " +
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"$scaleJson}""")
    spark.stop()
  }
}
