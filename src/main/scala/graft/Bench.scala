package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract bench: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Timing notes: results are fully materialized through the `noop` sink
  * (a bare `.count()` would let Catalyst prune columns and drop sorts,
  * under-measuring the real work). A warm-up query runs first so JVM/codegen
  * cold-start (~30-60 s) is not attributed to the first timed query.
  *
  * The JSON line is SELF-PROVING: alongside the per-query MIN it carries
  * `reps` (every raw repetition time — the artifact records its own
  * host-steal variance; this host shows documented 2-3x swings between
  * identical runs) and `caps` (the CapMetrics counters each query fired:
  * `dropped_rows`, `max_bucket`, `candidates` — so a measurement of
  * capped-out work is visible in the artifact, not just in driver logs).
  */
object Bench {

  private final case class QRes(name: String, secs: Double, ok: Boolean,
      reps: Seq[Double], caps: Map[String, Map[String, Long]])

  /** Queries above this single-rep time are re-run (min of 3): the point of
    * min-of-N is to separate hypervisor CPU steal from regression, and r4
    * showed 1.5-2x single-draw swings down in the 3-10 s band. */
  private val RerunThresholdSec = 3.0

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
    // list), not recorded as a normal-looking elapsed time.
    // kgCache-memoized queries are EXCLUDED from the rerun: their reruns hit
    // the cache, so the MIN would collapse to cached-projection time and the
    // shared pipeline cost would vanish from the total.
    def runQuery(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, tag: String): QRes = {
      val snap = graft.ops.CapMetrics.snapshot()
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { materialize(fn(spark, dir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name$tag failed: ${e.getMessage}")
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val first = once()
      val rerun = first._2 && first._1 > RerunThresholdSec &&
        !SparkEntry.memoizedQueries.contains(name)
      val all = first +: (if (rerun) Seq.fill(2)(once()) else Nil)
      val okTimes = all.collect { case (t, true) => t }
      val secs = if (first._2 && okTimes.nonEmpty) okTimes.min else -first._1
      QRes(name, secs, first._2, all.map(_._1), graft.ops.CapMetrics.changedSince(snap))
    }

    def jNum(d: Double): String = {
      val r = math.rint(d * 1000.0) / 1000.0
      if (r == r.toLong.toDouble) r.toLong.toString else r.toString
    }
    def jStr(s: String): String = "\"" + s + "\""
    def renderSweep(rs: Seq[QRes]): (String, String, String, String, Double) = {
      val qs = rs.map(r => jStr(r.name) + ":" + jNum(r.secs)).mkString("{", ",", "}")
      val reps = rs.map(r => jStr(r.name) + ":" +
        r.reps.map(jNum).mkString("[", ",", "]")).mkString("{", ",", "}")
      val caps = rs.filter(_.caps.nonEmpty).map { r =>
        jStr(r.name) + ":" + r.caps.toSeq.sortBy(_._1).map { case (site, m) =>
          jStr(site) + ":" + m.toSeq.sortBy(_._1)
            .map { case (k, v) => jStr(k) + ":" + v }.mkString("{", ",", "}")
        }.mkString("{", ",", "}")
      }.mkString("{", ",", "}")
      val errs = rs.collect { case r if !r.ok => jStr(r.name) }.mkString("[", ",", "]")
      (qs, reps, caps, errs, rs.collect { case r if r.ok => r.secs }.sum)
    }

    // SPARK_GRAFT_ONLY=q1,q2 — iterate on a subset without the full sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) => runQuery(name, fn, sfDir, "") }
    val (qs, reps, caps, errs, total) = renderSweep(results)

    // SECOND SCALE POINT: the deterministic 10× fixture (documents /
    // embeddings / events), headline queries only, same min-of-3 rule.
    // `total` above stays the sf-dir sweep (comparable to prior rounds); the
    // 10× numbers land under "queries_10x"/"total_10x". On by default for
    // the driver's sf0.1 run (exact path-segment match — sf0.15 or any path
    // merely CONTAINING "sf0.1" must not trigger it); SPARK_GRAFT_SCALE2=0/1
    // overrides (generation time is excluded and reported separately).
    val scale2 = sys.env.get("SPARK_GRAFT_SCALE2") match {
      case Some(v) => v == "1"
      case None => new java.io.File(sfDir).getName == "sf0.1" && only.isEmpty
    }
    val scaleJson =
      if (!scale2) ""
      else try {
        val t0 = System.nanoTime()
        val dir10 = ScaleFixture.ensure(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_10X_DIR", "/tmp/graft-10x"))
        val genSecs = (System.nanoTime() - t0) / 1e9
        // SPARK_GRAFT_ONLY applies here too (reachable with SCALE2=1 forced)
        val r10 = SparkEntry.scaleQueries.toSeq.sortBy(_._1)
          .filter { case (n, _) => only.forall(_.contains(n)) }
          .map { case (name, fn) => runQuery(name, fn, dir10, "@10x") }
        val (qs10, reps10, caps10, _, total10) = renderSweep(r10)
        s""","queries_10x":$qs10,"reps_10x":$reps10,"caps_10x":$caps10""" +
          s""","total_10x":${jNum(total10)},"gen_10x_sec":${jNum(genSecs)}""" +
          s""","fixture_10x":"$dir10""""
      } catch {
        // a fixture-generation failure must not swallow the whole sweep's
        // JSON line (the same rule as per-query errors) — report and go on
        case e: Throwable =>
          System.err.println(s"[bench] 10x scale point failed: ${e.getMessage}")
          s""","scale2_error":${"\"" + e.getClass.getSimpleName + "\""}"""
      }
    println(s"""{"metric":"total","value":${jNum(total)},"unit":"sec","queries":$qs,"reps":$reps,"caps":$caps,"errors":$errs,"sf":"$sfDir"$scaleJson}""")
    spark.stop()
  }
}
