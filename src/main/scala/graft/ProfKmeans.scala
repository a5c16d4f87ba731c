package graft

import org.apache.spark.sql.SparkSession

/** Micro-profile of kmeansCentroids driver vs distributed paths on the 10×
  * fixture embeddings. Usage: scripts/run.sh ProfKmeans [dir] [nLists] */
object ProfKmeans {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-10x")
    val nLists = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cfg = graft.ops.Similarity.IvfConfig(nLists = nLists, kmeansIters = 3, nProbe = 8)
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"[prof] $n%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); x
    }
    // warm-up
    emb.count()
    val a = time("driver path (rep1)") {
      graft.ops.Similarity.kmeansCentroids(emb, cfg) }
    time("driver path (rep2)") {
      graft.ops.Similarity.kmeansCentroids(emb, cfg) }
    val b = time("distributed path") {
      graft.ops.Similarity.kmeansCentroids(emb, cfg, maxDriverVecFloats = 0L) }
    println("equal: " + a.zip(b).forall { case (x, y) => x.sameElements(y) })
    spark.stop()
  }
}
