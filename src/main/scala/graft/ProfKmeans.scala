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
    val a = time("kmeans (gated)") {
      graft.ops.Similarity.kmeansCentroids(emb, cfg) }
    val b = time("kmeans distributed") {
      graft.ops.Similarity.kmeansCentroids(emb, cfg, maxDriverVecFloats = 0L) }
    println("equal: " + a.zip(b).forall { case (x, y) => x.sameElements(y) })

    // full ivfTopK stage decomposition at this corpus
    import org.apache.spark.sql.functions._
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    time("ivfTopK end-to-end (noop)") {
      graft.ops.Similarity.ivfTopK(emb, queries, 10, cfg)
        .write.mode("overwrite").format("noop").save()
    }
    time("ivfTopK end-to-end rep2") {
      graft.ops.Similarity.ivfTopK(emb, queries, 10, cfg)
        .write.mode("overwrite").format("noop").save()
    }
    // decompose: join volume without scoring vs with scoring
    locally {
      val bcC = spark.sparkContext.broadcast(a)
      def score(v: Seq[Float], c: Array[Double]): Double = {
        var dot = 0.0; var nc = 0.0; var nv = 0.0; var d = 0
        val n = math.min(v.length, c.length)
        while (d < n) { dot += v(d).toDouble * c(d); nc += c(d) * c(d)
          nv += v(d).toDouble * v(d); d += 1 }
        if (nc == 0 || nv == 0) -2.0 else dot / math.sqrt(nc * nv)
      }
      val listU = udf((v: Seq[Float]) =>
        bcC.value.indices.maxBy(i => (score(v, bcC.value(i)), -i)))
      val probesU = udf((v: Seq[Float]) =>
        bcC.value.indices.map(i => (i, score(v, bcC.value(i))))
          .sortBy { case (i, c) => (-c, i) }.take(cfg.nProbe).map(_._1))
      val listed = emb.repartition(32).select(col("vec_id"), col("embedding"),
        listU(col("embedding")).as("lst"))
      val probed = queries.select(col("query_id"), col("q_embedding"),
        explode(probesU(col("q_embedding"))).as("lst"))
      val joined = listed.join(broadcast(probed), Seq("lst"))
      time("join count only") { println("rows: " + joined.count()) }
      time("join + cosine agg") {
        joined.select(graft.ops.Similarity.cosine(col("q_embedding"),
          col("embedding")).as("c")).agg(sum(col("c"))).head()
      }
    }
    spark.stop()
  }
}
