package graft
import org.apache.spark.sql.SparkSession
import graft.kg._
object ProfKg {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"    $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); x
    }
    for (rep <- 1 to 2) {
      println(s"  rep $rep")
      val turns = spark.read.parquet("/tmp/graft_bench_corpus_50000_10").as[graft.model.Model.Turn]
      val raw = time("extract(count)")( { val r = Extract.extract(turns); r.count(); r } )
      val raw2 = Extract.extract(turns).localCheckpoint(true)
      val reg = time("registry")(Link.registry(raw2, Pipeline.syntheticDict(spark)).localCheckpoint(true))
      val labeled = time("label+edges(count)")(Materialize.edges(Link.label(raw2, reg)).count())
    }
    spark.stop()
  }
}
