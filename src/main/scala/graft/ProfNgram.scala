package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level breakdown of ngramJaccardPairs on a documents dir.
  * Usage: scripts/run.sh ProfNgram [docsDir] */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-10x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val secs = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 0.5)
          println(f"[stage] ${i.stageId}%4d ${secs}%7.1f s  tasks=${i.numTasks}%4d  ${i.name.take(90)}")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val out = graft.ops.Dedup.ngramJaccardPairs(docs, shingleN = 3, minJaccard = 0.5)
    out.write.mode("overwrite").format("noop").save()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(1000) // let the listener bus drain
    spark.stop()
  }
}
