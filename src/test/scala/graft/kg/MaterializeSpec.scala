package graft.kg

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MaterializeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft-merge").toString

  test("mergeSnapshot is idempotent: f(f(x)) == f(x)") {
    import spark.implicits._
    val table = freshDir() + "/edges"
    val batch = Seq(("a", 1L), ("b", 2L), ("a", 1L)).toDF("k", "v")
    Materialize.mergeSnapshot(spark, table, batch, Seq("k", "v"))
    val after1 = Materialize.readTable(spark, table).get.collect().toSet
    Materialize.mergeSnapshot(spark, table, batch, Seq("k", "v"))
    val after2 = Materialize.readTable(spark, table).get.collect().toSet
    assert(after1 == after2)
    assert(after1.size == 2) // in-batch duplicate collapsed
  }

  test("final table independent of batch order (eventual-consistency analog)") {
    import spark.implicits._
    val b1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val b2 = Seq(("b", 2L), ("c", 3L)).toDF("k", "v")

    val tAB = freshDir() + "/t"
    Materialize.mergeSnapshot(spark, tAB, b1, Seq("k", "v"))
    Materialize.mergeSnapshot(spark, tAB, b2, Seq("k", "v"))

    val tBA = freshDir() + "/t"
    Materialize.mergeSnapshot(spark, tBA, b2, Seq("k", "v"))
    Materialize.mergeSnapshot(spark, tBA, b1, Seq("k", "v"))

    val a = Materialize.readTable(spark, tAB).get.collect().toSet
    val b = Materialize.readTable(spark, tBA).get.collect().toSet
    assert(a == b && a.size == 3)
  }

  test("snapshot pointer flips atomically; old snapshot remains until flip") {
    import spark.implicits._
    val table = freshDir() + "/t"
    Materialize.mergeSnapshot(spark, table, Seq(("a", 1L)).toDF("k", "v"), Seq("k"))
    val s0 = Materialize.currentSnapshot(table).get
    Materialize.mergeSnapshot(spark, table, Seq(("b", 2L)).toDF("k", "v"), Seq("k"))
    val s1 = Materialize.currentSnapshot(table).get
    assert(s0 != s1)
    // previous snapshot data still on disk (reader holding s0 is unaffected)
    assert(spark.read.parquet(s0).count() == 1)
    assert(spark.read.parquet(s1).count() == 2)
  }
}
