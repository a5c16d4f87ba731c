package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Seeded randomized parity sweeps for the order-sensitive operators — each
  * trial draws a random corpus shape (sizes, key cardinalities, tie rates)
  * and compares the distributed result to an in-memory brute force. Fixed
  * seeds: failures reproduce exactly. Complements the hand-picked edge
  * cases in TemporalSpec/ShardingSpec with breadth. */
class RandomizedParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin == brute force across random corpus shapes (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(1000 + trial)
      val nUsers = 1 + rnd.nextInt(6)
      val nRight = rnd.nextInt(60)
      val nLeft = 1 + rnd.nextInt(80)
      val tsRange = 1 + rnd.nextInt(20) // small range => many exact ties
      val rights = (0 until nRight).map(i =>
        (rnd.nextInt(nUsers).toLong, rnd.nextInt(tsRange).toLong * 1000L,
          1000L + i, rnd.nextInt(100) / 10.0))
      val lefts = (0 until nLeft).map(i =>
        (rnd.nextInt(nUsers + 1).toLong, rnd.nextInt(tsRange).toLong * 1000L,
          2000L + i))
      val l = lefts.toDF("user_id", "tsm", "event_id")
        .select(col("event_id"), col("user_id"),
          timestamp_millis(col("tsm")).as("ts"))
      val r = rights.toDF("user_id", "tsm", "state_event", "state_value")
        .select(col("user_id"), timestamp_millis(col("tsm")).as("ts"),
          col("state_value"), col("state_event"))
      val got = Temporal.asofJoin(l, r, Seq("user_id"), "ts", "state_event",
          Seq("state_value", "state_event"))
        .collect()
        .map(x => (x.getAs[Long]("event_id"),
          Option(x.getAs[Any]("asof_state_value")),
          Option(x.getAs[Any]("asof_state_event")))).toSet
      val expected = lefts.map { case (u, lts, id) =>
        val c = rights.filter(x => x._1 == u && x._2 <= lts)
        if (c.isEmpty) (id, None, None)
        else {
          val b = c.maxBy(x => (x._2, x._3))
          (id, Some(b._4: Any), Some(b._3: Any))
        }
      }.toSet
      assert(got == expected, s"trial $trial (users=$nUsers r=$nRight l=$nLeft)")
    }
  }

  test("rangeJoin == brute force across random interval shapes (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(2000 + trial)
      val nUsers = 1 + rnd.nextInt(4)
      val nPts = rnd.nextInt(80)
      val nIvs = rnd.nextInt(12)
      val pts = (0 until nPts).map(i =>
        (i.toLong, rnd.nextInt(nUsers).toLong, rnd.nextInt(100).toLong * 1000L))
      val ivs = (0 until nIvs).map { i =>
        val lo = rnd.nextInt(100).toLong * 1000L
        (i.toLong, rnd.nextInt(nUsers).toLong, lo,
          lo + rnd.nextInt(40).toLong * 1000L)
      }
      val p = pts.toDF("event_id", "user_id", "tsm")
        .select(col("event_id"), col("user_id"),
          timestamp_millis(col("tsm")).as("ts"))
      val iv = ivs.toDF("interval_id", "user_id", "lom", "him")
        .select(col("interval_id"), col("user_id"),
          timestamp_millis(col("lom")).as("lo"),
          timestamp_millis(col("him")).as("hi"))
      val bucketMs = (1 + rnd.nextInt(5)) * 7000L
      val got = Temporal.rangeJoin(p, iv, Seq("user_id"), "ts", "lo", "hi",
          bucketMs).select(col("interval_id"), col("event_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"trial $trial: dup pairs")
      val expected = (for {
        (pid, pu, pts_) <- pts
        (iid, iu, lo, hi) <- ivs
        if pu == iu && pts_ >= lo && pts_ <= hi
      } yield (iid, pid)).toSet
      assert(got.toSet == expected, s"trial $trial (bucketMs=$bucketMs)")
    }
  }

  test("packByBudget == brute force across random weight shapes (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(3000 + trial)
      val n = 1 + rnd.nextInt(300)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      val budget = 1L + rnd.nextInt(3000)
      val got = Sharding.packByBudget(
          rows.toDF("doc_id", "n_chars").repartition(1 + rnd.nextInt(5)), budget)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var cum = 0L
      val expected = rows.sortBy(_._1).map { case (id, w) =>
        val s = cum / budget; cum += w; id -> s
      }.toMap
      assert(got == expected, s"trial $trial (n=$n budget=$budget)")
    }
  }

  test("rankBucketsBy == brute force across random group shapes (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(4000 + trial)
      val nGroups = 1 + rnd.nextInt(5)
      val n = 1 + rnd.nextInt(250)
      val k = 1 + rnd.nextInt(6)
      val scoreRange = 1 + rnd.nextInt(12) // small range => heavy ties
      val rows = (0 until n).map(i =>
        ("g" + rnd.nextInt(nGroups), i.toLong, rnd.nextInt(scoreRange).toDouble))
      val got = Percentile.rankBucketsBy(
          rows.toDF("lang", "doc_id", "score")
            .repartition(1 + rnd.nextInt(6)), k)
        .collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
      val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val gn = rs.size
        rs.sortBy { case (_, id, s) => (s, id) }.zipWithIndex.map {
          case ((_, id, _), i) => id -> ((i + 1L, (i.toLong * k) / gn))
        }
      }
      assert(got == expected, s"trial $trial (groups=$nGroups n=$n k=$k)")
    }
  }

  test("mixByBudget == brute force across random budget shapes (8 seeded trials)") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextHashKernels
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(5000 + trial)
      val nSources = 1 + rnd.nextInt(4)
      val n = rnd.nextInt(200)
      val rows = (0 until n).map(i =>
        ("s" + rnd.nextInt(nSources), i.toLong, rnd.nextInt(50).toLong))
      // random budgets: some zero (keep nothing), some partial, some huge;
      // one source may be left unbudgeted entirely
      val budgets = (0 until nSources).filter(_ => rnd.nextBoolean() || nSources == 1)
        .map(s => "s" + s -> Seq(0L, 1L + rnd.nextInt(300),
          100000L)(rnd.nextInt(3))).toMap
      if (budgets.nonEmpty) {
        val got = Mixing.mixByBudget(
            rows.toDF("source", "doc_id", "n_chars")
              .repartition(1 + rnd.nextInt(6)), budgets)
          .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
        def fnv(src: String, id: Long): Long = TextHashKernels.fingerprint64(
          UTF8String.fromString(s"mix|$src|$id"))
        val expected = rows.filter(r => budgets.contains(r._1)).groupBy(_._1)
          .flatMap { case (src, rs) =>
            var cum = 0L
            rs.sortBy { case (s, id, _) => (fnv(s, id), id) }.flatMap {
              case (_, id, w) =>
                val keep = cum < budgets(src); cum += w
                if (keep) Some(id -> (cum - w)) else None
            }
          }
        assert(got == expected,
          s"trial $trial (sources=$nSources n=$n budgets=$budgets)")
      }
    }
  }

  test("chunk == brute force across random corpus/window shapes (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(6000 + trial)
      val nDocs = 1 + rnd.nextInt(30)
      val vocab = Array("aa", "bb", "cc", "dd")
      val rows = (0 until nDocs).map { i =>
        val nTok = rnd.nextInt(25)
        (i.toLong, Seq.fill(nTok)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val w = 1 + rnd.nextInt(8)
      val s = 1 + rnd.nextInt(w)
      val got = TextStats.chunk(
          rows.toDF("doc_id", "text").repartition(1 + rnd.nextInt(5)), w, s)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
        .toMap
      val expected = rows.flatMap { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty)
        Range(0, ts.length, s).map { st =>
          val c = ts.slice(st, math.min(st + w, ts.length))
          (id, st / s) -> ((c.length, c.mkString(" ")))
        }
      }.toMap
      assert(got == expected, s"trial $trial (docs=$nDocs w=$w s=$s)")
    }
  }

  test("learnMerges == reference BPE across random corpora (5 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(7000 + trial)
      val alphabet = "abcd"
      val nDocs = 1 + rnd.nextInt(10)
      val rows = (0 until nDocs).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(8)) {
          Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(4))).mkString
        }
        (i.toLong, words.mkString(" "))
      }
      val n = 1 + rnd.nextInt(6)
      val got = Bpe.learnMerges(
          rows.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4)), n)
        .map { case (_, a, b) => (a, b) }
      // driver-side reference (same rule: argmax (cnt desc, a, b), stop < 2)
      var vocab = rows.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity)
        .map { case (wd, ws) =>
          (wd.map(_.toString).toVector :+ "</w>") -> ws.size.toLong }
        .toVector
      var merges = Vector.empty[(String, String)]
      var done = false
      while (merges.length < n && !done) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        vocab.foreach { case (sq, c) =>
          sq.sliding(2).filter(_.length == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        val best = if (counts.isEmpty) None
          else Some(counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) })
        best match {
          case Some(((a, b), c)) if c >= 2 =>
            merges :+= ((a, b))
            vocab = vocab.map { case (sq, cc) =>
              Bpe.mergePair(sq.toArray, a, b).toVector -> cc }
          case _ => done = true
        }
      }
      assert(got == merges, s"trial $trial (docs=$nDocs n=$n)")
    }
  }
}
