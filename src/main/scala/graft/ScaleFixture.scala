package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic 10× bench fixture (documents / embeddings / events) for the
  * second bench scale point — 29/43 sf0.1 queries finish under ~1 s, below
  * host-steal measurement noise, so plan regressions in them are invisible;
  * the 10× corpus puts the headline similarity/dedup/sessionize queries back
  * above noise and yields a 1×→10× scaling ratio per query.
  *
  * Everything is a pure function of the row id (splitmix64 streams — no RNG
  * state, no timestamps), so the fixture is byte-stable across runs and
  * machines. Shape mirrors the driver's sf0.1 tables (measured: 31-word
  * vocabulary, 10-100 words/doc, dim-64 embeddings, 1500 users / 30 days,
  * 5 event types), with planted near-duplicates: every 100th document is a
  * 2-word mutation of its predecessor (word-shingle Jaccard ≈ 0.79 — above
  * every dedup threshold in use), every 50th embedding a small perturbation
  * of its predecessor (cosine ≈ 0.99).
  */
object ScaleFixture {

  val Factor = 10
  val Docs = 50000
  val Vecs = 20000
  val Events = 1000000
  val Dim = 64
  val Users = 15000

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  // n-th draw of the id's stream, uniform in [0, bound)
  private def draw(id: Long, n: Int, bound: Int): Int = {
    val h = splitmix64(splitmix64(id) ^ n.toLong)
    ((h >>> 1) % bound).toInt
  }
  private def drawDouble(id: Long, n: Int): Double = {
    val h = splitmix64(splitmix64(id) ^ (0x1000 + n).toLong)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /** ~20% of positions (deterministically placed per doc) are per-doc hapax
    * tokens (12 hex chars of a splitmix64 stream — globally unique w.h.p.).
    *
    * Why: the r4 fixture drew every token from a shared vocabulary whose
    * synthetic `tokNN` members had FNV-1a hashes agreeing on ~35 of 64 bits
    * (2 trailing digit chars do not avalanche — measured |vocab vote| = 1.0
    * on those bits), which COLLAPSED simhash: the driver measured 48k of 50k
    * docs sharing ONE 16-bit combo key, so the 10× q_simhash_pairs point
    * timed capped-out work (321k rows dropped). Two fixes, both needed:
    * avalanched synthetic vocab words (see [[ensure]]) kill the
    * vocabulary-mean bias, and the hapax mass adds ~len/5 independent ±1
    * votes per bit per doc (real web text has exactly this Heaps'-law hapax
    * tail). Hapax placement is pseudo-random, NOT periodic: a hapax at every
    * 3rd position would put one inside EVERY word-trigram window and zero
    * out cross-doc shingle sharing — at 20% i.i.d., ~51% of windows stay
    * hapax-free, preserving the shared trigram mass the ngram/minhash
    * queries block on. Near-dup plants are unaffected: they copy the
    * predecessor's word array — including its hapax tokens — so planted
    * Jaccard stays ≈ 0.79. */
  private def docWords(id: Long, vocab: Array[String]): Array[String] = {
    val len = 10 + draw(id, 0, 91)
    Array.tabulate(len) { i =>
      if (draw(id, 0x3000 + i, 5) == 0) {
        val h = splitmix64(splitmix64(id) ^ (0x2000 + i).toLong)
        "u" + java.lang.Long.toHexString(h >>> 16)
      } else vocab(draw(id, 1 + i, vocab.length))
    }
  }

  private def docText(id: Long, vocab: Array[String]): String =
    if (id % 100 == 99 && id > 0) {
      // near-dup plant: mutate 2 words of the predecessor
      val w = docWords(id - 1, vocab)
      val out = w.clone()
      out(draw(id, 9001, w.length)) = vocab(draw(id, 9002, vocab.length))
      out(draw(id, 9003, w.length)) = vocab(draw(id, 9004, vocab.length))
      out.mkString(" ")
    } else docWords(id, vocab).mkString(" ")

  private def baseVec(id: Long): Array[Float] = {
    val v = Array.tabulate(Dim)(d => (drawDouble(id, d) * 2.0 - 1.0))
    val norm = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / norm).toFloat)
  }

  private def vec(id: Long): Array[Float] =
    if (id % 50 == 49 && id > 0) {
      // near-dup plant: small perturbation of the predecessor, renormalized
      val b = baseVec(id - 1)
      val p = Array.tabulate(Dim)(d => b(d) + 0.05 * (drawDouble(id, 200 + d) * 2.0 - 1.0))
      val norm = math.sqrt(p.map(x => x * x).sum)
      p.map(x => (x / norm).toFloat)
    } else baseVec(id)

  /** Generate (once — `_READY` marker) and return the fixture dir. The
    * vocabulary starts from `baseDir`'s documents and is EXPANDED by
    * ~Factor^(1/3) with deterministic synthetic words: the sf0.1 corpus
    * keeps a deliberately tiny uniform-df vocabulary, under which candidate
    * volume in the similarity joins grows QUADRATICALLY with corpus size
    * (fixed trigram space, 100× the pair mass at 10× the docs) — that
    * measures the fixture pathology, not the operator. Growing the vocab
    * with the corpus (Heaps'-law posture of real web data) keeps expected
    * df-per-token growth — and hence candidate volume — ~linear in corpus
    * size, which is what a scaling ratio should measure. */
  def ensure(spark: SparkSession, baseDir: String, outDir: String): String =
    ensureScaled(spark, baseDir, outDir, Factor, Docs, Vecs, Events, Users)

  /** Parameterized fixture generator — same deterministic per-id streams
    * and the same vocab-growth rule (× factor^(1/3)) at any scale, so a
    * 100× fixture composes with the 10× point for multi-point scaling
    * evidence. The `_READY` signature embeds every size parameter; the 10×
    * signature is byte-identical to pre-parameterization builds, so the
    * cached driver fixture is not regenerated. */
  def ensureScaled(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int, docs: Long, vecs: Long, events: Long,
      users: Int = Users): String = {
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir))

    val baseVocab = spark.read.parquet(s"$baseDir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w").distinct()
      .orderBy("w").as[String].collect()

    // cache marker carries a SIGNATURE of (generator params, base vocab):
    // a bare marker would silently reuse a fixture built from a different
    // base dir or an older generator, making cross-round bench ratios
    // incomparable without any visible signal
    val signature = s"v3|$factor|$docs|$vecs|$events|$Dim|$users|" +
      s"${baseVocab.length}|${baseVocab.mkString(",").hashCode}"
    val ready = Paths.get(outDir, "_READY")
    if (Files.exists(ready) && Files.readString(ready).trim == signature)
      return outDir
    // vocab × factor^(1/3): trigram space scales ×factor, so matched-pair
    // volume per doc stays ~constant as the corpus grows ×factor. Synthetic
    // words are AVALANCHED (hex of a splitmix64 stream): sequential names
    // like "tok27" share FNV-1a bits on ~35 of 64 positions (2 low-ASCII
    // suffix chars don't avalanche), which made the whole vocabulary vote
    // one simhash direction — see [[docWords]].
    val target = math.ceil(baseVocab.length * math.cbrt(factor.toDouble)).toInt
    val extra = (0 until (target - baseVocab.length).max(0))
      .map(i => "w" + java.lang.Long.toHexString(splitmix64(0x5EEDL ^ i.toLong) >>> 24))
    val vocab = (baseVocab ++ extra).distinct.sorted
    val bcVocab = spark.sparkContext.broadcast(vocab)

    spark.range(docs).mapPartitions { it =>
      val v = bcVocab.value
      it.map { id =>
        val text = docText(id, v)
        (id, text, "en", s"src${draw(id, 8000, 20)}", text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    spark.range(vecs).mapPartitions(_.map(id =>
        (id, vec(id).toSeq, (id % 8).toInt)))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding",
        "cast(label as int) AS label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val spanMs = 30L * 24 * 3600 * 1000
    val types = Array("view", "click", "purchase", "signup", "error")
    spark.range(events).mapPartitions(_.map { id =>
      val ts = new java.sql.Timestamp(t0 + (drawDouble(id, 1) * spanMs).toLong)
      (id, ts, (draw(id, 2, users) + 1).toLong, types(draw(id, 3, types.length)),
        math.rint(drawDouble(id, 4) * 20000) / 100.0, s"""{"k": ${draw(id, 5, 100)}}""")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    Files.writeString(ready, signature + "\n")
    outDir
  }
}
