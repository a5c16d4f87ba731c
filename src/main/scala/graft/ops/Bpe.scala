package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over a document corpus
  * (Sennrich et al. 2016 §3.2) — the tokenizer-training stage of a data
  * pipeline: start from characters (plus a `</w>` end-of-word marker),
  * repeatedly merge the most frequent adjacent symbol pair, and emit the
  * ordered merge table a tokenizer applies at encode time.
  *
  * Scale shape — the part that matters at 100 TB: ONE corpus scan reduces
  * the text to the DISTINCT-WORD frequency table (a hash-agg shuffle,
  * map-side combined), and every one of the `nMerges` iterations runs on
  * that O(vocabulary) table only — pair counting is a flatMap + hash-agg
  * over words-with-counts, never a rescan of the corpus. The per-iteration
  * driver transfer is exactly ONE row (the argmax pair under the total
  * order count desc, pair asc — deterministic across partitionings). The
  * evolving symbol table is localCheckpoint'ed each iteration and the
  * previous checkpoint freed (the Canonicalize/CC iteration discipline).
  *
  * Tokenization matches the rest of the text ops (`\S+` runs, lowercased
  * like the repetition/DSIR kernels), so the pair-count stage has an exact
  * DuckDB oracle (`q_bpe_pairs`); the iterative learner and the encoder
  * are sbt-verified against a driver-side reference implementation.
  */
object Bpe {

  // explode + relational filter (NOT the `filter(arr, lambda)` HOF — that
  // is interpreted CodegenFallback and this is the one corpus-scale scan)
  private[ops] def toWords(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  private def toSymbols(w: String): Array[String] =
    w.toCharArray.map(_.toString) :+ "</w>"

  /** Adjacent-symbol pair counts over the corpus vocabulary, weighted by
    * word frequency — iteration 0 of the BPE loop (characters + `</w>`),
    * exposed for the oracle. Output: (a, b, cnt). */
  def pairCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    toWords(docs, textCol).as[(String, Long)]
      .flatMap { case (w, c) =>
        val s = toSymbols(w)
        Iterator.range(0, s.length - 1).map(i => (s(i), s(i + 1), c))
      }
      .toDF("a", "b", "c")
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
  }

  /** Merge one pair left-to-right, non-overlapping — the reference greedy
    * rule ("aaa" under merge (a,a) gives ["aa","a"]). */
  private[ops] def mergePair(s: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `nMerges` merges. Returns the ordered merge table
    * (rank, a, b) — rank 0 first. Stops early (short table) if no pair
    * occurs twice or the symbol table runs out of adjacent pairs. */
  def learnMerges(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): Seq[(Int, String, String)] = {
    require(nMerges > 0, s"learnMerges needs nMerges > 0: $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = toWords(docs, textCol).as[(String, Long)]
      .map { case (w, c) => (toSymbols(w).toSeq, c) }
      .toDF("syms", "cnt")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // argmax pair under (cnt desc, a asc, b asc) — ONE driver row
      val best = words.as[(Seq[String], Long)]
        .flatMap { case (s, c) =>
          Iterator.range(0, s.length - 1).map(i => (s(i), s(i + 1), c))
        }
        .toDF("a", "b", "c")
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < 2) exhausted = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((rank, a, b))
        val prev = words
        words = words.as[(Seq[String], Long)]
          .map { case (s, c) => (mergePair(s.toArray, a, b).toSeq, c) }
          .toDF("syms", "cnt")
          .localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    merges.toList
  }

  /** Apply a learned merge table to the corpus: every document becomes its
    * BPE symbol sequence (each word encoded independently, merges applied
    * in rank order — the standard encode). Map-only typed kernel with the
    * O(merges) table in the closure. Output: (idCol, n_bpe_tokens,
    * bpe_text — symbols joined by one space, `</w>` markers kept). */
  def applyMerges(docs: DataFrame, merges: Seq[(Int, String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_._1).map { case (_, a, b) => (a, b) }
    val bc = spark.sparkContext.broadcast(ordered)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ms = bc.value
        val words = (if (text == null) "" else text)
          .toLowerCase.split("\\s+").filter(_.nonEmpty)
        val out = words.flatMap { w =>
          var s = toSymbols(w)
          ms.foreach { case (a, b) => s = mergePair(s, a, b) }
          s
        }
        (id, out.length, out.mkString(" "))
      }.toDF(idCol, "n_bpe_tokens", "bpe_text")
  }
}
