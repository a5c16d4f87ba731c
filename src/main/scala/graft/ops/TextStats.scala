package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything here is a per-row function of the text column (column
  * expressions plus tight char-loop UDF kernels) so the operators
  * scan-pipeline at 100 TB: one pass over the text column, no shuffle
  * until an explicit aggregation. The regex-engine expressions the
  * kernels replaced were codegen'd too, but java.util.regex itself was
  * the measured top CPU of the 400x curation rehearsal (a predicate
  * lambda dispatch per character plus a string allocation per match).
  */
object TextStats {

  /** The exact char set Java-regex `\s` matches without
    * UNICODE_CHARACTER_CLASS: the 6 ASCII whitespace chars. Every kernel
    * below replaces a regex that used `\s`/`\S`, so this predicate — not
    * Character.isWhitespace, which also matches Unicode spaces — is what
    * keeps the kernels value-identical to the regex forms they replaced. */
  @inline private[ops] def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** All maximal non-whitespace runs — exactly
    * `regexp_extract_all(text, "\\S+", 0)` (greedy `\S+` matches are
    * precisely the maximal runs, in order), without the regex engine:
    * java.util.regex char-class predicates dispatch a lambda per CHARACTER
    * and regexp_extract_all was measured the top CPU consumer of the
    * whole 400× curation decisions stage (every executor thread inside
    * Pattern$BmpCharPredicate). Null-safe like the regex form. */
  private[ops] def wsTokensKernel(s: String): Array[String] = {
    if (s == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** whitespace tokens (empty-safe): all maximal non-whitespace runs.
    * A typed kernel with the exact `regexp_extract_all(text, "\\S+")`
    * semantics (see [[wsTokensKernel]]); the earlier split+filter form
    * used the `filter` higher-order function (interpreted CodegenFallback,
    * ~1000x slower per element), and the regexp_extract_all form it was
    * replaced by kept the regex ENGINE on the hot path — Pattern
    * char-class predicates per character plus one allocated match list
    * entry per token. */
  def tokens(text: Column): Column = tokensUdf(text)
  private val tokensUdf = udf((s: String) => wsTokensKernel(s))

  /** Count of tokens from `words` appearing in (already-lowercased) text.
    * Kernel equivalent of the previous
    * `regexp_count(lowered, "(?:^|\\s)(?:w1|w2|...)(?=\\s|$)")`: a match is
    * a token run equal to one of `words` — maximal runs satisfy both
    * boundary conditions, each counted once (adjacent stopwords "a a a"
    * all count; "an" never matches inside "and"). */
  private def markerCount(lowered: Column, words: Seq[String]): Column = {
    val set = words.toSet
    val u = udf((s: String) => {
      if (s == null) null.asInstanceOf[Integer]
      else {
        var cnt = 0
        val n = s.length
        var i = 0
        while (i < n) {
          while (i < n && isRegexWs(s.charAt(i))) i += 1
          val start = i
          while (i < n && !isRegexWs(s.charAt(i))) i += 1
          if (i > start && set.contains(s.substring(start, i))) cnt += 1
        }
        Integer.valueOf(cnt)
      }
    })
    u(lowered)
  }

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap deterministic
    * stand-in for a real tokenizer's token count. Kernel equivalent of
    * `size(regexp_extract_all(lower(text), "[a-z]+|[0-9]+|[^a-z0-9\\s]"))`:
    * Java alternation is leftmost-first, so at an alpha char the greedy
    * first branch takes the maximal alpha run, at a digit the second takes
    * the digit run, and any other non-whitespace char matches the third
    * branch alone — exactly the scan below. */
  def subwordCount(text: Column): Column = subwordUdf(lower(text))
  private val subwordUdf = udf((s: String) => {
    if (s == null) null.asInstanceOf[Integer]
    else {
      var cnt = 0
      val n = s.length
      var i = 0
      while (i < n) {
        val c = s.charAt(i)
        if (c >= 'a' && c <= 'z') { while (i < n && s.charAt(i) >= 'a' && s.charAt(i) <= 'z') i += 1; cnt += 1 }
        else if (c >= '0' && c <= '9') { while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1; cnt += 1 }
        else { if (!isRegexWs(c)) cnt += 1; i += 1 }
      }
      Integer.valueOf(cnt)
    }
  })

  /** Count of chars outside [A-Za-z0-9] and regex-`\s` — kernel equivalent
    * of `size(regexp_extract_all(text, "[^A-Za-z0-9\\s]", 0))` (each match
    * is one char, so the list size IS the char count, minus the per-match
    * string allocations). Shared by [[quality]] and the curation decision
    * table. */
  def punctCount(text: Column): Column = punctUdf(text)
  private val punctUdf = udf((s: String) => {
    if (s == null) null.asInstanceOf[Integer]
    else {
      var cnt = 0
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (!alnum && !isRegexWs(c)) cnt += 1
        i += 1
      }
      Integer.valueOf(cnt)
    }
  })

  private val enStop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "for", "on", "with", "at", "by")

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(toks).as("n_tokens"),
      subwordCount(col("text")).as("n_subwords"),
      size(array_distinct(toks)).as("n_distinct_tokens"))
  }

  /** Quality signals + a composite score. Ratios are exact rational values
    * of integer counts (deterministic across engines). */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nToks = size(toks).cast("double")
    val punct = punctCount(col("text")).cast("double")
    val stop = markerCount(lower(col("text")), enStop).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / greatest(nToks, lit(1.0))
    docs.select(
      col("doc_id"),
      nToks.cast("long").as("n_tokens"),
      (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
      (stop / greatest(nToks, lit(1.0))).as("stopword_ratio"),
      distinctRatio.as("distinct_ratio"),
      // composite: in [0,1]; long-enough, low-punct, some stopwords, diverse
      (least(nToks / lit(64.0), lit(1.0)) * lit(0.4)
        + (lit(1.0) - least(punct / greatest(nChars, lit(1.0)), lit(1.0))) * lit(0.2)
        + least(stop / greatest(nToks, lit(1.0)) * lit(4.0), lit(1.0)) * lit(0.2)
        + distinctRatio * lit(0.2)).as("quality_score"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 — the
    * standard web-corpus repetition filters), adapted to word streams:
    *
    *  - `dup_word_frac`:    (n - distinct) / n token occurrences that repeat
    *  - `top_bigram_frac`:  occurrences of the MOST FREQUENT word bigram
    *                        over all n-1 bigram positions
    *  - `dup_trigram_frac`: trigram occurrences beyond each first sighting
    *                        over all n-2 trigram positions
    *
    * One typed UDF kernel per document (a single hash pass over the tokens
    * — the n-gram construction has no native Spark expression and a lambda
    * HOF would be interpreted, the repo's measured ~1000× trap), map-only
    * plan, zero shuffles. Every ratio is one IEEE division of two exact
    * integers, so the doubles are bit-identical across engines (the DuckDB
    * oracle recomputes them relationally). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val k = udf((text: String) => {
      val toks = graft.ops.TextStats.wsTokensKernel(
        (if (text == null) "" else text).toLowerCase)
      val n = toks.length
      val dupW = if (n == 0) 0.0 else (n - toks.distinct.length).toDouble / n
      var topBg = 0.0
      if (n >= 2) {
        val m = scala.collection.mutable.HashMap.empty[String, Int]
        var best = 0
        var i = 0
        while (i < n - 1) {
          val g = toks(i) + " " + toks(i + 1)
          val c = m.getOrElse(g, 0) + 1
          m(g) = c
          if (c > best) best = c
          i += 1
        }
        topBg = best.toDouble / (n - 1)
      }
      var dupTg = 0.0
      if (n >= 3) {
        val seen = scala.collection.mutable.HashSet.empty[String]
        var dup = 0
        var i = 0
        while (i < n - 2) {
          if (!seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))) dup += 1
          i += 1
        }
        dupTg = dup.toDouble / (n - 2)
      }
      (n, dupW, topBg, dupTg)
    })
    docs.select(col("doc_id"), k(col("text")).as("__rep"))
      .select(col("doc_id"),
        col("__rep._1").as("n_words"),
        col("__rep._2").as("dup_word_frac"),
        col("__rep._3").as("top_bigram_frac"),
        col("__rep._4").as("dup_trigram_frac"))
  }

  /** PII/noise scrubbing — the text-curation cleaning pass: mask emails,
    * URLs and long digit runs, collapse whitespace. Regexes restricted to a
    * dialect with identical semantics in Java regex and RE2 (oracle parity).
    */
  def scrub(docs: DataFrame): DataFrame = {
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "https?://[^\\s]+", "<URL>"),
        "[0-9]{9,}", "<NUM>")
    docs.select(col("doc_id"),
      regexp_replace(trim(cleaned), "\\s+", " ").as("clean_text"),
      (length(col("text")) - length(regexp_replace(cleaned, "<(EMAIL|URL|NUM)>", "")))
        .as("masked_chars"))
  }

  /** TF-IDF-like salience: per-(doc, term) score = tf * (N / df) computed
    * with only correctly-rounded IEEE ops (multiply/divide — identical bits
    * in every engine; no engine-specific log). Top `k` terms per document,
    * ties broken by term. */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val terms = docs.select(col("doc_id"),
        explode(tokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N folds into the plan as a 1-row broadcast cross join — the previous
    // first() ran a separate full corpus pass before the real job
    val n = docs.select(countDistinct(col("doc_id")).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * (col("n_docs") / col("df").cast("double")))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("term_rank"))
  }

  /** Marker vocabularies for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai", "you", "he", "ren", "ta"))

  /** Heuristic language ID: per-language marker-token hit count; winner by
    * (count desc, language name asc) — fully deterministic. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = docs.select(
      col("doc_id") +: col("lang").as("lang_tag") +:
        langMarkers.map { case (l, ms) =>
          markerCount(lower(col("text")), ms).as(s"score_$l")
        }: _*)
    // array_max picks the lexicographically greatest (score, rank, lang)
    // struct; rank is inverted so the alphabetically FIRST lang wins ties.
    val ranked = langMarkers.map(_._1).sorted.zipWithIndex.toMap
    val best2 = langMarkers.map { case (l, _) =>
      struct(col(s"score_$l").as("s"), lit(langMarkers.size - ranked(l)).as("r"),
        lit(l).as("l"))
    }
    scored.withColumn("pred_lang", array_max(array(best2: _*)).getField("l"))
      .select((Seq(col("doc_id"), col("lang_tag"), col("pred_lang")) ++
        langMarkers.map { case (l, _) => col(s"score_$l") }): _*)
  }

  /** Deterministic token-window chunking — the embedding-prep stage of a
    * retrieval/RAG pipeline: each document becomes overlapping windows of
    * `windowTokens` whitespace tokens starting every `strideTokens`
    * (`stride == window` gives disjoint chunks; `stride < window` the
    * standard overlap). The final window is partial if the document ends
    * mid-stride; an empty document yields zero chunks. chunk_id =
    * start / stride, so chunk identity is a pure function of
    * (doc, config) — re-runs and different partitionings produce identical
    * chunk tables (the property that lets chunk embeddings be cached by
    * (doc_id, chunk_id) across pipeline runs).
    *
    * Tokenization matches [[repetitionStats]]/the DSIR ops (`\S+` runs),
    * so the DuckDB oracle re-derives identical chunks via
    * regexp_extract_all + list slicing. Map-only typed kernel — one scan,
    * zero shuffles, embarrassingly parallel at any corpus size. */
  def chunk(docs: DataFrame, windowTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0 &&
      strideTokens <= windowTokens,
      s"need 0 < stride <= window; got window=$windowTokens stride=$strideTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = wsTokensKernel(if (text == null) "" else text)
        Iterator.range(0, ts.length, strideTokens).map { st =>
          val end = math.min(st + windowTokens, ts.length)
          (id, st / strideTokens, end - st, ts.slice(st, end).mkString(" "))
        }
      }.toDF(idCol, "chunk_id", "n_tokens", "chunk_text")
  }
}
