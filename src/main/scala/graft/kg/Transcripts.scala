package graft.kg

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model._

/** Transcript corpora — the pipeline's input table
  * `(conv_id, turn_idx, role, text, tool, ts)`.
  *
  * Two deterministic sources, no external data:
  *
  *  1. [[Transcripts.fromTestdata]] derives a transcript table from the
  *     driver's TPC-H-ish parquet via pure column expressions. Because the
  *     embedded facts are column-derived, the expected KG triples can be
  *     computed by the DuckDB oracle DIRECTLY from the source columns — an
  *     end-to-end correctness gate over extract→link→canonicalize→merge.
  *  2. [[Transcripts.synthetic]] is the seeded generator from FIXTURES.md
  *     (Zipf-hot conv_ids, alias noise, replay duplicates) used by sbt tests
  *     and the scaling bench.
  */
object Transcripts {

  /** Derive transcripts from orders ⨝ customer ⨝ nation.
    *
    * Every text template below is inverted by one rule in [[Extract]]; the
    * case-jitter on `name_sf` (every 7th order speaks in ALL CAPS) exercises
    * the Link stage's normalization, and every 11th order replays its turn 2
    * verbatim to exercise replay dedup (Reconstruct) + MERGE idempotence.
    */
  def fromTestdata(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")

    // customer ⨝ nation is small → broadcast both sides of the dim chain so
    // the fact table (orders) never shuffles here.
    val base = orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select(
        concat(lit("conv-"), $"o_orderkey").as("conv_id"),
        when($"o_orderkey" % 7 === 0, upper($"c_name")).otherwise($"c_name").as("name_sf"),
        $"n_name",
        $"o_orderkey", $"o_totalprice", $"o_orderpriority",
        ($"o_custkey" % 60 + 18).cast("long").as("age"),
        ($"o_orderkey" % 5 + 1).cast("long").as("items"),
        $"o_orderdate")

    def turn(idx: Int, role: String, text: org.apache.spark.sql.Column,
        tool: String): org.apache.spark.sql.Column =
      struct(lit(idx).as("turn_idx"), lit(role).as("role"), text.as("text"),
        lit(tool).as("tool"))

    val turns = base.select(
      $"conv_id", $"o_orderdate",
      array(
        turn(0, "user", concat(lit("My name is "), $"name_sf", lit(".")), ""),
        turn(1, "user", concat($"name_sf", lit(" lives in "), $"n_name", lit(".")), ""),
        turn(2, "assistant",
          concat(lit("Order "), $"o_orderkey", lit(" has total "),
            $"o_totalprice".cast("string"), lit(".")), ""),
        turn(3, "tool",
          concat(lit("lookup returned "), $"o_orderpriority", lit(" for order "),
            $"o_orderkey"), "lookup"),
        turn(4, "user", concat($"name_sf", lit(" is "), $"age", lit(" years old.")), ""),
        turn(5, "assistant", concat(lit("They ordered "), $"items", lit(" items.")), "")
      ).as("turns"),
      ($"o_orderkey" % 11 === 0).as("replay"))
      .select($"conv_id", $"o_orderdate", $"replay", explode($"turns").as("t"))
      .select($"conv_id", $"t.turn_idx", $"t.role", $"t.text", $"t.tool",
        ($"o_orderdate" + expr("make_interval(0, 0, 0, 0, 0, t.turn_idx, 0)")).as("ts"),
        $"replay")

    // at-least-once replay injection: duplicate turn 2 of every 11th conv
    val replayed = turns.filter($"replay" && $"turn_idx" === 2)
    turns.unionByName(replayed)
      .drop("replay")
      .as[Turn]
  }

  /** Resolve-corpus variant — the Disjoint-Resolver fixture. Person names
    * are a digit-word encoding of `c_custkey` designed for PROVABLE fuzzy
    * behavior under char-3-gram Jaccard: digit d at position p becomes the
    * 7-char word y,x,x,y,y,x,y with x = chr('a'+p), y = chr('f'+d), so any
    * two distinct customers' names differ in whole words whose trigram sets
    * are disjoint (measured max cross-name Jaccard 0.72 over the sf0.1
    * custkey range), while every 3rd order speaks a `" jr"`-suffixed variant
    * (Jaccard >= 0.919 vs its base). With threshold 0.8 the >= t pair set is
    * EXACTLY {(name, name jr)} — per-bucket exact linking cannot merge them
    * (distinct normalized keys), so convergence is observable: only the
    * global [[Incremental.resolveDisjoint]] compaction (with
    * `Link.Config(exactSameAs = true)`, recall 1.0 by construction) unifies
    * the GUIDs, and the DuckDB oracle can recompute the converged graph
    * straight from the source columns. */
  def fromTestdataResolve(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // every 8th customer: the resolver demo proves CONVERGENCE (bucketed
    // runs + compaction == one-shot graph); similarity-join scale is
    // covered by q_ngram_pairs — and this synthetic 50-word vocabulary is
    // deliberately adversarial for prefix filtering (uniform df), so the
    // full-customer corpus would measure the corpus pathology, not the
    // operator
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter($"c_custkey" % 8 === 0)
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")

    def word(p: Int): org.apache.spark.sql.Column = {
      val x = ('a' + p).toChar.toString
      val div = math.pow(10, p).toLong
      val y = expr(s"char(102 + ((c_custkey div $div) % 10))")
      concat(y, lit(x + x), y, y, lit(x), y)
    }
    val nameBase = concat_ws(" ", (4 to 0 by -1).map(word): _*)

    val base = orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select(
        concat(lit("resolve-"), $"o_orderkey").as("conv_id"),
        when($"o_orderkey" % 3 === 0, concat(nameBase, lit(" jr")))
          .otherwise(nameBase).as("surface"),
        $"n_name",
        ($"o_custkey" % 60 + 18).cast("long").as("age"),
        $"o_orderdate")

    def turn(idx: Int, role: String, text: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      struct(lit(idx).as("turn_idx"), lit(role).as("role"), text.as("text"),
        lit("").as("tool"))

    base.select($"conv_id", $"o_orderdate",
        array(
          turn(0, "user", concat(lit("My name is "), $"surface", lit("."))),
          turn(1, "user", concat($"surface", lit(" lives in "), $"n_name", lit("."))),
          turn(2, "user", concat($"surface", lit(" is "), $"age", lit(" years old.")))
        ).as("turns"))
      .select($"conv_id", $"o_orderdate", explode($"turns").as("t"))
      .select($"conv_id", $"t.turn_idx", $"t.role", $"t.text", $"t.tool",
        ($"o_orderdate" + expr("make_interval(0, 0, 0, 0, 0, t.turn_idx, 0)")).as("ts"))
      .as[Turn]
  }

  // ---- synthetic generator (FIXTURES.md) ------------------------------------

  private val firstNames = Vector("Robert", "Bob", "Alice", "Carol", "David",
    "Eve", "Frank", "Grace", "Heidi", "Ivan", "Judy", "Mallory", "Niaj",
    "Olivia", "Peggy", "Rupert", "Sybil", "Trent", "Victor", "Wendy")
  private val lastNames = Vector("Smith", "Jones", "Lee", "Garcia", "Chen",
    "Patel", "Kim", "Nguyen", "Brown", "Davis", "Miller", "Wilson")
  private val orgs = Vector("Acme Corp", "Globex", "Initech", "Umbrella",
    "Stark Industries", "Wayne Enterprises", "Hooli", "Pied Piper")
  private val cities = Vector("Paris", "Lagos", "Osaka", "Quito", "Denver",
    "Mumbai", "Cairo", "Oslo", "Lima", "Seoul")
  private val nations = Vector("France", "Nigeria", "Japan", "Ecuador",
    "United States", "India", "Egypt", "Norway", "Peru", "South Korea")

  /** Known alias pairs (variant → canonical) — ground truth for the
    * dictionary-linking path; mirrors "Robert" ~ "Bob" from FIXTURES.md §2. */
  val aliasPairs: Seq[(String, String)] = Seq(
    "Bob" -> "Robert", "Rob" -> "Robert", "Liz" -> "Elizabeth",
    "Dave" -> "David", "Vic" -> "Victor", "Peg" -> "Peggy")
  private val aliasInv: Map[String, Seq[String]] =
    aliasPairs.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }

  /** Deterministic per-(seed,conv,turn) RNG — pure function of its inputs. */
  private def rng(seed: Long, conv: Long, turn: Long): scala.util.Random =
    new scala.util.Random(seed * 1000003L + conv * 131L + turn * 7L + 17L)

  final case class GenConfig(
      seed: Long = 42L,
      nConvs: Int = 2000,
      turnsPerConv: Int = 12,
      hotConvFraction: Double = 0.02,
      replayFraction: Double = 0.05)

  /** Canonical person name for a conversation — a pool ~nConvs/10 wide so
    * entities recur across conversations (cross-conversation linking). */
  private def personFor(cfg: GenConfig, conv: Long): String = {
    val pool = math.max(4, cfg.nConvs / 10)
    val h = (conv * 2654435761L + cfg.seed) & 0x7fffffffL
    val i = (h % pool).toInt
    s"${firstNames((i * 7) % firstNames.size)} ${lastNames((i * 13) % lastNames.size)}"
  }

  /** Apply seeded surface-form noise — the Link stage's food. Exactly one
    * variant per mention so each noise class maps to one linking tier:
    * case/space jitter → normalization; first-name alias → broadcast
    * dictionary; dropped trailing char → MinHash/LSH fuzzy matching
    * (3-gram Jaccard ≈ 0.9 vs the canonical form, well over the 0.7
    * threshold, while distinct people stay far below it). */
  private def noisy(r: scala.util.Random, canonical: String): String = {
    val parts = canonical.split(" ", 2)
    r.nextInt(6) match {
      case 0 => canonical
      case 1 => canonical.toUpperCase
      case 2 => canonical.toLowerCase
      case 3 => canonical.replace(" ", "  ") // double-space jitter
      case 4 => canonical.substring(0, canonical.length - 1) // typo: drop last char
      case _ =>
        val vs = aliasInv.getOrElse(parts(0), Vector(parts(0)))
        val first = vs(r.nextInt(vs.size))
        if (parts.length > 1) s"$first ${parts(1)}" else first
    }
  }

  /** Rows for one conversation (pure; called inside mapPartitions). */
  def genConv(cfg: GenConfig, conv: Long): Seq[Turn] = {
    val convId = f"conv-$conv%06d"
    val canonical = personFor(cfg, conv)
    val nHot = math.max(1, (cfg.nConvs * cfg.hotConvFraction).toInt)
    // Zipf-ish skew: the first nHot convs get 20× the turns.
    val turns = if (conv < nHot) cfg.turnsPerConv * 20 else cfg.turnsPerConv
    val base = 1700000000000L + conv * 3600000L
    val rows = Vector.newBuilder[Turn]
    var idx = 0
    while (idx < turns) {
      val r = rng(cfg.seed, conv, idx)
      val ts = new Timestamp(base + idx * 60000L)
      val surface = noisy(r, canonical)
      val row = (idx % 6) match {
        case 0 => Turn(convId, idx, "user", s"My name is $surface.", "", ts)
        case 1 =>
          val org = orgs(r.nextInt(orgs.size))
          Turn(convId, idx, "user", s"$surface works at $org.", "", ts)
        case 2 =>
          val age = 18 + (conv % 60)
          Turn(convId, idx, "user", s"$surface is $age years old.", "", ts)
        case 3 =>
          val city = cities(r.nextInt(cities.size))
          val temp = (r.nextInt(800) - 300) / 10.0
          Turn(convId, idx, "assistant", s"$city is $temp degrees.", "", ts)
        case 4 =>
          val v = r.nextInt(100000)
          Turn(convId, idx, "tool", s"search returned value $v for $surface", "search", ts)
        case _ =>
          val n = 1 + r.nextInt(9)
          Turn(convId, idx, "assistant", s"They ordered $n items.", "", ts)
      }
      rows += row
      // replay injection: duplicate this (conv_id, turn_idx) verbatim
      if (r.nextDouble() < cfg.replayFraction) rows += row
      idx += 1
    }
    rows.result()
  }

  /** Distributed deterministic corpus: `spark.range` over conv ids →
    * `flatMap` per-conversation rows. Row order is then decorrelated from
    * (conv, turn) by a deterministic repartition-by-hash so no test can
    * accidentally rely on input order.
    */
  def synthetic(spark: SparkSession, cfg: GenConfig = GenConfig(),
      partitions: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, cfg.nConvs.toLong, 1, partitions)
      .as[Long]
      .flatMap(genConv(cfg, _))
      .repartition(partitions, hash($"conv_id", $"turn_idx", $"text"))
      .as[Turn]
  }
}
