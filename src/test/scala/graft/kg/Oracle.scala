package graft.kg

import scala.collection.mutable

import graft.model.Model._

/** Single-JVM reference implementation of the whole pipeline (SURVEY §5.2#1)
  * — the "reference extractor" side of the P/R ≥ 0.95 gate.
  *
  * Deliberately implemented with different machinery than the Spark job:
  * in-memory sort instead of window functions, exact all-pairs Jaccard
  * instead of LSH blocking, union-find instead of iterative DataFrame
  * label propagation, Set dedup instead of MERGE. The extraction rule grammar
  * ([[Extract.extractTurn]]) is the shared spec; everything downstream is an
  * independent second implementation.
  */
object Oracle {

  final case class EdgeRow(
      subj_type: String, subj_guid: String, pred: String, obj_kind: String,
      obj_type: Option[String], obj_guid: Option[String],
      obj_string: Option[String], obj_int64: Option[Long], obj_float64: Option[Double])

  final case class NodeRow(guid: String, entity_type: String, name: String)

  final class UnionFind {
    private val parent = mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // canonical = lexicographic min, matching the CC min-label rule
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
  }

  private def norm(s: String): String = Link.normKeyScala(s)
  private def guid(t: String, k: String): String = Link.guidForScala(t, k)

  def run(
      turns: Seq[Turn],
      dict: Map[(String, String), String], // (entity_type, variant_norm) -> canonical_norm
      fuzzy: Boolean = true,
      fuzzyTypes: Set[String] = Set("Person", "Org", "City", "Nation"),
      threshold: Double = 0.7): (Set[EdgeRow], Set[NodeRow]) = {

    // S2: replay dedup (min by (ts, role, tool, text)) + stable order
    val deduped = turns
      .groupBy(t => (t.conv_id, t.turn_idx))
      .view.mapValues(_.minBy(t => (t.ts.getTime, t.role, t.tool, t.text)))
      .values.toSeq

    // S3: per-conversation ordered extraction with pronoun resolution
    val raw = mutable.ArrayBuffer.empty[RawTriple]
    deduped.groupBy(_.conv_id).foreach { case (_, convTurns) =>
      var lastPerson: Option[String] = None
      convTurns.sortBy(_.turn_idx).foreach { tu =>
        val (ts, person) = Extract.extractTurn(tu.conv_id, tu.turn_idx, tu.role, tu.tool, tu.text)
        if (person.isDefined) lastPerson = person
        ts.foreach { tr =>
          if (tr.subj_tuid == Extract.PronounTuid)
            lastPerson.foreach(p => raw += tr.copy(subj_tuid = p))
          else raw += tr
        }
      }
    }

    // S4: mentions → dict keys
    val mentions: Set[(String, String)] =
      raw.map(t => (t.subj_type, norm(t.subj_tuid))).toSet ++
        raw.collect { case t if t.obj_kind == ObjKind.Subject =>
          (t.obj_type.get, norm(t.obj_tuid.get))
        }
    def dictKey(et: String, nk: String): String = dict.getOrElse((et, nk), nk)

    // exact all-pairs fuzzy same-as + union-find
    val uf = new UnionFind
    if (fuzzy) {
      val byType = mentions.groupBy(_._1)
      byType.foreach { case (et, ms) =>
        if (fuzzyTypes(et)) {
          val keys = ms.map { case (t, nk) => dictKey(t, nk) }.toVector.sorted
          for (i <- keys.indices; j <- (i + 1) until keys.size) {
            if (Link.jaccard(keys(i), keys(j)) >= threshold) uf.union(keys(i), keys(j))
          }
        }
      }
    }
    def canonical(et: String, surface: String): String = {
      val dk = dictKey(et, norm(surface))
      if (fuzzy && fuzzyTypes(et)) uf.find(dk) else dk
    }

    // S5+S7: label + dedupe
    val edges: Set[EdgeRow] = raw.map { t =>
      val sCk = canonical(t.subj_type, t.subj_tuid)
      val (oT, oG) =
        if (t.obj_kind == ObjKind.Subject) {
          val ck = canonical(t.obj_type.get, t.obj_tuid.get)
          (t.obj_type, Some(guid(t.obj_type.get, ck)))
        } else (None, None)
      EdgeRow(t.subj_type, guid(t.subj_type, sCk), t.pred, t.obj_kind,
        oT, oG, t.obj_string, t.obj_int64, t.obj_float64)
    }.toSet

    val nodes: Set[NodeRow] = mentions.map { case (et, nk) =>
      val ck = canonical(et, nk)
      NodeRow(guid(et, ck), et, ck)
    }

    (edges, nodes)
  }
}
