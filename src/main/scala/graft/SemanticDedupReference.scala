package graft

/** Independent plain-Scala reimplementation of the SemDeDup pipeline
  * (q80) — scalar loops over collected arrays, sharing NOTHING with the
  * Spark operator's execution beyond the deterministic centroid frame
  * both derive from (`Similarity.ivfCentroids`; training determinism is
  * its own spec-gated contract). Assignment, within-cluster pair
  * search, union-find transitivity, and the farthest-from-centroid
  * election are all re-derived from the paper's definitions.
  *
  * Lives in main (the round-13 `BpeReference`/`UnigramReference`
  * convention) so q80's entry can STAGE its verdicts as parquet and the
  * DuckDB oracle can hash-compare the Spark operator against it — a
  * driver-checked full differential rather than a ScalaTest-only one.
  * Driver-side by design: an ORACLE twin runs at oracle scale
  * (thousands of vectors), never at corpus scale — the distributed path
  * is the operator itself.
  */
object SemanticDedupReference {

  /** Keep/drop verdicts: (vec_id, component_id, canonical_vec, keep) for
    * every vector in a semantic-duplicate component — the q80 emit.
    * `vecs`/`cent` are (id, embedding, l2norm) rows. */
  def verdicts(vecs: Array[(Long, Array[Double], Double)],
      cent: Array[(Long, Array[Double], Double)],
      tau: Double): Seq[(Long, Long, Long, Boolean)] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    // nearest centroid, ties to the HIGHER cent_id (the operator's
    // max_by struct order)
    val assign = vecs.map { case (id, v, n) =>
      id -> cent.map { case (cid, cv, cn) => (dot(v, cv) / (n * cn), cid) }.max._2
    }.toMap
    val byId = vecs.map(t => t._1 -> t).toMap
    val centCos = vecs.map { case (id, v, n) =>
      val (_, cv, cn) = cent.find(_._1 == assign(id)).get
      id -> dot(v, cv) / (n * cn)
    }.toMap
    // within-cluster pairs at cosine >= tau, resolved by union-find
    val ids = vecs.map(_._1).sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val byCluster = ids.groupBy(assign)
    byCluster.valuesIterator.foreach { members =>
      for (i <- members.indices; j <- (i + 1) until members.length) {
        val a = members(i) min members(j); val b = members(i) max members(j)
        val (_, va, na) = byId(a); val (_, vb, nb) = byId(b)
        if (dot(va, vb) / (na * nb) >= tau) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra max rb) = ra min rb
        }
      }
    }
    val grouped = ids.groupBy(find).filter(_._2.length > 1)
    grouped.toSeq.flatMap { case (c, members) =>
      // keepList election: minimize (cosine-to-centroid, id) — the
      // paper's farthest-from-centroid keep policy with id tie-break
      val canonical = members.minBy(m => (centCos(m), m))
      members.map(m => (m, c, canonical, m == canonical))
    }.sortBy(_._1)
  }
}
