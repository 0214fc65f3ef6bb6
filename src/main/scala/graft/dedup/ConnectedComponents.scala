package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * — the clustering step pair-based dedup is missing: verified pairs
  * say A~B and B~C, but dropping duplicates safely needs the whole
  * cluster {A,B,C} under one canonical id (pair-wise keep-lowest would
  * happily keep both A and C if the A~C pair was never banded).
  *
  * Algorithm: every vertex starts labeled with itself; each round a
  * vertex takes the min label among itself and its neighbors; fixpoint
  * = every vertex holds the min id of its component. Converges in at
  * most `diameter` rounds — duplicate clusters are near-cliques (tiny
  * diameter), so 2–4 rounds in practice. Each round is ONE edge⋈label
  * equi-join + ONE min-aggregate — all shuffles on compact id keys,
  * nothing quadratic; labels are re-persisted per round and the
  * previous round is released, so state is O(|V|) regardless of round
  * count. For adversarial long-chain graphs the published
  * large-star/small-star alternation bounds rounds at O(log n); dedup
  * graphs don't need it and the simple propagation keeps every step
  * oracle-checkable (DuckDB recursive CTE).
  */
object ConnectedComponents {

  /** (id, comp) for every vertex: comp = min vertex id reachable in
    * the undirected graph given by `edges`. `maxIter` is a safety cap;
    * the loop exits as soon as a round changes nothing. */
  def components(vertices: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val eBoth = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst"))).persist()
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("comp")).persist()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val prop = eBoth.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("ncomp"))
      val next = labels.join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .persist()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp")).count()
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    eBoth.unpersist(blocking = false)
    // the final labels stay cached (the caller's plan reads them);
    // registering with ScratchCache hands release to the runner's
    // post-query drain
    graft.core.ScratchCache.persist(labels)
  }
}
