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
    * the loop exits as soon as a round changes nothing.
    *
    * Each round MUST truncate lineage, not merely cache: the round's
    * plan references the previous labels twice (propagation +
    * convergence check), so the logical plan doubles per round — by
    * round 8 that is a 2⁸-node tree whose AQE explain strings alone
    * OOM the driver. Checkpointing replaces the lineage with the
    * materialized rows, keeping every round's plan constant size —
    * the standard discipline for iterative DataFrame algorithms.
    *
    * `checkpointDir` picks the truncation mechanism:
    *  - None (default): `localCheckpoint` — blocks live on executors.
    *    Right for local mode and dev loops (no filesystem round-trip),
    *    but an executor loss mid-iteration kills the job because the
    *    checkpointed blocks have no lineage to recompute from.
    *  - Some(dir): reliable `checkpoint()` to `dir` (HDFS/object
    *    store on a cluster) — each round's labels are persisted to
    *    storage that survives executor loss, the production-grade
    *    variant for long-running 100 TB dedup jobs. Costs one
    *    write+read of O(|V|) rows per round. STORAGE NOTE: Spark does
    *    not delete reliable checkpoint files on its own — without
    *    cleanup `dir` accumulates one O(|V|) copy per round until the
    *    application exits. This loop drops its reference to each
    *    previous round, so setting
    *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
    *    context-creation conf) lets the ContextCleaner GC-delete
    *    superseded rounds; otherwise reap `dir` after the job. The
    *    context's previous checkpoint dir (a PROCESS-GLOBAL setting)
    *    is restored on exit when one was set; if none was set, `dir`
    *    remains the context's checkpoint dir — Spark has no unset.
    *    CONCURRENCY: because `setCheckpointDir` mutates that global,
    *    the `Some(dir)` path MUST NOT run concurrently with another
    *    `components(checkpointDir = Some(...))` call or any other job
    *    using `checkpoint()` on the same context — toggle and restore
    *    can interleave and leave the context checkpointing into the
    *    wrong directory. Concurrent callers should instead set the
    *    context checkpoint dir ONCE at session creation and pass that
    *    SAME dir here (setCheckpointDir is then idempotent and the
    *    restore writes back the identical value). */
  def components(vertices: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val sc = vertices.sparkSession.sparkContext
    val prevCheckpointDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // both variants are EAGER: the round must materialize before its
    // changed-count is read, and lineage must be cut before the next
    // round's plan is built on top
    val truncate: DataFrame => DataFrame =
      if (checkpointDir.isDefined) _.checkpoint() else _.localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val eBoth = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst"))).persist()
    try {
      var labels = truncate(vertices.select(col(idCol).as("id"), col(idCol).as("comp")))
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIter) {
        val prop = eBoth.join(labels, col("src") === col("id"))
          .groupBy(col("dst")).agg(min(col("comp")).as("ncomp"))
        // the changed flag rides the checkpointed frame, so convergence
        // is a filter-count on cached rows — no extra join per round
        val next = truncate(labels.join(prop, col("id") === col("dst"), "left")
          .withColumn("newcomp", least(col("comp"), coalesce(col("ncomp"), col("comp"))))
          .select(col("id"), col("newcomp").as("comp"),
            (col("newcomp") < col("comp")).as("changed")))
        changed = next.filter(col("changed")).count()
        labels = next.drop("changed") // previous rounds' RDDs free on GC
        it += 1
      }
      // silently returning partial labels would hand a dedup pipeline
      // multiple "canonical" ids for one true component — fail loudly
      if (changed > 0) throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          s"($changed labels still changing); raise maxIter for graphs of larger diameter")
      labels
    } finally {
      eBoth.unpersist(blocking = false)
      if (checkpointDir.isDefined) prevCheckpointDir.foreach(sc.setCheckpointDir)
    }
  }
}
