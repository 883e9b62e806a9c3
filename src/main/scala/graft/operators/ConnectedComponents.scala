package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the Pregel shape in plain DataFrames, used by
  * the dedup pipeline to collapse transitive near-dup pairs ("A≈B, B≈C"
  * → one cluster) without a graph library.
  *
  * Each sweep updates label(x) ← min over {x} ∪ {labels of x's
  * neighbors} and the fixpoint assigns every node the minimum node id of
  * its component — a value independent of sweep count, partitioning, or
  * execution order, so the result is deterministic even though the loop
  * length is data-dependent (= graph diameter). Per sweep the exchange
  * carries only (node, label) pairs of longs — never any payload — and
  * the convergence probe is a limit-1 existence check, not a count.
  * Components in dedup graphs are shallow (boilerplate chains, a few
  * hops); `maxSweeps` guards against a pathological path graph looping
  * unbounded.
  */
object ConnectedComponents {

  /** @param edges two long columns `a`, `b` (undirected; need not be
    *              symmetrized or deduplicated)
    * @return (node, cluster) — every node that appears in an edge,
    *         labeled with its component's minimum node id
    */
  def run(edges: DataFrame, maxSweeps: Int = 64): DataFrame = {
    // symmetrize in ONE pass over `edges` (r18 opt): the union-with-swap
    // spelling executed the caller's edge subtree once per branch when
    // this persist first materializes — for er2 that subtree is the
    // whole blocker candidate join + levenshtein verify (the two
    // branches share no exchange: the final projections differ). The
    // explode-of-both-orientations projection reads every edge row once
    // and emits both directions map-side; same row multiset, no second
    // execution.
    val sym = edges.select(col("a"), col("b"))
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK) // consumed once per sweep
    // Every sweep must TRUNCATE lineage, not just cache it: the sweep
    // plan references the previous labels twice (join + union), so with
    // persist alone the logical plan doubles per sweep — exponential
    // planning cost that OOMs the driver near ~16 sweeps. localCheckpoint
    // is eager, so it also materializes the frame the convergence probe
    // and next sweep reuse. (A lost checkpoint block fails the job
    // loudly — the correct failure mode; a production run on an
    // unreliable cluster would use reliable checkpoint() instead.)
    var checkpointed = sym.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    var labels = checkpointed
    var converged = false
    var sweeps = 0
    try {
      while (!converged) {
        sweeps += 1
        require(sweeps <= maxSweeps, s"label propagation did not converge in $maxSweeps sweeps")
        // The self-arm of the union carries the node's OLD label through
        // the aggregate (each node has exactly one self row, so max() is
        // that value): the sweep's output then answers the convergence
        // question by itself, and the probe is a filter over the frame
        // the checkpoint just materialized — no per-sweep probe JOIN
        // against the previous labels (which used to cost a second
        // shuffle-shaped job every sweep).
        val prop = sym.join(labels.select(col("node").as("a"), col("lab")), Seq("a"))
          .select(col("b").as("node"), col("lab"), lit(null).cast("bigint").as("old"))
          .unionByName(labels.select(col("node"), col("lab"), col("lab").as("old")))
          .groupBy("node").agg(min("lab").as("lab"), max("old").as("old"))
          .localCheckpoint()
        converged = prop.filter(col("lab") =!= col("old")).isEmpty
        // the probe was this sweep's LAST read of the old labels — free
        // its checkpoint blocks now instead of letting up to maxSweeps
        // of them pile up in executor storage until ContextCleaner GC
        // (ADVICE r05); safe because nothing downstream references it
        org.apache.spark.sql.GraftShims.checkpointedRdd(checkpointed)
          .foreach(_.unpersist(blocking = false))
        checkpointed = prop
        labels = prop.select(col("node"), col("lab"))
      }
    } finally sym.unpersist() // also on sweep failure / non-convergence
    labels.select(col("node"), col("lab").as("cluster"))
  }
}
