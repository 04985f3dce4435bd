package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by alternating large-star / small-star
  * rounds (the MapReduce-and-beyond formulation: each round hangs every
  * node under the minimum of its neighborhood, from two directions) — the
  * O(log n)-round alternative to [[Dedup.duplicateClusters]]'s min-label
  * propagation, for graphs whose components can be DEEP (chains) rather
  * than the shallow stars near-dup clusters form.
  *
  * Both operations are join + partial-min aggregations on the node id —
  * no per-node neighbor lists are ever collected, so a high-degree node
  * costs a hash-agg combine, not memory:
  *
  *  - large-star: for every edge (u, v) with v > u, re-link v to
  *    m(u) = min(neighborhood(u) ∪ u). Bounds the growth of high-degree
  *    nodes and strictly shrinks tall trees.
  *  - small-star: for every edge (u, v) with v <= u, re-link v to m(u)
  *    (and u itself to m(u)). Flattens what large-star hung.
  *
  * Fixpoint: every node linked directly to its component minimum (a
  * star). Deterministic — the fixpoint is unique, so results are
  * engine-portable and comparable to a union-find oracle
  * (PropertiesSpec).
  */
object Components {

  /** Driver-side union-find over an edge list already in hand: (node,
    * component) for every node in `nodes`, component = min node id of its
    * component — the same fixpoint [[connectedComponents]] reaches,
    * without any Spark job. Callers guarantee boundedness (the admission
    * frontier's bounded takes; the distributed path's `driverThreshold`
    * guard). */
  private[graft] def unionFindLocal(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach(n => parent(n) = n)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => (n, find(n)))
  }

  /** Symmetric neighbor minima: for each node u over the symmetrized edge
    * relation, m(u) = min(neighbors(u) ∪ u). */
  private def neighborMin(sym: DataFrame): DataFrame =
    sym.groupBy(col("u"))
      .agg(least(min(col("v")), first(col("u"))).as("m"))

  private def symmetrize(e: DataFrame): DataFrame =
    e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))

  private def largeStar(e: DataFrame): DataFrame = {
    val sym = symmetrize(e)
    sym.join(neighborMin(sym), "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val sym = symmetrize(e)
    val m = neighborMin(sym)
    sym.join(m, "u")
      .filter(col("v") <= col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .union(m.select(col("u").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** (node, component) for every node appearing in `edges` (columns
    * a, b), component = min node id of its component. Rounds are
    * O(log n) in the worst case; each round is two join+agg shuffles on
    * the node id with lineage truncated per round.
    *
    * Graphs at or under `driverThreshold` distinct edges short-circuit
    * to a driver-side union-find: the daily-admission frontier graph is
    * typically a few hundred edges, where the O(log n) rounds are pure
    * job-scheduling latency (~10 jobs to label 50 edges). The collect is
    * size-GUARDED — both the edge count and the node count must fit —
    * so it is the same bounded driver-side material as the ANN centroid
    * collects, and the result is identical by construction (union-find
    * under min-representative = min node id per component). Pass 0 to
    * force the distributed path. */
  /** Default driver-side cap — shared with the admission paths'
    * own bounded frontier takes so the two fast paths cannot drift. */
  val DefaultDriverThreshold: Int = 1 << 16

  def connectedComponents(edges: DataFrame, maxRounds: Int = 50,
      driverThreshold: Int = DefaultDriverThreshold): DataFrame = {
    val ePlan = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b")).distinct()
    val uPlan = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct()
    // guard on the PROJECTED a/b columns (edges may carry extra columns
    // in any order; positional fields would mis-detect the node type)
    val longTyped = ePlan.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped && driverThreshold > 0) {
      // bounded takes, not count-then-collect: two jobs decide AND fetch.
      // An over-threshold graph pays one partial extra pass and falls
      // through to the distributed rounds.
      val eTake = ePlan.take(driverThreshold + 1)
      if (eTake.length <= driverThreshold) {
        val uTake = uPlan.take(2 * driverThreshold + 3)
        if (uTake.length <= 2 * driverThreshold + 2) {
          val spark = edges.sparkSession
          import spark.implicits._
          return unionFindLocal(uTake.map(_.getLong(0)).toSeq,
            eTake.map(r => (r.getLong(0), r.getLong(1))).toSeq)
            .toDF("node", "component")
        }
      }
    }
    val universe = graft.Checkpoints.pin(uPlan)
    var e = graft.Checkpoints.pin(ePlan)
    // failure paths (non-convergence, a Spark error mid-round) must not
    // leak the live pins either — under CheckpointPolicy.Reliable a
    // retrying caller would otherwise accumulate one universe + one
    // edge-set checkpoint per attempt on shared storage
    try {
      // carry each round's count forward: recounting the (checkpointed)
      // previous edge set would be one avoidable Spark job per round
      var eCount = e.count()
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val next = graft.Checkpoints.pin(smallStar(largeStar(e)))
        // BOTH probe actions are guarded: a failure after the pin but
        // before `e = next` would otherwise leak this round's checkpoint
        // (the enclosing finally only knows universe and the OLD e)
        val (conv, nextCount) =
          try {
            val n = next.count()
            // fixpoint: the (distinct, oriented) edge sets are identical
            (n == eCount && next.except(e).limit(1).isEmpty, n)
          } catch { case t: Throwable =>
            graft.Checkpoints.free(next); throw t
          }
        converged = conv
        // the superseded round's pin is dead once the convergence probe
        // has read it — free it NOW, or under CheckpointPolicy.Reliable
        // (where Spark never auto-cleans checkpoint files) every
        // clustering call leaks one directory per round for the app's life
        graft.Checkpoints.free(e)
        e = next
        eCount = nextCount
        round += 1
      }
      // never return (or let a caller cache) intermediate labels: a
      // non-fixpoint edge set maps nodes to non-minimum labels
      require(converged,
        s"large-star/small-star did not converge in $maxRounds rounds — raise maxRounds")
      // at the fixpoint every edge is (node > component-min) -> (min).
      // Joining back to the node universe keeps nodes whose only edges
      // were self-loops (filtered from e) as their own singletons.
      val labeled = e.select(col("a").as("node"), col("b").as("component"))
      // pin the labels so the universe/final-edge pins can be released
      // here rather than leaking for process life (callers see a flat
      // relation and never re-run the fixpoint); label rows are
      // node-count-sized.
      graft.Checkpoints.pin(
        universe.join(labeled, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("component"), col("node")).as("component"))
          .distinct())
    } finally {
      graft.Checkpoints.free(universe)
      graft.Checkpoints.free(e)
    }
  }
}
