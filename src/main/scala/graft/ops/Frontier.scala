package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}

/** The ONE accumulate-and-descend loop shared by every iterative
  * frontier traversal (graphene root resolution / leaves-of-root /
  * lineage closure — frontends/graphene.py:721-784,918-963 — and the
  * connected-components pointer-jumping rounds).
  *
  * Before r15 each site hand-rolled this loop with subtly different
  * checkpoint placement; the one site that materialized nothing
  * (j6b_leaves_stop_layer) re-derived its shared edge subtree in every
  * union branch and produced a 170-node plan with 48 scans of the edge
  * source (r14 verdict, "What's wrong #2"). Centralizing the loop makes
  * the materialization discipline structural:
  *
  *  - each round's step output is `localCheckpoint()`ed exactly once,
  *    so every downstream consumer (emit branches, the next frontier,
  *    the empty-probe) reads materialized blocks instead of re-running
  *    the join — per-round work stays proportional to the frontier,
  *    never to the plan's union fan-out;
  *  - lineage is cut each round, so plan size is O(1) in depth instead
  *    of O(depth) (at 100x scale a deep loop otherwise overwhelms the
  *    optimizer before it overwhelms the cluster);
  *  - the optional emptiness probe runs one cheap job over the
  *    checkpointed rows (never a re-derivation), letting data-bounded
  *    loops short-circuit below their depth cap.
  *
  * Harness loops release the per-round checkpoint blocks after the
  * invocation via [[BlockPins.sweep]].
  */
object Frontier {
  /** Iterate `frontier -> step -> (emits, next frontier)` for at most
    * `maxRounds` rounds.
    *
    * @param start      round-0 frontier
    * @param maxRounds  depth cap (hierarchy depth / history bound)
    * @param probeEmpty probe the new frontier for emptiness after each
    *                   round and stop early (use when the cap is a
    *                   safety bound rather than the exact depth)
    * @param step       frontier -> this round's joined/derived rows;
    *                    materialized ONCE per round via localCheckpoint
    * @param emitAndNext (frontier, checkpointed stepped, round) ->
    *                    (rows to emit this round, next frontier); both
    *                    sides should derive from the checkpointed
    *                    `stepped`, so filters re-run over blocks, not
    *                    over the join
    * @return (emitted batches in round order, final frontier)
    */
  def iterate(start: DataFrame, maxRounds: Int, probeEmpty: Boolean = false)(
      step: (DataFrame, Int) => DataFrame)(
      emitAndNext: (DataFrame, DataFrame, Int) => (Seq[DataFrame], DataFrame))
      : (Seq[DataFrame], DataFrame) = {
    var frontier = start
    val out = Seq.newBuilder[DataFrame]
    var round = 0
    var drained = false
    while (round < maxRounds && !drained) {
      val stepped = step(frontier, round).localCheckpoint()
      val (emits, next) = emitAndNext(frontier, stepped, round)
      out ++= emits
      frontier = next
      round += 1
      if (probeEmpty) drained = frontier.isEmpty
    }
    (out.result(), frontier)
  }

  /** Union an emitted-batch list with a tail, tolerating empty lists. */
  def unionAll(batches: Seq[DataFrame], tail: DataFrame): DataFrame =
    (batches :+ tail).reduce(_ unionAll _)

  /** Whole-table fixpoint iteration (the pointer-jumping shape): the
    * state is re-derived entirely each round rather than shrinking as
    * a frontier. Same materialization discipline as [[iterate]] — one
    * localCheckpoint per round caps lineage at O(1) in depth — with a
    * caller-supplied convergence probe over the CHECKPOINTED state (a
    * cheap aggregate on blocks, e.g. a monotone sum; never a compare
    * join against the previous round's full table).
    *
    * @param start     round-0 state (checkpointed before the first step)
    * @param maxRounds safety cap (pointer jumping converges in
    *                  O(log diameter); the cap only guards a bug)
    * @param step      state -> next state, materialized once per round
    * @param converged probe on the new checkpointed state; true stops
    */
  def fixpoint(start: DataFrame, maxRounds: Int = 64)(
      step: (DataFrame, Int) => DataFrame)(
      converged: (DataFrame, Int) => Boolean): DataFrame = {
    var state = start.localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      state = step(state, round).localCheckpoint()
      done = converged(state, round)
      round += 1
    }
    state
  }

  /** [[fixpoint]] with the convergence metric computed INSIDE each
    * round's checkpoint job via `Dataset.observe` (CollectMetricsExec
    * fills a driver-side accumulator while the localCheckpoint action
    * materializes the round), so a round costs ONE job submission
    * instead of two. At bench scale the separate probe was a full
    * extra job (+ AQE re-planning) per round on every propagateMin
    * caller; at 100 TB it was an extra pass over the state table per
    * round. Accumulator updates ride task completion on the scheduler
    * path (not the async listener bus), so the metric row is complete
    * as soon as the checkpoint job returns.
    *
    * @param metric    aggregate expression(s) evaluated over the new
    *                  state during its materialization
    * @param converged probe on the observed metric Row; true stops
    */
  def fixpointObserved(start: DataFrame, metric: Column,
      maxRounds: Int = 64)(
      step: (DataFrame, Int) => DataFrame)(
      converged: (Row, Int) => Boolean): DataFrame = {
    var state = start.localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val name = s"graft_fixpoint_$round"
      val observed = step(state, round).observe(name, metric)
      state = observed.localCheckpoint()
      done = converged(observed.queryExecution.observedMetrics(name), round)
      round += 1
    }
    state
  }

  /** Fixed shallow round count with NO per-round materialization: the
    * rounds unroll into one plan, and only the final state is
    * checkpointed (for its downstream consumers). Correct ONLY when
    * every expensive input the rounds touch is already materialized
    * (edge/node tables checkpointed by the caller) — then the unrolled
    * plan's bounded fan-out re-reads BLOCKS, and one optimizer-visible
    * DAG beats `rounds` checkpoint jobs of ~70 ms scheduler floor each
    * (measured r15: pagerank's 3 two-shuffle rounds cost 1.3 s unrolled
    * vs 2.4 s with per-round checkpoints at bench scale). For unbounded
    * or deep loops use [[fixpoint]] — lineage growth is the bigger
    * enemy there.
    *
    * `materializeFinal = false` skips the final checkpoint too: right
    * when the result has exactly ONE consumer (a count, one sink
    * write), where materializing first just pays an extra job to copy
    * blocks the single action would have streamed anyway. Leave it on
    * for multi-consumer results (graph_lpa's sizes agg + rejoin).
    */
  def unrolled(start: DataFrame, rounds: Int,
      materializeFinal: Boolean = true)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var state = start
    (0 until rounds).foreach(r => state = step(state, r))
    if (materializeFinal) state.localCheckpoint() else state
  }
}
