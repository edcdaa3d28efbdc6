package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl curation: PageRank is the classic
  * seed-selection / host-reputation signal computed over the edge table
  * that [[PageMeta.outlinks]] extracts.
  *
  * This implementation is INTEGER-ARITHMETIC PageRank: ranks live in
  * integer "micro-units" and every step uses integer division, so the
  * result is bit-identical regardless of partitioning, aggregation order,
  * retries, or engine — floating-point PageRank is not (IEEE addition is
  * not associative, so a shuffle-order change alters low bits and a
  * hash-based correctness gate can never pin it). The truncation loss
  * (a few units per division, dangling-node leakage) only DAMPS ranks —
  * relative ordering, which is all curation consumes, is preserved; the
  * deterministic trade is documented here and hash-gated by q62's
  * iteration-unrolled SQL oracle.
  *
  * Scale shape: per iteration one equi-join (edges × ranks, shuffle on
  * src), one map-side-combined sum (shuffle on dst), one left join back to
  * the node table. Lineage is truncated each iteration with
  * `localCheckpoint` (same plan-hygiene rule as Dedup's clustering loop —
  * constant plan depth, bounded recompute). With `unit` = 1e6 and total
  * in-flight mass ≤ nodes × unit × 100, Long overflow needs ~1e11 nodes;
  * shrink `unit` if your graph is bigger.
  */
object LinkGraph {

  /** @param nodes one column `node` (Long) — the vertex set
    * @param edges columns `src`, `dst` (Long); parallel edges count
    *              toward out-degree and contribute separately
    * @return (node, rank) with rank in micro-units (init = `unit`)
    */
  def pageRankInt(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      dampPct: Int = 85, unit: Long = 1000000L): DataFrame = {
    require(dampPct >= 0 && dampPct <= 100, s"dampPct $dampPct out of range")
    val e = edges.select(col("src"), col("dst"))
    // out-degree is ITERATION-INVARIANT: join it onto the edge table once
    // and checkpoint the (src, dst, out_deg) result eagerly — each round
    // then runs ONE equi-join + one agg instead of re-aggregating degrees
    // and joining twice per iteration (loop-invariant hoisting; the
    // checkpoint also replaces the plain edge cache, same block reuse)
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("out_deg")), "src")
      .select(col("src"), col("dst"), col("out_deg"))
      .localCheckpoint(true)
    val base = (100L - dampPct) * unit / 100L
    // EAGER checkpoints: each round materializes inside the loop, so the
    // edge blocks actually serve their read per iteration (lazy
    // checkpoints would defer every read to the final action, rescanning
    // the edge source per round with zero block hits)
    var rank = nodes.select(col("node")).withColumn("rank", lit(unit))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      // per-edge share with integer division, then an order-independent
      // integer sum per target
      val contrib = eDeg.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("rank div out_deg").as("share"))
        .groupBy("dst").agg(sum("share").as("in_share"))
      val next = rank.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"$dampPct * coalesce(in_share, 0L) div 100")).as("rank"))
        .localCheckpoint(true)
      rank = next
      i += 1
    }
    rank
  }
}
