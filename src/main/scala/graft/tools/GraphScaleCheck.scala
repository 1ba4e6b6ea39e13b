package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Periphery-collapse evidence for `Graph.kCore` (the FunnelScaleCheck
  * discipline applied to iterative peeling).
  *
  * The adversarial-looking input for k-core is a HAIRBALL: a small
  * dense core buried under a periphery orders of magnitude larger
  * (real web/interaction graphs are exactly this — most nodes are
  * low-degree). The worry: does the iteration keep re-shuffling the
  * full edge list every round? It must not — round 1's degree
  * aggregate removes the whole periphery at once (synchronous
  * peeling), so every later round's shuffle is CORE-sized. Peeling
  * cost is one periphery-sized pass + rounds × core-sized passes, not
  * rounds × periphery-sized.
  *
  * This tool plants a K-clique core (survives any k < K) under a
  * pendant-tree periphery of `n` nodes (degree ≤ 2, all gone in ≤2
  * rounds), measures the per-round surviving edge count, and times the
  * full operator at growing periphery sizes. The readout to record:
  * edges after round 1 ≈ core edges (independent of n), and total
  * runtime grows ~linearly in n while the number of rounds stays
  * constant. Numbers land in PLANS.md (scale-evidence section).
  *
  * Run: `sbt "runMain graft.tools.GraphScaleCheck [nMax]"`. */
object GraphScaleCheck {

  private val CoreNodes = 60 // K-clique: survives k = 40 comfortably

  /** Clique core (ids 0..59) + pendant 2-chains hanging off core node
    * 0: periphery node i links to i+n (a pendant leaf), and i links to
    * core node i % 60 — so periphery degrees are ≤ 2 and every
    * periphery edge dies within two peel rounds at k = 40. */
  private def hairball(spark: SparkSession, n: Long): DataFrame = {
    val core = spark.range(CoreNodes).selectExpr("id AS a")
      .crossJoin(spark.range(CoreNodes).selectExpr("id AS b"))
      .filter(col("a") < col("b"))
    val stem = spark.range(1000, 1000 + n)
      .select(col("id").as("a"), (col("id") % CoreNodes).as("b"))
    val leaf = spark.range(1000, 1000 + n)
      .select(col("id").as("a"), (col("id") + n + 1000).as("b"))
    core.unionByName(stem).unionByName(leaf)
  }

  def main(args: Array[String]): Unit = {
    val nMax = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-round survivor counts at one representative size: replicate
    // the operator's peel loop step by step to expose the intermediate
    // edge frames (the operator itself only returns the fixpoint)
    locally {
      val n = nMax / 10
      var sym = {
        val e = hairball(spark, n)
        e.select(col("a"), col("b"))
          .unionAll(e.select(col("b").as("a"), col("a").as("b")))
          .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
      }
      println(s"[graphscale] n=$n round=0 directed_edges=${sym.count()}")
      var round = 0
      var done = false
      while (!done && round < 10) {
        val bad = sym.groupBy(col("a").as("nn")).agg(count(lit(1)).as("d"))
          .filter(col("d") < 40).select("nn").localCheckpoint(true)
        if (bad.isEmpty) done = true
        else {
          sym = sym.join(bad.withColumnRenamed("nn", "a"), Seq("a"), "left_anti")
            .join(bad.withColumnRenamed("nn", "b"), Seq("b"), "left_anti")
            .select("a", "b").localCheckpoint(true)
          round += 1
          println(s"[graphscale] n=$n round=$round directed_edges=${sym.count()}")
        }
      }
    }

    // end-to-end timing at growing periphery sizes
    Seq(nMax / 100, nMax / 10, nMax).foreach { n =>
      val edges = hairball(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val core = Graph.kCore(edges, "a", "b", k = 40)
      val nCore = core.count()
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"[graphscale] n=$n core_nodes=$nCore kcore_ms=$ms")
      assert(nCore == CoreNodes, s"expected the planted $CoreNodes-clique")
    }

    // BFS frontier growth (judge r8 item #5): a layered fan graph with
    // KNOWN layer sizes — seed -> n/10 hubs -> n leaves -> a 3-node
    // chain tail. Per-round work is frontier-adjacent edges, so the
    // expensive rounds are exactly the two fan layers and the chain
    // rounds are ~free; total O(|E|) across all rounds. The layer
    // counts are asserted, so the timing rows are also a correctness
    // replay at 10^6-edge scale.
    Seq(nMax / 100, nMax / 10, nMax).foreach { n =>
      val a = (n / 10).max(1)
      val seedEdges = spark.range(a)
        .select(lit(0L).as("u"), (col("id") + 1L).as("v"))
      val fan = spark.range(n)
        .select((col("id") % a + 1L).as("u"), (col("id") + a + 1L).as("v"))
      val c0 = a + n + 1L
      val tail = spark.range(3).select(
        when(col("id") === 0, lit(a + 1L)).otherwise(col("id") + c0 - 1L).as("u"),
        (col("id") + c0).as("v"))
      val edges = seedEdges.unionByName(fan).unionByName(tail)
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val layers = Graph.bfsLayers(edges, "u", "v", Seq(0L), maxDepth = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"[graphscale] bfs n=$n layers=${layers.toSeq.sorted.mkString(",")} bfs_ms=$ms")
      assert(layers == Map(0L -> 1L, 1L -> a, 2L -> n, 3L -> 1L, 4L -> 1L, 5L -> 1L),
        s"layer profile mismatch at n=$n: $layers")
    }

    // LPA label-frame evidence: two planted bipartite blocks (customers
    // even ids, suppliers odd — the q249 encoding) with strong
    // in-block edges (w=5) and weak cross-block edges (w=1). The label
    // frame stays NODE-sized every round (never edge-sized), and the
    // weighted majority collapses each block to a handful of
    // communities; n_communities << n_nodes is asserted.
    Seq(nMax / 100, nMax / 10, nMax).foreach { n =>
      val ns = (n / 10).max(4) / 2 * 2 // even supplier count, >= 4
      val half = ns / 2
      val cust = spark.range(n)
      val strongE = cust.select((col("id") * 2).as("l"),
        ((col("id") * 7 % half + (col("id") % 2) * half) * 2 + 1).as("r"),
        lit(5L).as("w"))
      val weakE = cust.select((col("id") * 2).as("l"),
        ((col("id") * 13 % half + ((col("id") + 1) % 2) * half) * 2 + 1).as("r"),
        lit(1L).as("w"))
      val edges = strongE.unionByName(weakE).localCheckpoint(true)
      val t0 = System.nanoTime()
      val com = Graph.labelPropagationBipartite(edges, "l", "r", "w", rounds = 3)
      val nNodes = com.count()
      val nCom = com.select(countDistinct(col("community"))).head.getLong(0)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"[graphscale] lpa n=$n nodes=$nNodes communities=$nCom lpa_ms=$ms")
      assert(nCom * 10 <= nNodes, s"labels failed to collapse: $nCom of $nNodes")
    }
    spark.stop()
  }
}
