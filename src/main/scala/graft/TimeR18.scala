package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 100× probes over the make_scale replica (default
  * /tmp/sf10): the delete/takedown lifecycle + maintenance costs —
  *   - deleteFromLshIndex over a 500k-doc signature index (build,
  *     delete ~12%, probe);
  *   - deleteFromIvfIndex / deleteFromIvfPqIndex /
  *     deleteFromBinaryIndex over 200k vectors;
  *   - retractCensusBatch / retractCmsBatch;
  *   - varianceAllocation (the parametric-OPQ fit — two bounded
  *     aggregation passes, corpus-size-linear, model-size output);
  *   - repairGraphIndex vs rebalanceGraphIndex on the SAME drifted
  *     index (the sublinearity claim: local repair ≪ full descent).
  * Usage: runMain graft.TimeR18 [sfDir] */
object TimeR18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = s"/tmp/graft_timer18_${System.nanoTime()}"
    val docs = Tables.load(spark, dir, "documents").repartition(32).cache()
    println(s"docs: ${docs.count()}")
    val emb = Tables.load(spark, dir, "embeddings").repartition(32).cache()
    println(s"embeddings: ${emb.count()}")
    val li = Tables.load(spark, dir, "lineitem").repartition(32).cache()
    println(s"lineitem: ${li.count()}")

    // ---- LSH index takedown over 500k docs
    time("lsh build (500k docs)") {
      operators.Dedup.buildLshIndex(docs, "doc_id", "text", 16, 2,
        s"$base/lsh")
    }
    time("lsh delete ~12% ids") {
      operators.Dedup.deleteFromLshIndex(spark,
        docs.filter($"doc_id" % 8 === 1), "doc_id", s"$base/lsh")
    }

    // ---- vector index takedowns over 200k vectors
    time("ivf build (200k vecs)") {
      operators.Similarity.buildIvfIndex(emb, "vec_id", "embedding",
        nCells = 8, s"$base/ivf")
    }
    time("ivf delete ~6%") {
      operators.Similarity.deleteFromIvfIndex(spark,
        emb.filter($"vec_id" % 16 === 3), "vec_id", s"$base/ivf")
    }
    time("ivfpq build (200k vecs)") {
      operators.Pq.buildIvfPqIndex(emb, "vec_id", "embedding",
        nCells = 8, m = 4, kSub = 16, s"$base/ivfpq")
    }
    time("ivfpq delete ~6%") {
      operators.Pq.deleteFromIvfPqIndex(spark,
        emb.filter($"vec_id" % 16 === 3), "vec_id", s"$base/ivfpq")
    }
    time("binary build (200k vecs)") {
      operators.Similarity.buildBinaryIndex(emb, "vec_id", "embedding",
        s"$base/bin")
    }
    time("binary delete ~6%") {
      operators.Similarity.deleteFromBinaryIndex(spark,
        emb.filter($"vec_id" % 16 === 3), "vec_id", s"$base/bin")
    }

    // ---- count-store batch retraction
    time("census store build+2 appends") {
      operators.Quantiles.buildCensusStore(
        li.filter($"l_orderkey" % 3 === 0),
        Seq("l_returnflag"), "l_quantity", s"$base/census")
      operators.Quantiles.appendToCensusStore(
        li.filter($"l_orderkey" % 3 === 1), s"$base/census", 1L)
      operators.Quantiles.appendToCensusStore(
        li.filter($"l_orderkey" % 3 === 2), s"$base/census", 2L)
    }
    time("census retract batch 2") {
      operators.Quantiles.retractCensusBatch(spark, s"$base/census", 2L)
    }
    time("cms store build+append (500k docs)") {
      operators.Cms.buildCmsStore(docs.filter($"doc_id" % 2 === 0),
        "text", 4, 16, s"$base/cms")
      operators.Cms.appendToCmsStore(docs.filter($"doc_id" % 2 === 1),
        "text", s"$base/cms", 1L)
    }
    time("cms retract batch 1") {
      operators.Cms.retractCmsBatch(spark, s"$base/cms", 1L)
    }

    // ---- parametric-OPQ allocation fit (200k vectors)
    for (rep <- 1 to 2)
      time(s"varianceAllocation 200k (pass $rep)") {
        operators.Pq.varianceAllocation(emb, "embedding", 4)
      }

    // ---- q88/q89 market analytics over 10M events
    val ev = Tables.load(spark, dir, "events").repartition(32).cache()
    println(s"events: ${ev.count()}")
    for (rep <- 1 to 2)
      time(s"q88 bollinger 10M events (pass $rep)") {
        Queries.bollingerOf(ev).agg(sum($"n_up"), sum($"n_dn")).collect()
      }
    for (rep <- 1 to 2)
      time(s"q89 vwap 10M events (pass $rep)") {
        Queries.vwapOf(ev).agg(sum($"volume"), sum($"vwap_c")).collect()
      }
    ev.unpersist()

    // ---- graph repair vs full rebalance on the SAME drifted index,
    // at TWO corpus sizes: the sublinearity claim is repair staying
    // FLAT (frontier-bounded — the 512-node mode + its 1-hop
    // neighborhood) while full NN-descent rebalance grows with the
    // node count.
    val drift = (10000000L until 10000512L).map { i =>
      val v = Array.tabulate(64)(d =>
        if (d < 8) 1.0 + 0.001 * ((i * 7 + d) % 13) else 0.0)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    for (nSub <- Seq(20000L, 60000L)) {
      val gdir = s"$base/graph$nSub"
      val sub = emb.filter($"vec_id" < nSub).cache()
      println(s"graph subset: ${sub.count()}")
      // nBuckets scales with n (constant ~300/bucket): fixed buckets
      // make the in-bucket seed pairs quadratic in n — measured 27×
      // build cost for 3× nodes at nBuckets=64 — where constant
      // occupancy keeps the descent ~linear (the production rule)
      val nBuckets = (nSub / 300L).toInt
      time(s"graph build (${nSub / 1000}k nodes, $nBuckets buckets)") {
        operators.GraphAnn.buildGraphIndex(sub, "vec_id", "embedding",
          k = 6, nBuckets = nBuckets, iters = 2, gdir)
      }
      time(s"graph append 512-node mode (${nSub / 1000}k)") {
        operators.GraphAnn.appendToGraphIndex(drift, "vec_id",
          "embedding", gdir)
      }
      time(s"graph LOCAL repair (512-node mode, ${nSub / 1000}k)") {
        operators.GraphAnn.repairGraphIndex(spark, gdir,
          drift.select($"vec_id"), "vec_id")
      }
      time(s"graph FULL rebalance (${nSub / 1000}k)") {
        operators.GraphAnn.rebalanceGraphIndex(spark, gdir)
      }
      sub.unpersist()
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
