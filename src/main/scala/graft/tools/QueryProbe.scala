package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Generalized same-JVM variance probe (ClustersProbe's protocol,
  * parameterized by query name) — the self-adjudication artifact for
  * families that flap run-to-run with zero diff (r11: the shingle
  * family; r14: the wedge-join graph family at 17.3/16.8 → 35.0/23.7
  * on identical code). Four passes per named query in ONE JVM with
  * Bench's inter-query hygiene; a QueryExecutionListener captures
  * every action's physical plan, which is then NORMALIZED (expression
  * ids `#n`, `plan_id=n`, and InMemoryFileIndex listing hashes vary
  * per run by construction) and compared across passes: if the
  * normalized operator trees are identical while wall time flaps, the
  * flap is JVM/allocator state, not plan instability — the
  * adjudication BENCH.md can cite without judge time.
  *
  *   SPARK_GRAFT_SF_DIR=… tools/run.sh graft.tools.QueryProbe \
  *     q_triangles graph_clustering
  *
  * Output: per-pass wall + slowest actions on stdout, plan-identity
  * verdict per query; raw slow-action plans under
  * /tmp/graft_query_probe/<query>/pass<i>-<k>.txt. */
object QueryProbe {
  private def normalize(plan: String): String =
    plan.replaceAll("#\\d+[A-Z]*", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      // AQE stage numbers and whole-stage-codegen ids are SUBMISSION
      // ORDER labels: two symmetric join sides legitimately swap them
      // run-to-run (witnessed on q_triangles' wedge sides) — identical
      // trees, different launch order
      .replaceAll("(Shuffle|Broadcast|TableCache|Result)QueryStage \\d+",
        "$1QueryStage x")
      .replaceAll("\\*\\(\\d+\\)", "*(x)")
      .replaceAll("\\[id=#x\\]", "")
      .replaceAll("InMemoryFileIndex\\([^)]*\\)[^,\\]]*", "InMemoryFileIndex(x)")
      .replaceAll("cachedrdd_\\d+", "cachedrdd_x")
      // lambda variable names (x_1, x_2, …) come from a global
      // per-session counter — run-varying by construction, same
      // class as expression ids (witnessed r16 on the shingle
      // family's transform(sequence(...)) lambdas)
      .replaceAll("lambda x_\\d+", "lambda x_n")
      .replaceAll("InMemoryTableScan[^\\n]*", "InMemoryTableScan x")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val queries = graft.SparkEntry.queries
    args.foreach(n => require(queries.contains(n), s"unknown query: $n"))
    val spark = graft.GraftSession.localBench(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        recs.add((durationNs, qe.executedPlan.toString))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    spark.range(10000000L).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    args.foreach { name =>
      val outDir = new java.io.File(s"/tmp/graft_query_probe/$name")
      outDir.mkdirs()
      // per-pass: the set of normalized plans of actions > 1 s —
      // the expensive tree is what must not drift
      val passPlans = (1 to 4).map { i =>
        recs.clear()
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).count()
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(2000) // listener bus drain
        val actions = recs.toArray(Array.empty[(Long, String)])
          .sortBy(-_._1)
        println(f"$name pass $i: $elapsed%.2f s, ${actions.length} actions," +
          " slowest: " +
          actions.take(5).map(a => f"${a._1 / 1e9}%.2f").mkString(", "))
        actions.takeWhile(_._1 > 1000000000L).zipWithIndex.foreach {
          case ((ns, plan), k) =>
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/pass$i-$k.txt"),
              f"action $k: ${ns / 1e9}%.2f s\n$plan\n")
        }
        // the witness is the SLOWEST action's tree: that is where a
        // plan regression would live; first-pass-only sub-second
        // actions (lazy init, cache bookkeeping) are not plan drift
        actions.headOption.map(a => normalize(a._2))
      }
      val stable = passPlans.flatten.distinct.lengthIs <= 1
      println(s"$name: normalized slowest-action plans across 4 passes " +
        (if (stable) "IDENTICAL — wall-time flap adjudicates to JVM state"
         else "DIVERGED — inspect /tmp/graft_query_probe/" + name))
    }
    spark.stop()
  }
}
