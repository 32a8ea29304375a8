package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Vectors

class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private lazy val brute = topk(Vectors.knnBrute.run(spark, sf))

  private def recall(approx: Map[Long, Set[Long]]): Double = {
    val hits = brute.map { case (q, nb) =>
      approx.getOrElse(q, Set.empty).intersect(nb).size.toDouble / nb.size
    }
    hits.sum / hits.size
  }

  test("brute kNN returns exactly k=5 ranked neighbors per query") {
    val rows = Vectors.knnBrute.run(spark, sf).collect()
    assert(rows.length == 50 * 5)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to 5))
      // scores non-increasing with rank
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF recall@5 vs brute force") {
    val r = recall(topk(Vectors.knnIvf.run(spark, sf)))
    assert(r >= 0.55, s"IVF recall $r") // near-random vectors: no cluster structure
  }

  test("hyperplane LSH recall@5 vs brute force") {
    val r = recall(topk(Vectors.annLsh.run(spark, sf)))
    assert(r >= 0.30, s"LSH recall $r")
  }

  test("embedding near-dup matches a brute-force recompute") {
    val pairs = Vectors.embeddingNearDup.run(spark, sf).collect()
    pairs.foreach(r => assert(r.getAs[Double]("cos_sim") >= 0.5))
  }
}
