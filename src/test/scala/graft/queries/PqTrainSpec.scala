package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** vs16 PQ codebook training, pinned independently of the oracle: the
  * trained books must be a Lloyd fixed-point trajectory — labels are the
  * initializing vec_ids, every vector lands in exactly one codeword per
  * subspace, and three iterations never INCREASE the total quantization
  * distortion (the monotone-descent property of Lloyd's algorithm —
  * exact here because assignment minimizes the same L2² objective the
  * truncated-mean update reduces; truncation can only leave the mean's
  * cell-sum within 1 ulp of optimal per dim, which monotonicity
  * tolerates because assignment re-chooses argmin under the ACTUAL
  * emitted centroids). */
class PqTrainSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def quantize(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * 10000.0).toLong)

  test("vs16: code labels are initializing vec_ids; member counts sum to corpus per subspace; trained distortion <= initial distortion") {
    import spark.implicits._
    val out = Catalog.byName("vs16_pq_train").fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    // collect the normed corpus the gate trained on
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1)))
      .filter { case (_, q) => q.map(x => x * x).sum > 0L }
      .toMap
    val initIds = vecs.keys.filter(_ < 64).toSeq.sorted
    val gotIds = out.map(_.getLong(1)).distinct.sorted.toSeq
    assert(gotIds == initIds, "emitted code ids must be the initializing vec_ids")
    val dim = vecs.head._2.length
    val subDims = 8
    val m = dim / subDims
    // reconstruct books: (sp, code) -> subvector
    val books = out.groupBy(r => (r.getLong(0), r.getLong(1))).map { case (k, rows) =>
      k -> rows.sortBy(_.getLong(2)).map(_.getLong(3)).toIndexedSeq
    }
    assert(books.size == m * initIds.size)
    def assignCost(bk: Map[(Long, Long), IndexedSeq[Long]]): (Map[(Long, Long), Long], BigInt) = {
      var cost = BigInt(0)
      val counts = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      vecs.values.foreach { q =>
        (0 until m).foreach { sp =>
          val sub = q.slice(sp * subDims, sp * subDims + subDims)
          val best = initIds.map { code =>
            val cw = bk((sp.toLong, code))
            val d = sub.zip(cw).map { case (a, b) => val t = a - b; t * t }.sum
            (d, code)
          }.minBy(identity) // (dist, code) — first minimum, lowest code id
          counts((sp.toLong, best._2)) += 1L
          cost += best._1
        }
      }
      (counts.toMap, cost)
    }
    val (counts, trainedCost) = assignCost(books)
    // emitted member counts match a from-scratch assignment under the books
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k, rows) =>
      assert(rows.map(_.getLong(4)).distinct.size == 1)
      assert(rows.head.getLong(4) == counts.getOrElse(k, 0L),
        s"n_members drifts for (sp, code)=$k")
    }
    (0 until m).foreach { sp =>
      val total = counts.collect { case ((s, _), n) if s == sp => n }.sum
      assert(total == vecs.size, s"subspace $sp must assign every vector once")
    }
    // Lloyd descent: the trained books never do worse than the init books
    val initBooks = initIds.flatMap { code =>
      (0 until m).map { sp =>
        (sp.toLong, code) -> vecs(code).slice(sp * subDims, sp * subDims + subDims).toIndexedSeq
      }
    }.toMap
    val (_, initCost) = assignCost(initBooks)
    assert(trainedCost <= initCost,
      s"training increased distortion: $initCost -> $trainedCost")
    info(s"PQ training distortion: $initCost -> $trainedCost " +
      f"(${(BigDecimal(initCost - trainedCost) * 100 / BigDecimal(initCost)).toDouble}%.1f%% reduction)")
  }
}
