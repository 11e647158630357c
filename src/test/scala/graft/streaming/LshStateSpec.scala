package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Ann

/** pp38's production loop: the maintained LSH serving index. Contract
  * under test: after any ingest history, [[Streams.lshSearchSnapshot]]
  * equals [[Ann.lshTopK]] over everything arrived (hashing is row-local,
  * so the advance is pure append); the index doubles as the id guard;
  * a width change is refused at the advance (rebuild's job); the forget
  * is exact; the rebuild re-hashes under the new width and equals the
  * batch kernel at that width. */
class LshStateSpec extends AnyFunSuite with SparkSpec {

  private val (bits, tables) = (4, 8)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.toList).toList

  test("maintained index == batch kernel after every advance; guard blocks redelivery; forget exact; rebuild re-hashes") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    def df(b: Seq[(Long, Seq[Float])]) = b.toDF("vec_id", "embedding")
    val queries = df(e.filter(_._1 < 10))
    val idxT = Files.createTempDirectory("lsh-idx").toString + "/index"

    def snapshot() = rows(
      Streams.lshSearchSnapshot(spark, queries, idxT, k = 5, bits, tables)
        .orderBy($"query_id", $"rank"))
    def kernel(corpus: Seq[(Long, Seq[Float])], b: Int = bits) = rows(
      Ann.lshTopK(queries, df(corpus), "vec_id", "embedding", k = 5,
          bits = b, tables = tables)
        .orderBy($"query_id", $"rank"))

    // three disjoint batches; the snapshot tracks the batch kernel
    val batches = Seq(e.take(150), e.slice(150, 350), e.drop(350))
    var arrived = Seq.empty[(Long, Seq[Float])]
    for (b <- batches) {
      Streams.maintainLshState(df(b), bits, tables, idxT)
      arrived = arrived ++ b
      assert(snapshot() == kernel(arrived),
        s"maintained index drifted from the batch kernel at ${arrived.size} rows")
    }

    // redelivery: the id guard drops an already-indexed batch wholesale
    val sig = graft.SparkSpec.dataFiles(idxT)
    Streams.maintainLshState(df(batches(1)), bits, tables, idxT)
    assert(graft.SparkSpec.dataFiles(idxT) == sig, "redelivered batch advanced the index")

    // width pin: a batch whose embedding dim disagrees is refused —
    // the plane matrix is a function of the width, so this would
    // silently bucket under a different matrix
    val widened = Seq((999999L, e.head._2 ++ Seq(0.5f))).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Streams.maintainLshState(widened, bits, tables, idxT)
    }
    assert(err.getMessage.contains("rebuild, not an advance"))

    // forget: exact — the surviving index equals a from-scratch build
    val forgot = e.map(_._1).filter(_ % 7 == 3).toSet
    Streams.forgetLshState(spark, forgot.toSeq.toDF("vec_id"), idxT)
    val survivors = e.filterNot(t => forgot(t._1))
    assert(snapshot() == kernel(survivors), "forget drifted from survivors' kernel")
    assert(spark.read.parquet(idxT)
      .filter($"neighbor_id".isin(forgot.toSeq: _*)).isEmpty,
      "forgotten rows survive in the index")
    // the guard released with the rows: re-ingest re-indexes (documented)
    Streams.maintainLshState(df(e.filter(t => forgot(t._1))), bits, tables, idxT)
    assert(snapshot() == kernel(e), "re-ingest after forget did not restore the index")

    // rebuild: the width the grown corpus calls for — re-hash + swap;
    // snapshot at the NEW width equals the batch kernel at that width
    val newBits = Ann.autoBits(e.size.toLong, targetBucket = 16L)
    assert(newBits != bits, "rebuild pin vacuous: autoBits == initial bits")
    Streams.rebuildLshState(spark, newBits, tables, idxT)
    val rebuilt = rows(
      Streams.lshSearchSnapshot(spark, queries, idxT, k = 5, newBits, tables)
        .orderBy($"query_id", $"rank"))
    assert(rebuilt == kernel(e, newBits), "rebuilt index != batch kernel at the new width")
    // and the rebuild deduplicated nothing away: one row set per member/table
    assert(spark.read.parquet(idxT).groupBy($"neighbor_id").count()
      .filter($"count" =!= tables.toLong).isEmpty,
      "rebuild lost or duplicated member rows")

    // geometry stamp (r17 ADVICE): the swap re-stamped (bits, tabs) in
    // the rows, so a post-rebuild advance or probe still carrying the OLD
    // width is refused LOUDLY — silently hashing under the stale plane
    // matrix would make appended rows unreachable (or spuriously
    // bucket-collide) with no error
    val staleAdvance = intercept[IllegalArgumentException] {
      Streams.maintainLshState(
        Seq((888888L, e.head._2)).toDF("vec_id", "embedding"),
        bits, tables, idxT)
    }
    assert(staleAdvance.getMessage.contains("geometry"),
      s"stale-width advance not refused by the stamp: $staleAdvance")
    val staleProbe = intercept[IllegalArgumentException] {
      Streams.lshSearchSnapshot(spark, queries, idxT, k = 5, bits, tables)
        .collect()
    }
    assert(staleProbe.getMessage.contains("geometry"),
      s"stale-width probe not refused by the stamp: $staleProbe")
    val staleTables = intercept[IllegalArgumentException] {
      Streams.lshSearchSnapshot(spark, queries, idxT, k = 5, newBits,
        tables + 1).collect()
    }
    assert(staleTables.getMessage.contains("geometry"),
      s"stale-tables probe not refused by the stamp: $staleTables")
    // the guards do not over-fire: the CURRENT width still advances, and
    // the maintained index keeps tracking the batch kernel at that width
    val extra = (888888L, e.head._2)
    Streams.maintainLshState(Seq(extra).toDF("vec_id", "embedding"),
      newBits, tables, idxT)
    val afterExtra = rows(
      Streams.lshSearchSnapshot(spark, queries, idxT, k = 5, newBits, tables)
        .orderBy($"query_id", $"rank"))
    assert(afterExtra == kernel(e :+ extra, newBits),
      "post-rebuild advance at the new width drifted from the batch kernel")
  }
}
