package graft

import graft.functions.{ScoredId, TopKPairAggregator}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (ScalaCheck): invariants that fixed fixtures can't
  * pin down — arbitrary data, arbitrary partition splits.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, min: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private val rowGen: Gen[List[(Double, Long)]] = Gen.listOf(for {
    s <- Gen.chooseNum(-1000.0, 1000.0) // finite sims only
    id <- Gen.chooseNum(0L, 50L)        // small id space forces ties
  } yield (s, id))

  test("TopKPairAggregator: any partitioning merges to the sorted top-k") {
    val p = Prop.forAll(rowGen, Gen.chooseNum(1, 8),
      Gen.chooseNum(1, 5)) { (rows, k, nChunks) =>
      val agg = new TopKPairAggregator(k)
      val direct = rows.foldLeft(agg.zero) { case (b, (s, i)) =>
        agg.reduce(b, ScoredId(s, i))
      }
      // arbitrary split: deal rows round-robin into nChunks partials
      val chunks = rows.zipWithIndex.groupBy(_._2 % nChunks).values.toList
        .map(_.map(_._1).foldLeft(agg.zero) { case (b, (s, i)) =>
          agg.reduce(b, ScoredId(s, i))
        })
      val merged = chunks.foldLeft(agg.zero)(agg.merge)
      val ref = rows.map { case (s, i) => ScoredId(s, i) }
        .sortBy(x => (-x.sim, x.id)).take(k)
      agg.finish(direct) == ref && agg.finish(merged) == ref
    }
    check(p)
  }

  test("TopKPairAggregator: merge is insensitive to partial order") {
    val p = Prop.forAll(rowGen, Gen.chooseNum(1, 6)) { (rows, k) =>
      val agg = new TopKPairAggregator(k)
      def partial(rs: List[(Double, Long)]) =
        rs.foldLeft(agg.zero) { case (b, (s, i)) =>
          agg.reduce(b, ScoredId(s, i))
        }
      val (l, r) = rows.splitAt(rows.length / 2)
      agg.finish(agg.merge(partial(l), partial(r))) ==
        agg.finish(agg.merge(partial(r), partial(l)))
    }
    check(p)
  }

  test("native minhash_sigs is bit-equal to the HOF formulation on arbitrary input") {
    val hashGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val p = Prop.forAll(Gen.nonEmptyListOf(hashGen),
      Gen.oneOf(4, 8, 16)) { (rowsHs, n) =>
      val df = rowsHs.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
        .toDF("id", "hs")
      val native = df.select(col("id"),
          graft.functions.NativeExpressions
            .minHashSigs(spark, col("hs"), n).as("sigs"))
        .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
      val hof = df.select((col("id") +:
          graft.operators.Dedup.minhashSignatures(col("hs"), n)): _*)
        .orderBy("id").collect()
        .map(r => (0 until n).map(i => r.getLong(i + 1)))
      native.toSeq == hof.toSeq
    }
    check(p, min = 12) // each sample runs two tiny Spark jobs
  }

  test("jaccard: bounded in [0,1], 1 on self, symmetric — arbitrary hash sets") {
    val setGen = Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)).map(_.distinct)
    val p = Prop.forAll(setGen, setGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val Array(r) = df.select(
        graft.operators.Dedup.jaccard(col("a"), col("b")).as("ab"),
        graft.operators.Dedup.jaccard(col("b"), col("a")).as("ba"),
        graft.operators.Dedup.jaccard(col("a"), col("a")).as("aa"))
        .collect()
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      ab >= 0.0 && ab <= 1.0 && ab == ba && aa == 1.0
    }
    check(p, min = 12)
  }
}
