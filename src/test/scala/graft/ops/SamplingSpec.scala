package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = (1L to 300L)
    .map(i => (i, if (i % 3 == 0) "easy" else if (i % 3 == 1) "medium" else "hard"))
    .toDF("k", "stratum").cache()

  test("stratifiedExact keeps exactly floor(n * frac) rows per stratum (ScalaCheck)") {
    val fracGen = Gen.choose(0.0, 1.0)
    val prop = Prop.forAll(fracGen, fracGen, fracGen) { (fe, fm, fh) =>
      val fr = Map("easy" -> fe, "medium" -> fm, "hard" -> fh)
      val got = Sampling.stratifiedExact(df, col("stratum"), col("k"), fr)
        .groupBy("stratum").count().as[(String, Long)].collect().toMap
      fr.forall { case (s, f) =>
        got.getOrElse(s, 0L) == math.floor(100 * f).toLong
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("bernoulli is deterministic and key-pure (same rows on re-run and repartition)") {
    val a = Sampling.bernoulli(df, col("k"), 0.3).select("k").as[Long].collect().toSet
    val b = Sampling.bernoulli(df.repartition(7), col("k"), 0.3)
      .select("k").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < 300)
  }

  test("stratifiedWithReplacement hits exact targets even above stratum size") {
    val tgt = Map("easy" -> 150L, "medium" -> 10L, "hard" -> 0L)
    val got = Sampling.stratifiedWithReplacement(df, col("stratum"), col("k"), tgt)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(got.getOrElse("easy", 0L) === 150L)   // 100 available, replacement
    assert(got.getOrElse("medium", 0L) === 10L)
    assert(got.getOrElse("hard", 0L) === 0L)
  }

  test("stratifiedExactDistributed selects the identical rows to the window form") {
    val fr = Map("easy" -> 0.37, "medium" -> 0.74, "hard" -> 0.11)
    val window = Sampling.stratifiedExact(df, col("stratum"), col("k"), fr)
      .select("k").as[Long].collect().toSet
    Seq(1, 3, 8).foreach { p =>
      val dist = Sampling.stratifiedExactDistributed(
          df.repartition(5), col("stratum"), col("k"), fr, p)
        .select("k").as[Long].collect().toSet
      assert(dist === window, s"partitions=$p")
    }
  }

  test("stratifiedExactByPlan (fractions as a relation) selects the identical rows to the map form") {
    val fr = Map("easy" -> 0.37, "medium" -> 0.74, "hard" -> 0.11)
    val plan = fr.toSeq.toDF("src", "fraction")
    val viaMap = Sampling.stratifiedExactDistributed(
        df, col("stratum"), col("k"), fr)
      .select("k").as[Long].collect().toSet
    val viaPlan = Sampling.stratifiedExactByPlan(
        df.repartition(5), col("stratum"), col("k"), plan, "src")
      .select("k").as[Long].collect().toSet
    assert(viaPlan === viaMap && viaPlan.nonEmpty)
    // a stratum absent from the plan samples at 0
    val partial = Sampling.stratifiedExactByPlan(df, col("stratum"), col("k"),
        plan.filter(col("src") =!= "medium"), "src")
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(!partial.contains("medium") && partial.contains("easy"))
  }

  test("shufflePositionDistributed equals the single-window rank exactly") {
    val input = df.filter(col("k") <= 237).select("k")
    val window = Sampling.shufflePosition(input, col("k"))
      .as[(Long, Long)].collect().toMap
    Seq(1, 3, 8).foreach { p =>
      val dist = Sampling.shufflePositionDistributed(input.repartition(5), col("k"), p)
        .as[(Long, Long)].collect().toMap
      assert(dist === window, s"partitions=$p")
    }
  }

  test("rankByDistributed: arbitrary order column == window row_number, ties by key") {
    val input = df.filter(col("k") <= 300)
      .select(col("k"), (col("k") % 7).cast("double").as("v")) // heavy ties
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("k"))
    val window = input
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("k", "pos").as[(Long, Long)].collect().toMap
    Seq(1, 4, 8).foreach { p =>
      val dist = Sampling.rankByDistributed(input.repartition(5), col("v"),
          col("k"), p)
        .select("k", "pos").as[(Long, Long)].collect().toMap
      assert(dist === window, s"partitions=$p")
    }
  }

  test("shufflePosition is a stable 1..n permutation") {
    val sampled = df.filter(col("k") <= 50)
    val pos = Sampling.shufflePosition(sampled, col("k"))
      .select("pos").as[Long].collect().sorted.toSeq
    assert(pos === (1L to 50L))
    val pos2 = Sampling.shufflePosition(sampled.repartition(5), col("k"))
      .select(col("k"), col("pos")).as[(Long, Long)].collect().toMap
    val pos1 = Sampling.shufflePosition(sampled, col("k"))
      .select(col("k"), col("pos")).as[(Long, Long)].collect().toMap
    assert(pos1 === pos2)
  }

  test("epochShufflePosition: full permutation per epoch, epochs independent, reruns stable") {
    val feed = df.filter(col("k") <= 300)
    def run(e: Long): Map[Long, Long] =
      Sampling.epochShufflePosition(feed, col("k"), e)
        .select(col("k"), col("pos")).as[(Long, Long)].collect().toMap
    val e1 = run(1)
    val e2 = run(2)
    // each epoch is a complete 1..n permutation of the same rows
    assert(e1.values.toSeq.sorted === (1L to 300L))
    assert(e2.values.toSeq.sorted === (1L to 300L))
    // epochs genuinely reshuffle (identical orders would mean the epoch
    // seed is dead) and each epoch is reproducible on recompute
    assert(e1 !== e2)
    assert(run(1) === e1)
  }
}
