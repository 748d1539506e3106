package graft

import scala.util.Random

import graft.clean.CleaningAction._
import graft.model.QualityStats
import graft.score.Quality

/** Property-style invariants (SURVEY §5.4) over seeded random inputs —
  * deterministic run-to-run (fixed seeds), 10 trials per property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def trials[A](gen: Random => A)(check: A => Unit): Unit =
    (0 until 10).foreach { i => check(gen(new Random(1234 + i))) }

  test("T9: dedup output has no duplicates and is a subset of the input") {
    trials(r => List.fill(25)(r.nextInt(6))) { xs =>
      val df = xs.toDF("x")
      val out = DropDuplicates()(df)
      assert(out.count() == xs.distinct.size)
      assert(out.except(df).count() == 0)
    }
  }

  test("T4: clip preserves row count and keeps values within input range") {
    trials(r => List.fill(30)(r.nextDouble() * 2000 - 1000)) { xs =>
      val out = OutlierClip("x")(xs.toDF("x")).select("x").as[Double].collect()
      assert(out.length == xs.length)
      assert(out.max <= xs.max && out.min >= xs.min)
    }
  }

  test("Q1: score in [0,100]; >= 50 when cleaning only removes dirt; monotone") {
    trials(r => (r.nextLong(10000), r.nextLong(10000), r.nextLong(100), r.nextLong(100))) {
      case (nb, na, db, da) =>
        val s = Quality.score(QualityStats(nb, db), QualityStats(na, da))
        assert(s >= 0.0 && s <= 100.0)
        if (na <= nb && da <= db) assert(s >= 50.0)
        assert(Quality.score(QualityStats(nb + 2, db), QualityStats(na, da)) >= s)
    }
  }

  test("T10: date auto-parse never throws; output is yyyy-MM-dd or null") {
    val shapes: Seq[Random => String] = Seq(
      r => Random.javaRandomToRandom(new java.util.Random(r.nextLong())).alphanumeric.take(12).mkString,
      r => f"${r.nextInt(28) + 1}%02d/03/2024",
      _ => "2024-02-30", // invalid date, valid shape
      _ => "", _ => "9999-99-99", _ => "12345678")
    trials(r => List.fill(20)(shapes(r.nextInt(shapes.size))(r))) { xs =>
      val out = DateAutoParse("d")(xs.toDF("d")).as[Option[String]].collect()
      assert(out.length == xs.length)
      assert(out.flatten.forall(_.matches("""\d{4}-\d{2}-\d{2}""")))
    }
  }

  test("minhash signatures are order-invariant over shingle sets") {
    trials(r => List.fill(12)(r.nextLong(Long.MaxValue / 2))) { hs =>
      val sig = (xs: Seq[Long]) => Seq(Tuple1(xs)).toDF("h")
        .select(graft.functions.VectorExprs.minhash_sig($"h", 8)).as[Seq[Long]].head()
      assert(sig(hs) == sig(new Random(99).shuffle(hs)))
    }
  }

  test("T1/T2 row-count contracts: remove drops exactly flagged rows, replace keeps all") {
    trials { r =>
      val base = List.fill(80)(r.nextGaussian() * 10 + 100)
      if (r.nextBoolean()) 100000.0 :: base else base
    } { xs =>
      val df = xs.toDF("x")
      val model = graft.profile.Profiler.zScoreModel(df, "x")
      val flagged = if (model.degenerate) 0L
        else df.filter(model.mask).count()
      assert(OutlierRemove("x")(df).count() == xs.length - flagged)
      assert(OutlierReplaceMedian("x")(df).count() == xs.length)
    }
  }
}
