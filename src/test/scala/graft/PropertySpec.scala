package graft

import graft.operators.{PathLocalizer, SnapshotDiff}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests for invariants the reference states but never
  * tests (SURVEY §5.2): localization prefix guarantee, pagination
  * completeness, snapshot-diff partition laws. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache): run `f` over `n` seeded samples. */
  private def samples[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val regionsGen = Gen.oneOf("us-east-1", "eu-west-1", "ap-northeast-1")
  private val pathGen: Gen[String] = for {
    r <- regionsGen
    sub <- Gen.oneOf("data", "meta")
    n <- Gen.choose(0, 9999)
  } yield s"s3://src-$r/$sub/$n.parquet"

  private val mappings = Seq(
    "s3://src-us-east-1/" -> "file:///local/use1/",
    "s3://src-us-east-1/data/" -> "file:///ssd/use1/data/",
    "s3://src-eu-west-1/" -> "file:///local/euw1/")

  test("localization invariant: every output starts with its mapped local prefix (doc :448-449)") {
    samples(Gen.listOfN(50, pathGen)) { paths =>
      if (paths.nonEmpty) {
        val out = paths.toDF("p")
          .select(col("p"), PathLocalizer.localize(col("p"), mappings).as("out"))
          .as[(String, String)].collect()
        out.foreach { case (in, res) =>
          if (res == null) {
            // only unmapped sources may fall through
            assert(!mappings.exists { case (src, _) => in.startsWith(src) })
          } else {
            assert(mappings.exists { case (src, dst) =>
              in.startsWith(src) && res == dst + in.drop(src.length) })
            // longest-prefix: no longer mapping prefix was applicable but unused
            val best = mappings.filter(m => in.startsWith(m._1)).maxBy(_._1.length)
            assert(res.startsWith(best._2))
          }
        }
      }
    }
  }

  test("pagination completeness: concatenated pages equal the full sorted result") {
    samples(Gen.zip(Gen.choose(1, 20), Gen.listOfN(60, Gen.choose(0, 300))), 6) { case (pageSize, xs) =>
      if (xs.nonEmpty) {
        val df = xs.toDF("x").distinct()
        val full = df.orderBy(col("x")).as[Int].collect().toSeq
        val paged = Iterator.from(0)
          .map(i => df.orderBy(col("x")).offset(i * pageSize).limit(pageSize)
            .as[Int].collect().toSeq)
          .takeWhile(_.nonEmpty).flatten.toSeq
        assert(paged === full)
      }
    }
  }

  test("token pagination completeness: chained continuation tokens reproduce the full sorted result") {
    import graft.operators.Pagination
    samples(Gen.zip(Gen.choose(1, 20), Gen.listOfN(60, Gen.choose(0, 300))), 6) { case (pageSize, xs) =>
      if (xs.nonEmpty) {
        val df = xs.map(x => f"k$x%04d").toDF("k").distinct()
        val full = df.orderBy(col("k")).as[String].collect().toSeq
        val paged = Pagination.allPages(df, "k", pageSize)
          .flatMap(_.as[String].collect()).toSeq
        assert(paged === full)
      }
    }
  }

  test("snapshot diff laws: added ∪ kept = newer; removed ∩ newer = ∅") {
    samples(Gen.zip(Gen.listOf(Gen.choose(0, 80)), Gen.listOf(Gen.choose(0, 80))), 8) { case (olds, news) =>
      val o = olds.distinct.toDF("path")
      val n = news.distinct.toDF("path")
      val added = SnapshotDiff.addedFiles(o, n, Seq("path")).as[Int].collect().toSet
      val removed = SnapshotDiff.removedFiles(o, n, Seq("path")).as[Int].collect().toSet
      assert(added === (news.toSet -- olds.toSet))
      assert(removed === (olds.toSet -- news.toSet))
      assert(added.intersect(olds.toSet).isEmpty)
      assert(removed.intersect(news.toSet).isEmpty)
    }
  }

  test("sorted-long-hash jaccard equals string-set jaccard on random token sets") {
    import graft.functions.VectorFunctions
    val wordGen = Gen.listOfN(40, Gen.oneOf(
      (0 until 25).map(i => s"w$i")))  // small vocab -> real overlaps + duplicates
    samples(Gen.zip(wordGen, wordGen), n = 20) { case (wa, wb) =>
      val df = Seq((wa, wb)).toDF("a", "b")
        .select(
          VectorFunctions.jaccardSim(col("a"), col("b")).as("s"),
          VectorFunctions.sortedLongJaccard(
            sort_array(array_distinct(transform(col("a"), xxhash64(_)))),
            sort_array(array_distinct(transform(col("b"), xxhash64(_))))).as("h"))
      val (s, h) = df.as[(Double, Double)].collect().head
      assert(s === h, s"string=$s hashed=$h for $wa vs $wb")
    }
  }
}
