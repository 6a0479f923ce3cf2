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

  private val tokenGen = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  test("quantileGate law: every kept score >= every dropped score within its group") {
    samples(Gen.listOfN(40, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 100)))) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, s"g$g", v.toDouble) }
        .toDF("doc_id", "grp", "score")
      val kept = graft.pipeline.Retrieval.quantileGate(df, "doc_id", "score", "grp", 0.75)
        .select("doc_id").as[Long].collect().toSet
      val all = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      all.groupBy(_._2).foreach { case (_, members) =>
        val (in, out) = members.partition(m => kept(m._1))
        if (in.nonEmpty && out.nonEmpty)
          assert(in.map(_._3).min >= out.map(_._3).max)
      }
    }
  }

  test("pageRank law: mass conserved and strictly positive on random undirected graphs") {
    samples(Gen.listOfN(10, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L))), n = 6) { es =>
      val pairs = es.filter(e => e._1 < e._2).distinct
      val nodes = (0L to 7L).toDF("id")
      val pr = graft.pipeline.GraphOps.pageRank(
          graft.pipeline.GraphOps.symmetrize(
            pairs.toDF("id_a", "id_b"), "id_a", "id_b"),
          nodes, iters = 3)
        .as[(Long, Double)].collect()
      assert(pr.length === 8)
      assert(pr.forall(_._2 > 0.0))
      assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-6)
    }
  }

  test("vocabEncode law: ids cover every token in order, bounded by V, OOV count consistent") {
    samples(Gen.listOfN(6, docGen), n = 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val v = 4
      val out = graft.pipeline.Curation.vocabEncode(df, "doc_id", "text", v)
        .as[(Long, Long, Long, Array[Int])].collect()
      out.foreach { case (id, nTok, nOov, ids) =>
        assert(ids.length === nTok)
        assert(ids.length === texts(id.toInt).split(" ").length)
        assert(ids.forall(x => x >= 0 && x <= v))
        assert(ids.count(_ == 0) === nOov)
      }
    }
  }

  test("noveltyAgainst law: empty admitted corpus makes every gram-bearing doc fully novel") {
    samples(Gen.listOfN(5, docGen), n = 8) { texts =>
      val batch = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      graft.pipeline.Curation.noveltyAgainst(empty, batch, "doc_id", "text", n = 2)
        .as[(Long, Long, Double)].collect().foreach { case (_, nGrams, frac) =>
          assert(if (nGrams == 0) frac === 0.0 else frac === 1.0)
        }
    }
  }

  test("SymSpell completeness law: blocked ed<=1 join equals brute force on random short strings") {
    import graft.pipeline.Dedup
    // small alphabet + short lengths maximize accidental near-collisions
    val strGen = Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val setGen = Gen.listOfN(14, strGen)
    samples(setGen, n = 10) { strs =>
      val df = strs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "s")
      val got = Dedup.editDistance1Pairs(df, "id", "s")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val brute = (for {
        (a, i) <- strs.zipWithIndex; (b, j) <- strs.zipWithIndex
        if i < j && levenshteinRef(a, b) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got === brute, s"strings=$strs")
    }
  }

  test("denseRankBy law: equals in-memory dense rank on random keys, any partitioning") {
    import graft.operators.DistributedRank
    val keyGen = Gen.listOfN(60, Gen.choose(0, 15))
    samples(Gen.zip(keyGen, Gen.choose(1, 7)), n = 10) { case (keys, parts) =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "k").repartition(parts)
      val got = DistributedRank.denseRankBy(df, Seq(col("k")), "r", partitions = 5)
        .select("id", "r").as[(Long, Long)].collect().toMap
      val rankOf = keys.distinct.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
      keys.zipWithIndex.foreach { case (k, i) =>
        assert(got(i.toLong) === rankOf(k), s"keys=$keys parts=$parts id=$i")
      }
    }
  }

  test("Iceberg schema mapping is a round trip over random flat schemas " +
       "(spark -> iceberg JSON -> spark is the identity)") {
    import org.apache.spark.sql.types._
    val primGen: Gen[DataType] = Gen.oneOf(
      BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType,
      BinaryType, DateType, TimestampType, TimestampNTZType,
      DecimalType(18, 2), DecimalType(9, 4))
    val fieldGen: Gen[StructField] = for {
      name <- Gen.identifier.map(_.take(12))
      nullable <- Gen.oneOf(true, false)
      arr <- Gen.oneOf(true, false, false)
      elemNull <- Gen.oneOf(true, false)
      dt <- primGen
    } yield StructField(name,
      if (arr) ArrayType(dt, containsNull = elemNull) else dt, nullable)
    val schemaGen: Gen[StructType] = for {
      n <- Gen.choose(1, 8)
      fs <- Gen.listOfN(n, fieldGen)
    } yield StructType(fs.zipWithIndex.map { case (f, i) => f.copy(name = s"c${i}_${f.name}") })
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(schemaGen, 20) { st =>
      // IntegerType widens through Iceberg "int" back to IntegerType;
      // Byte/Short would widen to Int (documented), so the generator
      // sticks to representable types and the trip must be EXACT
      val (json, lastId) = graft.catalog.IcebergExport.icebergSchemaJson(st)
      val node = mapper.readTree(json)
      val back = graft.catalog.IcebergExport.sparkSchema(node)
      assert(back === st, s"round trip diverged for $st\njson=$json")
      // ids must be unique and lastColumnId must cover them all
      val ids = node.get("fields").elements().asScala.flatMap { f =>
        val own = Seq(f.get("id").asInt())
        if (f.get("type").isTextual) own
        else own :+ f.get("type").get("element-id").asInt()
      }.toSeq
      assert(ids.distinct.size === ids.size, s"duplicate field ids in $json")
      assert(ids.max === lastId)
    }
  }

  /** Textbook DP Levenshtein — the reference the blocked join is tested
    * against (independent of both Spark's and the operator's code). */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("column-mapping equivalence law: a random op sequence with " +
       "interleaved RENAMEs lands on the same data as its rename-free " +
       "twin (values identical under a fixed final naming)") {
    import graft.catalog.GraftCatalog
    // op alphabet: append a batch / rename the value column / MoR-delete
    // some keys / compact. The renamed table cycles the value column
    // through fresh names; the twin never renames. After each sequence
    // both tables must hold identical (k, value) sets, and the renamed
    // table's stats pruning must still answer point lookups exactly.
    val opGen = Gen.listOfN(8, Gen.oneOf("append", "rename", "delete", "compact"))
    var case_ = 0
    samples(opGen, n = 6) { ops =>
      case_ += 1
      val wh = java.nio.file.Files.createTempDirectory(s"graft-maplaw$case_").toString
      val cat = new GraftCatalog(spark, wh)
      val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
      spark.sql(s"CREATE TABLE $c.law.renamed (k BIGINT, v0 BIGINT)")
      spark.sql(s"CREATE TABLE $c.law.plain (k BIGINT, v0 BIGINT)")
      var gen = 0      // current value-column name index on the renamed table
      var nextKey = 0L
      ops.foreach {
        case "append" =>
          val batch = (nextKey until nextKey + 20L).map(k => (k, k * 7L))
          nextKey += 20L
          cat.commitAppend("law", "renamed",
            batch.toDF("k", s"v$gen"))
          cat.commitAppend("law", "plain", batch.toDF("k", "v0"))
        case "rename" =>
          spark.sql(s"ALTER TABLE $c.law.renamed RENAME COLUMN v$gen TO v${gen + 1}")
          gen += 1
        case "delete" if nextKey > 0 =>
          val keys = (0L until nextKey by 7L).toDF("k")
          cat.commitDelete("law", "renamed", keys)
          cat.commitDelete("law", "plain", keys)
        case "compact" if nextKey > 0 =>
          cat.compact("law", "renamed", 128L * 1024 * 1024)
          cat.compact("law", "plain", 128L * 1024 * 1024)
        case _ => () // delete/compact before any data: no-op
      }
      val a = cat.read("law", "renamed")
        .select(col("k"), col(s"v$gen").as("v")).as[(Long, Long)].collect().toSet
      val b = cat.read("law", "plain")
        .select(col("k"), col("v0").as("v")).as[(Long, Long)].collect().toSet
      assert(a === b, s"ops=$ops: renamed table diverged from its twin")
      // stats-pruned point lookup through the final logical name is exact
      if (nextKey > 0) {
        val probe = nextKey - 1
        assert(cat.readWhere("law", "renamed", s"v$gen",
            Some((probe * 7).toString), Some((probe * 7).toString))
          .select("k").as[Long].collect().toSet ===
          b.filter(_._2 == probe * 7).map(_._1),
          s"ops=$ops: pruned lookup diverged")
      }
    }
  }
}
