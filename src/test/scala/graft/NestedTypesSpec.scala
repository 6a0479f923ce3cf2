package graft

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, IcebergExport, IcebergImport}

/** Nested struct/map/array-of-struct columns END-TO-END: catalog
  * commits, reads, MoR deletes, SQL struct access, row-level UPDATE,
  * and the Iceberg v2 export→import roundtrip (spec §Schemas nested
  * forms, every struct field / list element / map key+value with its
  * own field id). A 100 TB documents table routinely carries struct
  * metadata columns — this is the surface that serves it. */
class NestedTypesSpec extends SparkSpec {

  test("nested columns: commit, read, MoR delete, SQL access, " +
       "row-level UPDATE, schema evolution guards") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-nest").toString
    val cat = new GraftCatalog(spark, wh)
    val df = Seq(
      (1L, ("a", 10.0), Map("k" -> 1L), Seq(("x", 2L))),
      (2L, ("b", 20.0), Map("k" -> 2L, "j" -> 3L), Seq.empty[(String, Long)]))
      .toDF("id", "meta", "attrs", "events")
    cat.createTable("ns", "n")
    cat.commitAppend("ns", "n", df)
    val back = cat.read("ns", "n")
    assert(back.select(col("meta._2")).as[Double].collect().sorted.toSeq ===
      Seq(10.0, 20.0))
    assert(back.select(col("attrs")("j")).as[Option[Long]].collect().toSet ===
      Set(None, Some(3L)))
    // MoR equality delete on the flat key leaves nested columns intact
    cat.commitDelete("ns", "n", Seq(2L).toDF("id"))
    assert(cat.read("ns", "n").select(col("meta._1")).as[String]
      .collect().toSeq === Seq("a"))
    assert(cat.countFast("ns", "n") === 1L)

    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    assert(spark.sql(s"SELECT meta._1 FROM $c.ns.n WHERE id = 1").as[String]
      .collect().toSeq === Seq("a"))
    // row-level UPDATE flows nested values through the COW writer
    spark.sql(s"UPDATE $c.ns.n SET id = id + 1 WHERE id = 1")
    assert(spark.sql(s"SELECT id, meta._2 FROM $c.ns.n").as[(Long, Double)]
      .collect().toSeq === Seq((2L, 10.0)))
    // ALTER guards still apply: nested paths refuse loudly (flat-only DDL)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.ns.n RENAME COLUMN meta._1 TO label")
    }
    assert(e.getMessage.contains("flat") || e.getMessage.contains("nested"),
      s"unexpected: ${e.getMessage}")
  }

  test("nested columns export as spec nested types (per-id struct " +
       "fields, list elements, map key/value) and round-trip through " +
       "import and the artifacts-only reader") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-nestx").toString
    val cat = new GraftCatalog(spark, wh)
    val df = Seq(
      (1L, ("a", 10.0), Map("k" -> 1L), Seq(("x", 2L))),
      (2L, ("b", 20.0), Map("j" -> 3L), Seq(("y", 4L), ("z", 5L))))
      .toDF("id", "meta", "attrs", "events")
    cat.createTable("ns", "nx")
    cat.commitAppend("ns", "nx", df)
    cat.commitAppend("ns", "nx",
      Seq((3L, ("c", 30.0), Map.empty[String, Long], Seq(("w", 6L))))
        .toDF("id", "meta", "attrs", "events"))

    val dest = java.nio.file.Files.createTempDirectory("iceberg-out-nest").toString
    val report = IcebergExport.exportTable(cat, "ns", "nx", dest)
    assert(report.snapshots === 2)

    // schema JSON: nested ids are unique and follow the top-level ids
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(report.metadataFile)))
    val schema = root.get("schemas").get(0)
    val metaF = schema.get("fields").elements()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walkIds(t: com.fasterxml.jackson.databind.JsonNode): Unit =
      if (!t.isTextual) t.get("type").asText() match {
        case "struct" => t.get("fields").elements().forEachRemaining { f =>
          ids += f.get("id").asInt(); walkIds(f.get("type")) }
        case "list" => ids += t.get("element-id").asInt(); walkIds(t.get("element"))
        case "map" =>
          ids += t.get("key-id").asInt(); walkIds(t.get("key"))
          ids += t.get("value-id").asInt(); walkIds(t.get("value"))
        case _ => ()
      }
    metaF.forEachRemaining { f => ids += f.get("id").asInt(); walkIds(f.get("type")) }
    assert(ids.distinct.size === ids.size, s"field ids must be unique: $ids")
    assert(root.get("last-column-id").asInt() === ids.max)

    // artifacts-only reader reproduces the nested values
    val backX = IcebergExport.readExported(spark, dest)
    assert(backX.select(col("meta._2")).as[Double].collect().sorted.toSeq ===
      Seq(10.0, 20.0, 30.0))
    assert(backX.select(col("attrs")("j")).as[Option[Long]].collect().toSet ===
      Set(None, Some(3L)))

    // full import roundtrip
    val cat2 = new GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-nesti").toString)
    IcebergImport.importTable(cat2, "ns", "nx", dest)
    val got = cat2.read("ns", "nx")
    assert(got.schema.fieldNames.toSeq === Seq("id", "meta", "attrs", "events"))
    assert(got.select(explode(col("events")).as("e")).select(col("e._2"))
      .as[Long].collect().sorted.toSeq === Seq(2L, 4L, 5L, 6L))
    assert(got.count() === 3L)
  }

  test("nested nullability only ever WIDENS: a nullable batch after a " +
       "non-nullable typed first commit records the union and reads " +
       "its nulls back") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val wh = java.nio.file.Files.createTempDirectory("graft-nestnull").toString
    val cat = new GraftCatalog(spark, wh)
    cat.createTable("ns", "nn")
    // typed encoders mark tuple struct inner fields NON-nullable
    cat.commitAppend("ns", "nn", Seq((1L, ("a", 1.0))).toDF("id", "meta"))
    val rec0 = cat.tableSchema("ns", "nn").get("meta").dataType
      .asInstanceOf[StructType]
    assert(!rec0.fields.forall(_.nullable)) // at least one non-nullable inner
    // a source whose inner field is nullable AND holds a null
    val nullableMeta = StructType(Seq(StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("_1", StringType, nullable = true),
        StructField("_2", DoubleType, nullable = true))))))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(2L, org.apache.spark.sql.Row(null, 2.0)))),
      nullableMeta)
    cat.commitAppend("ns", "nn", batch)
    // recorded type widened; the null survives the read
    val rec1 = cat.tableSchema("ns", "nn").get("meta").dataType
      .asInstanceOf[StructType]
    assert(rec1.fields.forall(_.nullable),
      s"nested nullability must WIDEN to the union, got ${rec1.simpleString}")
    assert(cat.read("ns", "nn").filter(org.apache.spark.sql.functions
      .col("meta._1").isNull).count() === 1L,
      "the nullable batch's null must read back (a narrow recorded type loses it)")
    // regression: this legal history (nested nullability differing ACROSS
    // versions) must stay EXPORTABLE — unionIdAssignment compares types
    // nullability-erased; strict equality misread the widening as a type
    // change off the promotion lattice and refused the whole table
    val dest = java.nio.file.Files.createTempDirectory("graft-nestnull-exp").toString
    val rep = IcebergExport.exportTable(cat, "ns", "nn", dest)
    assert(rep.snapshots === 2)
    val back = IcebergExport.readExported(spark, dest)
    assert(back.count() === 2L)
    assert(back.filter(org.apache.spark.sql.functions
      .col("meta._1").isNull).count() === 1L)
  }
}
