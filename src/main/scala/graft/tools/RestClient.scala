package graft.tools

import java.net.HttpURLConnection
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A FOREIGN ENGINE simulator for the Iceberg REST commit protocol
  * (spec: apache/iceberg open-api/rest-catalog-open-api.yaml): writes
  * its own parquet, wraps it in its own spec-shaped Avro manifest +
  * manifest list (deliberately NOT graft's writers — the point is that
  * an independent layout commits), and drives the HTTP walk a real
  * `type=rest` client performs: GET LoadTableResult, build
  * CommitTableRequest with `assert-ref-snapshot-id`, POST. Used by the
  * IcebergRestSpec E2E and the cat_rest_commit driver row. */
object RestClient {

  private val mapper = new ObjectMapper()

  def get(port: Int, path: String): (Int, String) =
    http(port, path, "GET", None)

  def post(port: Int, path: String, body: String): (Int, String) =
    http(port, path, "POST", Some(body))

  private def http(port: Int, path: String, method: String,
                   body: Option[String]): (Int, String) = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val bytes = b.getBytes(UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      os.write(bytes); os.flush(); os.close()
    }
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (in == null) "" else {
      val t = new String(in.readAllBytes(), UTF_8); in.close(); t
    }
    (code, text)
  }

  // ---- this client's OWN avro spellings (minimal spec-legal layout;
  //      field names per spec §Manifests — a reader must tolerate the
  //      optional fields it omits) ----

  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"added_snapshot_id","type":"long","field-id":503}
    ]}""")

  private val entrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104}
      ]},"field-id":2}
    ]}""")

  private def writeAvro(p: Path, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, p.toFile)
    try records.foreach(w.append) finally w.close()
  }

  /** The full foreign-append walk against table `ns.t` served on `port`:
    * writes `df` as parquet under `workDir`, wraps it in this client's
    * own manifests (prior manifests carried forward per spec), and POSTs
    * a CommitTableRequest asserting the snapshot it read. Returns the
    * HTTP (status, body) of the commit — 200 on success, 409 when the
    * asserted snapshot is no longer current. */
  def appendViaRest(spark: SparkSession, port: Int, ns: String, t: String,
                    df: DataFrame, snapshotId: Long,
                    workDir: String): (Int, String) = {
    val ch = mapper.readTree(
      buildAppendChange(spark, port, ns, t, df, snapshotId, workDir))
    post(port, s"/v1/namespaces/$ns/tables/$t",
      s"""{"requirements":${ch.get("requirements")},""" +
        s""""updates":${ch.get("updates")}}""")
  }

  /** Spec multi-table transaction: one append per (ns, table, df,
    * snapshotId) part, staged as this client's own parquet + Avro and
    * committed ATOMICALLY via POST /v1/transactions/commit (204 = every
    * table landed; 409 = nothing did). */
  def txnCommitViaRest(spark: SparkSession, port: Int,
                       parts: Seq[(String, String, DataFrame, Long)],
                       workDir: String): (Int, String) = {
    val changes = parts.map { case (ns, t, df, sid) =>
      buildAppendChange(spark, port, ns, t, df, sid, s"$workDir/$ns.$t")
    }
    post(port, "/v1/transactions/commit",
      s"""{"table-changes":[${changes.mkString(",")}]}""")
  }

  /** One spec table-change (identifier + requirements + updates) whose
    * add-snapshot appends `df` as this client's own parquet files and
    * Avro manifest/list — shared by the single-table commit and the
    * transaction endpoint. */
  private def buildAppendChange(spark: SparkSession, port: Int,
                                ns: String, t: String,
                                df: DataFrame, snapshotId: Long,
                                workDir: String): String = {
    val (gc, gb) = get(port, s"/v1/namespaces/$ns/tables/$t")
    require(gc == 200, s"GET $ns.$t failed: $gc $gb")
    val meta = mapper.readTree(gb).get("metadata")
    val curId = Option(meta.get("current-snapshot-id"))
      .map(_.asLong(-1L)).filter(_ >= 0)
    // prior manifests carried forward (the spec's manifest list is the
    // COMPLETE set; the server diffs out what it already serves)
    val prior: Seq[(String, Int)] = curId.toSeq.flatMap { cid =>
      val snap = meta.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cid)
        .getOrElse(sys.error(s"current snapshot $cid missing from metadata"))
      graft.catalog.IcebergExport.readAvro(
        Paths.get(java.net.URI.create(snap.get("manifest-list").asText())))
        .map { m =>
          val c = graft.catalog.IcebergExport.getOpt(m, "content")
          (m.get("manifest_path").toString,
            if (c == null) 0 else c.asInstanceOf[Number].intValue())
        }
    }

    // the foreign engine's own data files
    val work = Paths.get(workDir)
    Files.createDirectories(work)
    val dataDir = work.resolve("data")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val files = {
      val s = Files.list(dataDir)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq.sortBy(_.toString)
      finally s.close()
    }
    require(files.nonEmpty, "foreign write produced no parquet files")
    import org.apache.spark.sql.functions.{count, input_file_name, lit}
    val counts: Map[String, Long] = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def countOf(p: Path): Long =
      counts.collectFirst {
        case (uri, n) if Paths.get(java.net.URI.create(uri)) == p.toAbsolutePath => n
      }.getOrElse(0L)

    // one new manifest listing the files as ADDED
    val entries = files.map { f =>
      val dataFile = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dataFile.put("content", 0)
      dataFile.put("file_path", f.toAbsolutePath.toUri.toString)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("record_count", countOf(f))
      dataFile.put("file_size_in_bytes", Files.size(f))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("data_file", dataFile)
      e
    }
    val manifestPath = work.resolve(s"m-$snapshotId.avro")
    writeAvro(manifestPath, entrySchema, entries)

    val listRecords = (prior :+
      (manifestPath.toAbsolutePath.toUri.toString, 0)).map { case (p, c) =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", p)
      r.put("manifest_length",
        if (p == manifestPath.toAbsolutePath.toUri.toString)
          Files.size(manifestPath) else 0L)
      r.put("partition_spec_id", 0)
      r.put("content", c)
      r.put("added_snapshot_id", snapshotId)
      r
    }
    val listPath = work.resolve(s"snap-$snapshotId.avro")
    writeAvro(listPath, listSchema, listRecords)

    val assertId = curId.map(_.toString).getOrElse("null")
    s"""{"identifier":{"namespace":["$ns"],"name":"$t"},
       |"requirements":[
       |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$assertId}
       |],"updates":[
       |  {"action":"add-snapshot","snapshot":{
       |    "snapshot-id":$snapshotId,
       |    "manifest-list":"${listPath.toAbsolutePath.toUri}",
       |    "summary":{"operation":"append"}}},
       |  {"action":"set-snapshot-ref","ref-name":"main",
       |   "snapshot-id":$snapshotId,"type":"branch"}
       |]}""".stripMargin
  }

  /** The foreign MoR-commit walk: one snapshot carrying optional new
    * DATA rows plus optional EQUALITY-delete keys and/or POSITION
    * deletes — the write-back a foreign engine performs after reading a
    * graft-served table (upsert = data + equality deletes of the same
    * keys; pure delete = deletes only). `posDeletes` carries
    * (file_path, pos) where file_path is the SERVED data-file URI the
    * client read from the export tree — the server remaps. Each kind is
    * written as this client's own parquet + spec-shaped Avro: the
    * delete manifest carries manifest-list content=1 and data_file
    * content 2 (equality) / 1 (position), ordered before the data
    * manifest. */
  def morCommitViaRest(spark: SparkSession, port: Int, ns: String, t: String,
                       data: Option[DataFrame], eqDeleteKeys: Option[DataFrame],
                       posDeletes: Option[DataFrame], snapshotId: Long,
                       workDir: String): (Int, String) = {
    val ch = mapper.readTree(buildMorChange(spark, port, ns, t, data,
      eqDeleteKeys, posDeletes, snapshotId, workDir))
    post(port, s"/v1/namespaces/$ns/tables/$t",
      s"""{"requirements":${ch.get("requirements")},""" +
        s""""updates":${ch.get("updates")}}""")
  }

  /** One spec table-change whose add-snapshot carries a MoR delta (data
    * and/or equality/position deletes) — shared by the single-table MoR
    * commit and the transaction endpoint. */
  def buildMorChange(spark: SparkSession, port: Int, ns: String, t: String,
                     data: Option[DataFrame], eqDeleteKeys: Option[DataFrame],
                     posDeletes: Option[DataFrame], snapshotId: Long,
                     workDir: String): String = {
    val (gc, gb) = get(port, s"/v1/namespaces/$ns/tables/$t")
    require(gc == 200, s"GET $ns.$t failed: $gc $gb")
    val meta = mapper.readTree(gb).get("metadata")
    val curId = Option(meta.get("current-snapshot-id"))
      .map(_.asLong(-1L)).filter(_ >= 0)
    val prior: Seq[(String, Int)] = curId.toSeq.flatMap { cid =>
      val snap = meta.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cid)
        .getOrElse(sys.error(s"current snapshot $cid missing from metadata"))
      graft.catalog.IcebergExport.readAvro(
        Paths.get(java.net.URI.create(snap.get("manifest-list").asText())))
        .map { m =>
          val c = graft.catalog.IcebergExport.getOpt(m, "content")
          (m.get("manifest_path").toString,
            if (c == null) 0 else c.asInstanceOf[Number].intValue())
        }
    }
    val work = Paths.get(workDir)
    Files.createDirectories(work)
    def writeParquet(df: DataFrame, sub: String): Seq[(Path, Long)] = {
      val dir = work.resolve(sub)
      df.write.mode("overwrite").parquet(dir.toString)
      val s = Files.list(dir)
      val files = try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq.sortBy(_.toString)
      finally s.close()
      require(files.nonEmpty, s"foreign $sub write produced no parquet")
      files.map(f => f -> -1L) // record_count unused by the server
    }
    def entryOf(f: Path, content: Int): GenericRecord = {
      val dataFile = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dataFile.put("content", content)
      dataFile.put("file_path", f.toAbsolutePath.toUri.toString)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("record_count", 0L)
      dataFile.put("file_size_in_bytes", Files.size(f))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("data_file", dataFile)
      e
    }
    // delete manifest: equality (content 2) + position (content 1)
    val delEntries =
      eqDeleteKeys.toSeq.flatMap(writeParquet(_, "eqdel"))
        .map { case (f, _) => entryOf(f, 2) } ++
      posDeletes.toSeq.flatMap(writeParquet(_, "posdel"))
        .map { case (f, _) => entryOf(f, 1) }
    val dataEntries = data.toSeq.flatMap(writeParquet(_, "data"))
      .map { case (f, _) => entryOf(f, 0) }
    var manifests = Seq.empty[(Path, Int)] // (path, manifest-list content)
    if (delEntries.nonEmpty) {
      val p = work.resolve(s"del-$snapshotId.avro")
      writeAvro(p, entrySchema, delEntries)
      manifests :+= ((p, 1))
    }
    if (dataEntries.nonEmpty) {
      val p = work.resolve(s"m-$snapshotId.avro")
      writeAvro(p, entrySchema, dataEntries)
      manifests :+= ((p, 0))
    }
    val listRecords = (prior ++ manifests.map { case (p, c) =>
      (p.toAbsolutePath.toUri.toString, c)
    }).map { case (p, c) =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", p)
      r.put("manifest_length",
        manifests.collectFirst {
          case (mp, _) if mp.toAbsolutePath.toUri.toString == p =>
            Files.size(mp)
        }.getOrElse(0L))
      r.put("partition_spec_id", 0)
      r.put("content", c)
      r.put("added_snapshot_id", snapshotId)
      r
    }
    val listPath = work.resolve(s"snap-$snapshotId.avro")
    writeAvro(listPath, listSchema, listRecords)
    val assertId = curId.map(_.toString).getOrElse("null")
    s"""{"identifier":{"namespace":["$ns"],"name":"$t"},
       |"requirements":[
       |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$assertId}
       |],"updates":[
       |  {"action":"add-snapshot","snapshot":{
       |    "snapshot-id":$snapshotId,
       |    "manifest-list":"${listPath.toAbsolutePath.toUri}",
       |    "summary":{"operation":"overwrite"}}},
       |  {"action":"set-snapshot-ref","ref-name":"main",
       |   "snapshot-id":$snapshotId,"type":"branch"}
       |]}""".stripMargin
  }

  /** One spec table-change carrying property updates only (staged on
    * the transaction branch, adopted at publish). */
  def buildPropsChange(port: Int, ns: String, t: String,
                       set: Map[String, String],
                       unset: Seq[String] = Seq.empty): String = {
    val (gc, gb) = get(port, s"/v1/namespaces/$ns/tables/$t")
    require(gc == 200, s"GET $ns.$t failed: $gc $gb")
    val meta = mapper.readTree(gb).get("metadata")
    val assertId = Option(meta.get("current-snapshot-id"))
      .map(_.asLong(-1L)).filter(_ >= 0).map(_.toString).getOrElse("null")
    def q(s: String) = mapper.writeValueAsString(s)
    val setJson =
      if (set.isEmpty) ""
      else s"""{"action":"set-properties","updates":{${
        set.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(",")}}}"""
    val unsetJson =
      if (unset.isEmpty) ""
      else s"""{"action":"remove-properties","removals":[${
        unset.map(q).mkString(",")}]}"""
    val updates = Seq(setJson, unsetJson).filter(_.nonEmpty).mkString(",")
    s"""{"identifier":{"namespace":["$ns"],"name":"$t"},
       |"requirements":[
       |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$assertId}
       |],"updates":[$updates]}""".stripMargin
  }

  /** Spec multi-table transaction over PRE-BUILT table-changes (mix
    * append / MoR / property parts freely): POST /v1/transactions/commit
    * with the changes verbatim. */
  def txnCommitChangesViaRest(port: Int, changes: Seq[String]): (Int, String) =
    post(port, "/v1/transactions/commit",
      s"""{"table-changes":[${changes.mkString(",")}]}""")

  /** Transactionally-consistent multi-table READ (graft extension):
    * POST /v1/transactions/consistent-cut — returns per-table pinned
    * metadata locations that never split a multi-table transaction. */
  def consistentCutViaRest(port: Int,
                           tables: Seq[(String, String)]): (Int, String) =
    post(port, "/v1/transactions/consistent-cut",
      s"""{"tables":[${tables.map { case (ns, t) =>
        s"""{"namespace":["$ns"],"name":"$t"}""" }.mkString(",")}]}""")

  /** CreateTableRequest for a flat schema: `fields` = (name, icebergType)
    * in order; optional partition-spec transforms as (fieldName,
    * transform) with the spec's bucket[n]/truncate[w] spellings. */
  def createViaRest(port: Int, ns: String, t: String,
                    fields: Seq[(String, String)],
                    spec: Seq[(String, String)] = Seq.empty,
                    properties: Map[String, String] = Map.empty): (Int, String) = {
    val fieldJson = fields.zipWithIndex.map { case ((n, ty), i) =>
      s"""{"id":${i + 1},"name":"$n","required":false,"type":"$ty"}"""
    }.mkString(",")
    val idOf = fields.zipWithIndex.map { case ((n, _), i) => n -> (i + 1) }.toMap
    val specJson =
      if (spec.isEmpty) ""
      else spec.zipWithIndex.map { case ((src, tr), i) =>
        s"""{"name":"${src}_$i","transform":"$tr","source-id":${idOf(src)},
           |"field-id":${1000 + i}}""".stripMargin.replace("\n", "")
      }.mkString(""","partition-spec":{"spec-id":0,"fields":[""", ",", "]}")
    val propsJson =
      if (properties.isEmpty) ""
      else properties.map { case (k, v) => s""""$k":"$v"""" }
        .mkString(""","properties":{""", ",", "}")
    val body =
      s"""{"name":"$t","schema":{"schema-id":0,"type":"struct",
         |"fields":[$fieldJson]}$specJson$propsJson}"""
        .stripMargin.replace("\n", "")
    post(port, s"/v1/namespaces/$ns/tables", body)
  }

  /** Spec schema evolution: one add-schema (the full replacement
    * schema, flat fields as (name, icebergType, required)) +
    * set-current-schema(-1, "last added"). */
  def evolveSchemaViaRest(port: Int, ns: String, t: String,
                          fields: Seq[(String, String, Boolean)]): (Int, String) = {
    val fieldJson = fields.zipWithIndex.map { case ((n, ty, req), i) =>
      s"""{"id":${i + 1},"name":"$n","required":$req,"type":"$ty"}"""
    }.mkString(",")
    val body =
      s"""{"requirements":[],"updates":[
         |  {"action":"add-schema","schema":{"schema-id":1,"type":"struct",
         |   "fields":[$fieldJson]}},
         |  {"action":"set-current-schema","schema-id":-1}
         |]}""".stripMargin
    post(port, s"/v1/namespaces/$ns/tables/$t", body)
  }

  /** Spec partition evolution: one add-spec (the full replacement spec
    * as (sourceFieldName, transform) with the spec's bucket[n]/
    * truncate[w] spellings) + set-default-spec(-1, "last added").
    * Source-ids resolve from the served metadata's CURRENT schema —
    * the walk a real client performs. `assertDefaultSpecId` adds the
    * spec's optimistic-concurrency requirement. */
  def evolveSpecViaRest(port: Int, ns: String, t: String,
                        spec: Seq[(String, String)],
                        assertDefaultSpecId: Option[Int] = None): (Int, String) = {
    val (gc, gb) = get(port, s"/v1/namespaces/$ns/tables/$t")
    require(gc == 200, s"GET $ns.$t failed: $gc $gb")
    val meta = mapper.readTree(gb).get("metadata")
    val cur = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
    val idOf: Map[String, Int] = Option(meta.get("schemas")).toSeq
      .flatMap(_.elements().asScala)
      .find(s => Option(s.get("schema-id")).exists(_.asInt() == cur))
      .toSeq.flatMap(_.get("fields").elements().asScala)
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    val fieldsJson = spec.zipWithIndex.map { case ((src, tr), i) =>
      val sid = idOf.getOrElse(src, sys.error(s"no column '$src' in the " +
        s"served schema of $ns.$t (have ${idOf.keys.mkString(", ")})"))
      s"""{"name":"${src}_$i","transform":"$tr","source-id":$sid,
         |"field-id":${1000 + i}}""".stripMargin.replace("\n", "")
    }.mkString(",")
    val reqs = assertDefaultSpecId.map(id =>
      s"""{"type":"assert-default-spec-id","default-spec-id":$id}""")
      .toSeq.mkString(",")
    val body =
      s"""{"requirements":[$reqs],"updates":[
         |  {"action":"add-spec","spec":{"spec-id":-1,"fields":[$fieldsJson]}},
         |  {"action":"set-default-spec","spec-id":-1}
         |]}""".stripMargin
    post(port, s"/v1/namespaces/$ns/tables/$t", body)
  }

  /** Node access for callers asserting on responses. */
  def json(body: String): JsonNode = mapper.readTree(body)
}
