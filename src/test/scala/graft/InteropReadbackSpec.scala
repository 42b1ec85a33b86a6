package graft

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** The strongest in-sandbox substitute for a foreign-engine reader:
  * graft WRITES a partitioned v2 table with appends + position and
  * equality deletes, and this spec re-reads it through a SECOND,
  * INDEPENDENT decoder path assembled from nothing but the raw formats —
  * json4s over the metadata JSON, plain `GenericDatumReader` over the
  * manifest-list/manifest Avro (no ManifestIO), `spark.read.parquet`
  * over data/delete files (no GraftTable/GraftMorScan) — and asserts
  * byte-identical row sets. Any spec-conformance drift in what graft
  * writes (field names, sequence inheritance, status liveness, delete
  * applicability rules) breaks THIS decoder even while graft's own
  * reader, sharing the writer's assumptions, would still round-trip. */
class InteropReadbackSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-test/interop/$name-${System.nanoTime()}"

  // ---- the independent decoder ----

  private def avroRecords(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(path), conf), new GenericDatumReader[GenericRecord]())
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.result()
    } finally reader.close()
  }

  private def str(r: GenericRecord, field: String): String =
    String.valueOf(r.get(field))
  private def lng(r: GenericRecord, field: String): Option[Long] =
    Option(r.get(field)).map(_.asInstanceOf[Long])

  /** one live file: (path, format, content, dataSeq, equalityIds) */
  private case class LiveFile(
      path: String, format: String, content: Int, seq: Long, eqIds: Seq[Int])

  /** walk metadata JSON -> manifest list -> manifests, applying v2
    * sequence-number inheritance and status liveness, with NO graft
    * metadata code */
  private def decodeLiveFiles(tableLoc: String): Seq[LiveFile] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // version-hint points at the current metadata file
    val fs = new Path(tableLoc).getFileSystem(conf)
    val hint = {
      val in = fs.open(new Path(s"$tableLoc/metadata/version-hint.text"))
      try new String(in.readAllBytes()).trim finally in.close()
    }
    val metaPath = s"$tableLoc/metadata/v$hint.metadata.json"
    val metaJson = {
      val in = fs.open(new Path(metaPath))
      try JsonMethods.parse(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
    val JInt(currentId) = (metaJson \ "current-snapshot-id"): @unchecked
    val snapshots = (metaJson \ "snapshots").asInstanceOf[JArray].arr
    val current = snapshots.find(s =>
      (s \ "snapshot-id") == JInt(currentId)).get
    val JString(manifestList) = (current \ "manifest-list"): @unchecked

    avroRecords(manifestList).flatMap { m =>
      val manifestPath = str(m, "manifest_path")
      val manifestSeq = lng(m, "sequence_number").getOrElse(0L)
      avroRecords(manifestPath).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None // deleted entry
        else {
          // v2 inheritance: an ADDED (status 1) entry with a null
          // sequence number inherits the manifest's
          val seq = lng(e, "sequence_number")
            .getOrElse { require(status == 1, s"existing entry without seq in $manifestPath"); manifestSeq }
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val eqIds = Option(df.get("equality_ids"))
            .map(_.asInstanceOf[java.util.List[Any]].asScala.toSeq.map(_.toString.toInt))
            .getOrElse(Nil)
          Some(LiveFile(
            str(df, "file_path"),
            str(df, "file_format").toLowerCase,
            df.get("content").asInstanceOf[Int],
            seq, eqIds))
        }
      }
    }
  }

  /** full MoR read with NO graft scan code: data rows (with per-file
    * positions via single-file ordered reads), position deletes by
    * (path, pos, seq >= dataSeq), equality deletes by (key, seq > dataSeq) */
  private def independentRead(tableLoc: String): org.apache.spark.sql.DataFrame = {
    val files = decodeLiveFiles(tableLoc)
    val data = files.filter(_.content == 0)
    val posDel = files.filter(_.content == 1)
    val eqDel = files.filter(_.content == 2)
    require(data.forall(_.format == "parquet"))

    // (file, pos) -> delete seq, collected from the position-delete files
    val posDeletes: Map[(String, Long), Long] = posDel.flatMap { f =>
      spark.read.parquet(f.path).select("file_path", "pos").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> f.seq)
    }.groupMapReduce(_._1)(_._2)(math.max)

    // equality keys -> max delete seq, per key column set
    val eqByIds: Map[Seq[Int], Map[Seq[Any], Long]] = eqDel.groupBy(_.eqIds).map {
      case (ids, fs) =>
        ids -> fs.flatMap { f =>
          val rows = spark.read.parquet(f.path).collect()
          rows.map(r => r.toSeq -> f.seq)
        }.groupMapReduce(_._1)(_._2)(math.max)
    }

    // field-id -> current name for eq-delete key resolution (the delete
    // files store key columns under their own names; here schemas match)
    val dfs = data.map { f =>
      val raw = spark.read.parquet(f.path)
      val cols = raw.columns
      // one small file => one input partition => parquet row order
      val withPos = spark.createDataFrame(
        raw.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
        raw.schema.add("_ipos", "long"))
      val eqKeep = eqByIds.foldLeft(withPos) { case (d, (ids, keys)) =>
        // key columns by position in the delete file's schema: resolve by
        // the data schema's matching names (ids are schema field ids;
        // this table's fields are (1=k, 2=bucket, 3=v) in declared order)
        val keyNames = ids.map {
          case 1 => "k"
          case 2 => "part"
          case 3 => "v"
          case other => sys.error(s"unexpected field id $other")
        }
        val broadcastKeys = keys.filter { case (_, dseq) => dseq > f.seq }
        if (broadcastKeys.isEmpty) d
        else {
          val keySet = broadcastKeys.keySet
          val keyStruct = struct(keyNames.map(col): _*)
          val matches = udf((r: org.apache.spark.sql.Row) => keySet.contains(r.toSeq))
          d.filter(!matches(keyStruct))
        }
      }
      val deadPos = posDeletes.collect {
        case ((p, pos), dseq) if dseq >= f.seq &&
          p.stripPrefix("file:") == f.path.stripPrefix("file:") => pos
      }.toSet
      val posKeep =
        if (deadPos.isEmpty) eqKeep
        else {
          val dead = deadPos
          val drop = udf((p: Long) => dead.contains(p))
          eqKeep.filter(!drop(col("_ipos")))
        }
      posKeep.select(cols.map(col): _*)
    }
    dfs.reduce(_ unionByName _)
  }

  test("independent raw-format decoder reproduces graft's MoR read exactly") {
    import spark.implicits._
    val loc = tmp("roundtrip")
    val schema = IceSchema(0, List(
      IceField(1, "k", required = true, IcePrim("long")),
      IceField(2, "part", required = true, IcePrim("long")),
      IceField(3, "v", required = false, IcePrim("string"))))
    val spec = IcePartitionSpec(0, List(IcePartitionField(2, 1000, "identity", "part")))
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec, formatVersion = 2)

    def batch(lo: Long, hi: Long) = (lo until hi)
      .map(k => (k, k % 4, s"v$k")).toDF("k", "part", "v")
    t.append(spark, batch(0, 400))
    t.append(spark, batch(400, 600))
    // position deletes (DELETE WHERE): every k % 10 == 0
    t.deleteWhere(spark, col("k") % 10 === 0)
    // equality deletes on k: a CDC-ish retraction of 30 keys
    t.equalityDelete(spark,
      (100L until 130L).toDF("k"), Seq("k"))
    // second append AFTER the deletes: these rows must survive both
    // (their sequence is newer than every delete's)
    t.append(spark, (100L until 110L).map(k => (k, k % 4, s"new$k")).toDF("k", "part", "v"))

    val expected = (0L until 600L)
      .filter(k => k % 10 != 0)
      .filterNot(k => 100L <= k && k < 130L)
      .map(k => (k, k % 4, s"v$k")) ++
      (100L until 110L).map(k => (k, k % 4, s"new$k"))

    // graft's own scan agrees with the model...
    val ours = t.scan(spark).as[(Long, Long, String)].collect().toSeq
    assert(ours.sorted === expected.sorted)

    // ...and the INDEPENDENT decoder agrees byte-for-byte
    val foreign = independentRead(loc).as[(Long, Long, String)].collect().toSeq
    assert(foreign.sorted === expected.sorted)
    assert(foreign.sorted === ours.sorted)
  }
}
