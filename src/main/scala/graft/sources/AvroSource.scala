package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink on avro-core + avro-mapred alone
  * (SURVEY.md §2.10a tail: the frozen classpath ships the Avro libraries
  * but not the spark-avro DataSource module, so `format("avro")` cannot
  * resolve — the FORMAT was never the blocker, only the adapter).
  *
  * Read path: `sc.hadoopFile` with Avro's own `AvroInputFormat` — the
  * same block-splittable mechanism spark-avro delegates to. Avro container
  * files carry sync markers every block, so one 100-TB-scale file still
  * fans out into HDFS-split-sized partitions; nothing here is
  * whole-file-at-a-time. Records decode straight to Rows against an
  * EXPLICIT Spark schema (schema inference at scale is an extra full pass
  * and a correctness hazard — same rule as the csv/json sources).
  *
  * Write path: one container file per partition via `DataFileWriter`
  * (executor-side, no driver funnel), mirroring what a DataSource sink
  * would do. Flat long/int/double/string/boolean columns — the Avro
  * primitive lattice; nested/logical types are out of scope for the
  * round-trip contract this backs. */
object AvroIO {

  /** Avro record-schema JSON for a flat Spark schema. Every field is a
    * `["null", T]` union (r13 review: the bare-primitive schema made the
    * first null cell throw an opaque executor NPE mid-write, leaving a
    * truncated container file — Spark DataFrames are nullable by default,
    * so the sink must be too). */
  def avroSchemaJson(schema: StructType, name: String = "graft_row"): String = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType  => "\"double\""
        case StringType  => "\"string\""
        case BooleanType => "\"boolean\""
        case other => throw new IllegalArgumentException(
          s"avro round-trip supports flat primitive columns; got $other for ${f.name}")
      }
      s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Write `df` as one Avro container file per partition under `dir`.
    * The schema JSON (a plain string) rides the closure; each task parses
    * it locally — Schema itself is not serializable. Files are created
    * through the Hadoop FileSystem of `dir`'s scheme with the SESSION's
    * Hadoop configuration broadcast to executors (a bare
    * `new Configuration()` would drop `spark.hadoop.*` settings — S3A
    * credentials, nameservice mappings — on a real cluster). Each task
    * writes an attempt-unique `_tmp` file and renames it into place only
    * on success, so a speculative or retried attempt can never interleave
    * bytes with a concurrent attempt on the same final path; the loser's
    * rename onto an existing file is a no-op and its temp is deleted. */
  def write(df: DataFrame, dir: String): Unit = {
    val json = avroSchemaJson(df.schema)
    val n = df.schema.length
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val bc = df.sparkSession.sparkContext.broadcast(hconf)
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val sch = new Schema.Parser().parse(json)
      val attempt = org.apache.spark.TaskContext.get() match {
        case null => 0L
        case tc   => tc.taskAttemptId()
      }
      val fin = new org.apache.hadoop.fs.Path(dir, f"part-$i%05d.avro")
      val tmp = new org.apache.hadoop.fs.Path(
        dir, f"_tmp-part-$i%05d-attempt-$attempt.avro")
      val fs  = fin.getFileSystem(bc.value.value)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, fs.create(tmp, true)) // w.close() closes the stream
      var ok = false
      try {
        rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          var j = 0
          while (j < n) { rec.put(j, r.get(j)); j += 1 }
          w.append(rec)
        }
        ok = true
      } finally {
        w.close()
        if (ok) {
          // First attempt to finish wins; rename is atomic per FS contract.
          if (!fs.rename(tmp, fin)) fs.delete(tmp, false)
        } else fs.delete(tmp, false)
      }
      Iterator.single(i)
    }.count()
    ()
  }

  /** Block-splittable distributed read of `dir`'s container files into a
    * DataFrame with the given explicit schema. Values are copied out of
    * the (Hadoop-reused) record before the next one is deserialized;
    * Avro's Utf8 views become Strings. */
  def read(s: SparkSession, dir: String, schema: StructType): DataFrame = {
    val n = schema.length
    val rdd = s.sparkContext.hadoopFile[AvroWrapper[GenericRecord],
        NullWritable, AvroInputFormat[GenericRecord]](dir + "/*.avro")
      .map { case (w, _) =>
        val rec = w.datum()
        val vals = new Array[Any](n)
        var j = 0
        while (j < n) {
          vals(j) = rec.get(j) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    s.createDataFrame(rdd, schema)
  }
}
