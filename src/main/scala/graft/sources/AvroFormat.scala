package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file format — ref flink-formats/flink-avro
  * (AvroRowDeserializationSchema / AvroWriterFactory). The container has
  * no spark-avro DataSource jar, but the Avro CORE and avro-mapred jars
  * ship with Spark — so the format is implemented the way any Hadoop
  * ecosystem format plugs in: `AvroKeyInputFormat`/`AvroKeyOutputFormat`
  * over `newAPIHadoopFile`/`saveAsNewAPIHadoopFile`. Fully DISTRIBUTED —
  * one container file per partition on write, per-split record iteration
  * on read; no driver-side loops (the schema string is the only thing the
  * driver touches).
  *
  * Type subset: the fixture-relevant primitives (long/int/double/float/
  * string/boolean) plus the LOGICAL types real Avro data carries — ref
  * flink-avro AvroSchemaConverter: TIMESTAMP → long+timestamp-micros,
  * DECIMAL(p,s) → bytes+decimal(p,s), DATE → int+date. Nullable via Avro
  * unions. */
object AvroFormat {

  import org.apache.avro.LogicalTypes

  private def avroType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case StringType => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case other => throw new IllegalArgumentException(s"unsupported Avro mapping for $other")
  }

  /** Spark value → Avro generic value for one field (identity for
    * primitives; logical types encode per the Avro spec: timestamp-micros
    * as epoch-µs long, decimal as unscaled big-endian bytes, date as
    * epoch-day int). */
  private def toAvro(dt: DataType): Any => Any = dt match {
    case TimestampType | TimestampNTZType => {
      case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
      case l: java.time.LocalDateTime =>
        l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
      case v => v
    }
    case d: DecimalType => {
      case b: java.math.BigDecimal =>
        java.nio.ByteBuffer.wrap(b.setScale(d.scale).unscaledValue().toByteArray)
      case b: scala.math.BigDecimal =>
        java.nio.ByteBuffer.wrap(b.setScale(d.scale).underlying().unscaledValue().toByteArray)
      case v => v
    }
    case DateType => {
      case dd: java.sql.Date => dd.toLocalDate.toEpochDay.toInt
      case ld: java.time.LocalDate => ld.toEpochDay.toInt
      case v => v
    }
    case _ => identity
  }

  /** Avro generic value → Spark row value for one field. */
  private def fromAvro(dt: DataType): Any => Any = dt match {
    case TimestampType | TimestampNTZType => {
      case us: java.lang.Long =>
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case v => v
    }
    case d: DecimalType => {
      case bb: java.nio.ByteBuffer =>
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case v => v
    }
    case DateType => {
      case days: java.lang.Integer => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
      case v => v
    }
    case _ => {
      case u: org.apache.avro.util.Utf8 => u.toString
      case v => v
    }
  }

  /** DataFrame schema → Avro record schema (nullable fields as unions). */
  def avroSchemaOf(st: StructType, name: String = "graft_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      else base
      fields.add(new Schema.Field(f.name, t, null, null))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Write as Avro container files (one per partition). OVERWRITE
    * semantics: the Hadoop output format refuses an existing target, so
    * the directory is cleared first (the `mode("overwrite")` contract the
    * other formats get from the DataFrame writer). */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaOf(st).toString
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(target)) fs.delete(target, true)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val fieldNames = st.fieldNames
    val convs = st.fields.map(f => toAvro(f.dataType))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson) // parse once per task
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldNames.length) {
          rec.put(fieldNames(i), if (row.isNullAt(i)) null else convs(i)(row.get(i)))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Schema discovery: the container header of the first part file (the
    * same footer/header sniff every self-describing format does). */
  private def discoverSchema(spark: SparkSession, path: String): Schema = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      .headOption.getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = fs.open(part)
    try {
      val reader = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally in.close()
  }

  private def sparkType(s: Schema): DataType = {
    val eff = if (s.getType == Schema.Type.UNION)
      s.getTypes.stream().filter(_.getType != Schema.Type.NULL).findFirst().get()
    else s
    eff.getLogicalType match {
      case _: LogicalTypes.TimestampMicros => TimestampType
      case dec: LogicalTypes.Decimal => DecimalType(dec.getPrecision, dec.getScale)
      case _: LogicalTypes.Date => DateType
      case _ => eff.getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.STRING => StringType
        case Schema.Type.BOOLEAN => BooleanType
        case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
      }
    }
  }

  /** Read Avro container files as a DataFrame (schema self-described). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = discoverSchema(spark, path)
    val st = StructType(avroSchema.getFields.stream().map[StructField](f =>
      StructField(f.name, sparkType(f.schema), nullable = true))
      .collect(java.util.stream.Collectors.toList[StructField]).toArray(Array[StructField]()))
    val fieldNames = st.fieldNames
    val convs = st.fields.map(f => fromAvro(f.dataType))
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .map { case (k, _) =>
        // the RecordReader REUSES the key object — copy fields out now
        val rec = k.datum()
        Row.fromSeq(fieldNames.indices.map { i =>
          rec.get(fieldNames(i)) match {
            case null => null
            case v => convs(i)(v)
          }
        })
      }
    spark.createDataFrame(rows, st)
  }
}
