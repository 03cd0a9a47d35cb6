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
  * Type subset — ref flink-avro AvroSchemaConverter: the primitives
  * (long/int/double/float/string/boolean), the LOGICAL types real Avro
  * data carries (TIMESTAMP → long+timestamp-micros, DECIMAL(p,s) →
  * bytes+decimal(p,s), DATE → int+date) and the COMPLEX types
  * (ARRAY<e> → array, MAP<STRING,v> → map, nested STRUCT → record),
  * recursively. Nullable via Avro unions at every level. */
object AvroFormat {

  import org.apache.avro.LogicalTypes
  import scala.jdk.CollectionConverters._

  /** Union-wrapped nullable branch → the effective value schema. */
  private def effective(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.stream().filter(_.getType != Schema.Type.NULL).findFirst().get()
    else s

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), s))

  /** Spark type → Avro schema; `path` names nested records uniquely
    * (Avro record names must not collide within one schema). */
  private def avroType(dt: DataType, path: String): Schema = dt match {
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
    case ArrayType(e, containsNull) =>
      val elem = avroType(e, s"${path}_item")
      Schema.createArray(if (containsNull) nullable(elem) else elem)
    case MapType(StringType, v, valueContainsNull) =>
      val value = avroType(v, s"${path}_value")
      Schema.createMap(if (valueContainsNull) nullable(value) else value)
    case st: StructType => avroSchemaOf(st, path)
    case other => throw new IllegalArgumentException(s"unsupported Avro mapping for $other")
  }

  /** Spark value → Avro generic value (identity for primitives; logical
    * types encode per the Avro spec: timestamp-micros as epoch-µs long,
    * decimal as unscaled big-endian bytes, date as epoch-day int; complex
    * types recurse with their element/value/field schemas). */
  private def toAvro(dt: DataType, s: Schema): Any => Any = dt match {
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
    case ArrayType(e, _) =>
      val elemConv = toAvro(e, effective(s.getElementType))
      v => {
        val items = v.asInstanceOf[scala.collection.Seq[Any]]
          .map(x => if (x == null) null else elemConv(x)).asJava
        new GenericData.Array[Any](s, items)
      }
    case MapType(StringType, vt, _) =>
      val valConv = toAvro(vt, effective(s.getValueType))
      v => v.asInstanceOf[scala.collection.Map[String, Any]]
        .map { case (k, x) => k -> (if (x == null) null else valConv(x)) }
        .toMap.asJava
    case st: StructType =>
      val convs = st.fields.zipWithIndex.map { case (f, i) =>
        toAvro(f.dataType, effective(s.getFields.get(i).schema()))
      }
      val names = st.fieldNames
      v => {
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), if (row.isNullAt(i)) null else convs(i)(row.get(i)))
          i += 1
        }
        rec
      }
    case _ => identity
  }

  /** Avro generic value → Spark row value (recursive over complex types). */
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
    case ArrayType(e, _) =>
      val elemConv = fromAvro(e)
      v => v.asInstanceOf[java.util.Collection[Any]].asScala
        .map(x => if (x == null) null else elemConv(x)).toSeq
    case MapType(StringType, vt, _) =>
      val valConv = fromAvro(vt)
      v => v.asInstanceOf[java.util.Map[Any, Any]].asScala
        .map { case (k, x) => k.toString -> (if (x == null) null else valConv(x)) }.toMap
    case st: StructType =>
      val convs = st.fields.map(f => fromAvro(f.dataType))
      val names = st.fieldNames
      v => {
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(names.indices.map { i =>
          rec.get(names(i)) match { case null => null; case x => convs(i)(x) }
        })
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
      val base = avroType(f.dataType, s"${name}_${f.name}")
      val t = if (f.nullable) nullable(base) else base
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
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson) // parse once per task
      // converters are schema-aware (nested records/arrays need their Avro
      // sub-schemas), so they are built per task from the parsed schema
      val convs = st.fields.zipWithIndex.map { case (f, i) =>
        toAvro(f.dataType, effective(schema.getFields.get(i).schema()))
      }
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
    val eff = effective(s)
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
        case Schema.Type.ARRAY => ArrayType(sparkType(eff.getElementType))
        case Schema.Type.MAP => MapType(StringType, sparkType(eff.getValueType))
        case Schema.Type.RECORD => StructType(
          eff.getFields.asScala.toSeq.map(f => StructField(f.name, sparkType(f.schema))))
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
    val convs: Array[Any => Any] = st.fields.map(f => fromAvro(f.dataType))
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
