package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface — the Spark-4 face of the reference's input/output
  * formats (Spark 1.3 text/json/parquet sources and DStream file inputs).
  *
  * Readers take explicit schemas: at 100 TB, schema inference is a full
  * extra pass over the data. Writers expose the two layouts that matter
  * at scale: date/key partitioning (partition pruning on read) and
  * bucketing (co-located joins with no shuffle on the bucketed key).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC read/write (r12) — the other columnar format the reference era
    * reached through Hive; Spark bundles the ORC reader with the same
    * pushdown/pruning surface as parquet (PushedFilters in the scan). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet: directory per partition value →
    * partition pruning turns key-range scans into file skips. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: joins/aggs on the bucket key skip their
    * shuffle entirely when both sides share the layout. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCol: String, sortCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] with an explicit external location, so callers can
    * lay out bucketed data outside the session warehouse (e.g. a scratch
    * dir shared by repeated runs). */
  def writeBucketedAt(df: DataFrame, table: String, path: String, buckets: Int,
                      bucketCol: String, sortCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  // ---- JDBC (reference: sql/core/src/main/scala/org/apache/spark/sql/
  // jdbc/JDBCRelation.scala:1, JDBCRDD.scala) ----

  /** Whole-table JDBC read (one partition — for dims and lookups). */
  def jdbc(spark: SparkSession, url: String, table: String,
           driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    driver.fold(r)(d => r.option("driver", d)).load()
  }

  /** Range-partitioned JDBC read: `numPartitions` concurrent connections
    * each scan a stride of `partitionCol` — the only JDBC shape that
    * scales past one executor (JDBCRelation.columnPartition semantics).
    * Bounds are caller-supplied: letting the engine min/max the table
    * first would be an extra full scan on a 100 TB-fed warehouse. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int, driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
    driver.fold(r)(d => r.option("driver", d)).load()
  }

  /** JDBC sink. `batchsize` bounds per-round-trip row count; writes run
    * from executors in parallel, one connection per partition. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "overwrite", batchSize: Int = 1000,
                driver: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
    driver.fold(w)(d => w.option("driver", d)).save()
  }

  // ---- libsvm sparse-vector text source (reference: mllib/src/main/
  // scala/org/apache/spark/mllib/util/MLUtils.scala:1 loadLibSVMFile /
  // saveAsLibSVMFile) ----

  /** Read LIBSVM-format text (`label idx:val idx:val ...`, 1-based
    * ascending indices) into (label: double, indices: array<int>,
    * values: array<double>) with 0-based indices — the reference's
    * LabeledPoint-with-SparseVector shape as columns. The parse is pure
    * codegen'd column transforms over `spark.read.text` (split + slice +
    * transform) — no per-line closures, embarrassingly parallel at any
    * file count. Blank lines and '#' comment lines are dropped (the
    * reference filters both), and MLUtils' index contract is enforced
    * in-plan: a non-positive or non-strictly-ascending index fails the
    * read loudly (assert_true) instead of silently shifting features.
    *
    * @param numFeatures fixed dimensionality; -1 (default) infers
    *                    max(index)+1 with one bounded aggregate, exactly
    *                    MLUtils' computeNumFeatures pass. The value is
    *                    pinned on every row as `num_features` so
    *                    downstream densification never re-scans.
    */
  def libsvm(spark: SparkSession, path: String, numFeatures: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions._
    val parsed = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("t"))
      .filter(size(col("t")) > 0 && col("t")(0) =!= "" &&
        !col("t")(0).startsWith("#"))
      .select(
        col("t")(0).cast("double").as("label"),
        expr("transform(slice(t, 2, greatest(size(t) - 1, 0)), " +
          "s -> cast(split(s, ':')[0] AS INT) - 1)").as("indices"),
        expr("transform(slice(t, 2, greatest(size(t) - 1, 0)), " +
          "s -> cast(split(s, ':')[1] AS DOUBLE))").as("values"))
      // MLUtils.loadLibSVMFile's require: 1-based, strictly ascending.
      // After the -1 shift: every index >= 0 and index[i] > index[i-1].
      // The assert lives inside a filter predicate (isnull(assert_true)
      // is always true when the check passes) so column pruning cannot
      // drop it from the plan.
      .filter(expr(
        "isnull(assert_true(forall(indices, i -> i >= 0) AND " +
          "(size(indices) <= 1 OR " +
          "forall(sequence(1, size(indices) - 1), " +
          "k -> indices[k] > indices[k - 1])), " +
          "'libsvm: indices must be one-based and strictly ascending'))"))
    val d =
      if (numFeatures > 0) numFeatures
      else parsed.agg(coalesce(max(array_max(col("indices"))) + 1, lit(0)))
        .head.getInt(0)
    parsed.withColumn("num_features", lit(d))
  }

  /** Write (label, indices, values) back out as LIBSVM text (1-based
    * indices, `saveAsLibSVMFile` parity). */
  def writeLibsvm(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    df.select(concat_ws(" ",
        col("label").cast("string"),
        concat_ws(" ", zip_with(col("indices"), col("values"),
          (i, v) => concat(i + 1, lit(":"), v.cast("string")))))
      .as("value"))
      .write.mode("overwrite").text(path)
  }

  // ---- streaming file sources (reference: streaming/src/main/scala/org/
  // apache/spark/streaming/StreamingContext.scala:280 socketTextStream,
  // :396 textFileStream) ----

  /** Micro-batch text-file stream: one `value` column per line — the
    * textFileStream analog (socket receivers have no exactly-once story;
    * file listing does, which is why Structured Streaming's file source
    * replaced them). */
  def textStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)

  /** Micro-batch csv stream with explicit schema (streaming sources
    * cannot infer one). */
  def csvStream(spark: SparkSession, path: String, schema: StructType,
                header: Boolean = false, delimiter: String = ","): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Micro-batch json stream with explicit schema. */
  def jsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Key/value sink shape (the Kafka wire contract: binary key, binary
    * value): key = the partitioning column's bytes, value = the row as
    * JSON. Works unchanged against `format("kafka")` when a broker
    * exists; round-trippable through from_json for tests and file
    * sinks. Keyed serialization is how a streaming pipeline hands rows
    * to ANY log-structured transport, so the shape lives here rather
    * than behind a broker-specific dependency. */
  def toKeyValue(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = df.columns.map(c => df(c))
    df.select(
      df(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(payload: _*)).cast("binary").as("value"))
  }

  /** Inverse of [[toKeyValue]] for a known schema (consumer side). */
  def fromKeyValue(kv: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    kv.select(from_json(col("value").cast("string"), schema).as("r")).select("r.*")
  }

  // ---- Kafka parity (reference: external/kafka/src/main/scala/org/
  // apache/spark/streaming/kafka/KafkaUtils.scala:1) ----
  //
  // The connector is resolved by format-string at RUNTIME, so this
  // surface compiles with no kafka artifact on the build classpath; a
  // user points it at a real broker by shipping the standard
  // spark-sql-kafka connector jar with their job (--packages / --jars),
  // exactly how every Spark deployment wires Kafka. Without the jar the
  // calls fail fast at source resolution with DATA_SOURCE_NOT_FOUND.
  // SourcesSpec's round-trip test is gated on SPARK_GRAFT_KAFKA (broker
  // address) and skips otherwise.

  /** Streaming Kafka source: KafkaUtils.createStream's modern form.
    * Returns the connector's (key binary, value binary, topic, partition,
    * offset, timestamp, ...) frame — [[fromKeyValue]] decodes rows
    * written by [[writeKafka]]. */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Bounded whole-topic Kafka read (the batch face of the same source). */
  def kafkaBatch(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Batch Kafka sink: applies the [[toKeyValue]] wire contract and
    * publishes to `topic`. */
  def writeKafka(df: DataFrame, bootstrap: String, topic: String, keyCol: String): Unit =
    toKeyValue(df, keyCol).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** Streaming Kafka sink: same wire contract, checkpointed. */
  def writeKafkaStream(df: DataFrame, bootstrap: String, topic: String, keyCol: String,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    toKeyValue(df, keyCol).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
