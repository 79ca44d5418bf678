package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

/** Source layer (SURVEY.md §2 O1-O3, O10).
  *
  * The reference's "table" is a set of S3 objects of newline-delimited
  * CSV under a prefix, enumerated by the driver
  * (`src/python/driver.py:91-94`), split into lines
  * (`src/python/mapper.py:43-47`), optionally gunzipped
  * (`src/nodejs/mapper.js:71-79`), with malformed lines swallowed and
  * counted (`src/python/mapper.py:48-57`). All of that maps onto
  * Spark's `DataFrameReader`: `InMemoryFileIndex` enumerates + packs
  * file splits (O1/O10), `TextInputFormat` yields line records (O2),
  * codecs handle `.gz` natively (O3), and `mode=PERMISSIVE/DROPMALFORMED`
  * plus an accumulator reproduce the bad-record policy.
  */
object Tables {

  // -------- fixture parquet tables (TESTDATA.md) --------

  val fixtureNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Cheap driver-side fingerprint of one fixture table's parquet
    * files (name:size:mtime per part) — memo keys include it so an
    * in-JVM artifact cache (bpeTrainMemo, mixtureWeightsMemo) serves
    * stale training artifacts only if data under an unchanged path
    * also kept identical file metadata (round-11 advice: keying on
    * sfDir alone silently served stale merges after an in-session
    * rewrite of the same directory). Pure local-fs metadata — no data
    * read; at 100 TB the same role is played by a table-format
    * snapshot id.
    */
  def fingerprint(sfDir: String, name: String): String = {
    val root = new java.io.File(s"$sfDir/$name.parquet")
    val parts =
      if (root.isDirectory)
        Option(root.listFiles()).toSeq.flatten.sortBy(_.getName)
      else Seq(root)
    val sig = parts.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts ADAPTIVE INGESTION (round-10): the fixture's physical
    // encoding has drifted across regenerations — TIMESTAMP(NANOS)
    // (readable only as long via spark.sql.legacy.parquet.nanosAsLong,
    // set by GraftSession) then TIMESTAMP(MICROS, isAdjustedToUTC=false)
    // (arrives as TIMESTAMP_NTZ). A schema-on-read engine must branch
    // on the OBSERVED type, never hard-code one generation's encoding:
    // partition generations drift encodings at 100 TB (the q72
    // schema-evolution entry exists to prove exactly this). Round 9
    // hard-coded the nanos contract and lost 58/162 entries when the
    // fixtures regenerated.
    if (name == "events") df.withColumn("ts", normalizeTs(df, "ts"))
    else df
  }

  /** Normalize an event-time column to session-TZ TimestampType from
    * whatever physical encoding the parquet generation carries:
    *   - LongType        → nanos-as-long (legacy NANOS fixture): exact
    *                       integer DIV 1000 → micros (double division
    *                       would lose precision above 2^53 ns).
    *   - TimestampNTZType→ MICROS/MILLIS with isAdjustedToUTC=false:
    *                       cast is value-preserving because the
    *                       session TZ is pinned to UTC (GraftSession).
    *   - TimestampType   → already session-TZ; pass through.
    * Any other type is a fixture-contract break and fails LOUDLY in
    * one place instead of 60 scattered DATATYPE_MISMATCH stacks.
    */
  def normalizeTs(df: DataFrame, colName: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema(colName).dataType match {
      case LongType         => timestamp_micros(expr(s"$colName DIV 1000"))
      case TimestampNTZType => col(colName).cast(TimestampType)
      case TimestampType    => col(colName)
      case other => throw new IllegalStateException(
        s"fixture contract changed: events.$colName is $other — expected " +
          "LongType (legacy TIMESTAMP(NANOS) via nanosAsLong), " +
          "TIMESTAMP_NTZ (TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false)) " +
          "or TIMESTAMP; teach Tables.normalizeTs the new encoding")
    }
  }

  /** Fixture-contract CANARY (round-10): probe every fixture table's
    * observed schema in one cheap pass (parquet footer reads only) and
    * fail with ONE clear message when an encoding drifts outside what
    * the engine understands — instead of the 60 scattered
    * DATATYPE_MISMATCH stacks round 9 produced when the fixtures
    * regenerated events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS).
    * Returns the observed dtype per table/column for logging.
    */
  def assertFixtureContract(
      spark: SparkSession, sfDir: String): Map[String, String] = {
    val observed = fixtureNames.map { n =>
      n -> spark.read.parquet(s"$sfDir/$n.parquet").schema
    }.toMap
    // the one column with encoding history; normalizeTs throws the
    // single clear "fixture contract changed" message on drift
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"), "ts")
    observed.map { case (n, s) =>
      n -> s.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
        .mkString(",")
    }
  }

  /** Register every fixture table as a temp view so `spark.sql` text
    * matches the DuckDB oracle text.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    fixtureNames.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }

  // -------- reference workload schemas (FIXTURES.md §A) --------

  /** AMPLab `uservisits`: schema-on-read replaces the reference's
    * by-convention positional fields (`src/python/mapper.py:50-54`).
    */
  val uservisitsSchema: StructType = StructType(Seq(
    StructField("sourceIP", StringType),
    StructField("destURL", StringType),
    StructField("visitDate", DateType),
    StructField("adRevenue", DoubleType),
    StructField("userAgent", StringType),
    StructField("countryCode", StringType),
    StructField("languageCode", StringType),
    StructField("searchWord", StringType),
    StructField("duration", IntegerType)))

  /** AMPLab `rankings` (`/root/reference/README.md:139`). */
  val rankingsSchema: StructType = StructType(Seq(
    StructField("pageURL", StringType),
    StructField("pageRank", IntegerType),
    StructField("avgDuration", IntegerType)))

  /** CSV reader with the reference's bad-record tolerance
    * (`src/python/mapper.py:49-57`: whole-line try/except + counter).
    * `.gz` paths decompress transparently (O3). DROPMALFORMED drops
    * unparseable lines; the dropped count is (total file lines -
    * surviving rows), observable via [[countingCsv]] when the caller
    * needs the reference's `line_count` metric.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    csv(spark, Seq(path), schema)

  /** Multi-path variant: one logical table spread over several
    * directories (e.g. a plain-CSV prefix and a gzip prefix), exactly
    * the reference's many-objects-one-table model.
    */
  def csv(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .csv(paths: _*)

  /** Same, but also count raw input lines into `linesIn` the way every
    * reference task counts lines (`src/python/mapper.py:37,48`). The
    * accumulator is populated lazily when the returned frame executes.
    *
    * AT-LEAST-ONCE caveat: the count is incremented inside a
    * transformation, so task retries / speculative execution /
    * stage recomputation can overcount — unlike the reference's
    * exactly-once per-object `line_count`. When the exact metric
    * matters, use [[droppedLineCount]], which derives both counts
    * from actions.
    */
  def countingCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      linesIn: LongAccumulator
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = spark.read.textFile(path)
    val counted = raw.map { line => linesIn.add(1L); line }(raw.encoder)
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .csv(counted)
      // DROPMALFORMED still emits all-null rows for lines whose field
      // count mismatches in some corner cases; enforce non-null on the
      // first column like the reference's split-index access would.
      .filter(col(schema.fields.head.name).isNotNull)
  }

  /** CSV read with an `observe()` row counter attached: the returned
    * Observation yields the exact surviving-row count ("rows_out")
    * after ANY single action on the frame — exactly-once semantics
    * (observed metrics are collected per-query, immune to task
    * retries), zero extra passes. The streaming-safe, first-class
    * twin of the reference's per-task `line_count` metadata.
    */
  def observedCsv(
      spark: SparkSession, path: String, schema: StructType
  ): (DataFrame, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val obs = org.apache.spark.sql.Observation()
    val df = csv(spark, path, schema)
      .filter(col(schema.fields.head.name).isNotNull)
      .observe(obs, count(lit(1)).as("rows_out"))
    (df, obs)
  }

  /** Exactly-once line accounting for a CSV read: (raw lines,
    * surviving rows, dropped). Each count comes from its own ACTION —
    * immune to the at-least-once accumulator hazard — which is the
    * faithful twin of the reference driver's dropped-record rollup
    * (`src/python/driver.py:223-228`: Σ task line_counts vs output
    * rows). Two passes over the source; use when the metric must be
    * exact, not on the hot path.
    */
  def droppedLineCount(
      spark: SparkSession, path: String, schema: StructType): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val raw = spark.read.textFile(path).count()
    // .rdd.count() materializes FULL rows: a bare DataFrame count()
    // would let CSV column pruning skip parsing entirely and malformed
    // lines would never be detected (see SourcesSpec).
    val surviving = csv(spark, path, schema)
      .filter(col(schema.fields.head.name).isNotNull)
      .rdd.count()
    (raw, surviving, raw - surviving)
  }
}
