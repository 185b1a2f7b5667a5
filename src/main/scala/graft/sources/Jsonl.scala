package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Ingestion-grade JSONL reading — a real crawl delivery always contains
  * some malformed lines, and the two failure modes Spark offers by default
  * are both wrong for a pipeline: FAILFAST kills the job on line one of
  * bad data, DROPMALFORMED silently erases rows (the count mismatch is
  * discovered weeks later). The pipeline form: every input line lands in
  * exactly ONE of two frames — `clean` (schema-conforming rows) or
  * `quarantine` (the raw offending line, preserved byte-for-byte for
  * reprocessing/triage) — so ingestion is lossless and the bad-line rate
  * is a monitorable number, not a silent subtraction.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL against `schema`; returns (clean, quarantine).
    * Clean rows carry exactly the schema's columns; quarantine rows carry
    * the single `raw_line` column. Every input line appears in exactly one
    * of the two (PERMISSIVE capture, spec-asserted losslessness).
    *
    * The parsed frame is cached through [[graft.pipeline.Dedup.cache]]'s
    * registry (harness-cleared): Spark refuses to filter on the corrupt
    * column of an uncached raw-file scan (the parser prunes it), and the
    * cache also keeps the two branches from re-parsing the files twice.
    * Scale: parsing is map-side; both branches are partition-parallel
    * projections of the cached scan.
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved by readWithQuarantine")
    val raw = graft.pipeline.Dedup.cache(
      spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path))
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }
}
