package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish testdata tables (TESTDATA.md).
  *
  * Scale posture: each table is a parquet dataset path; at 100 TB the same
  * loaders point at partitioned directories — nothing here assumes a single
  * file. Reads are lazy scans; Catalyst pushes projections/predicates into
  * the parquet reader (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is stored as parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as epoch-long (legacy
    * conf) and rebuild a TimestampType at micro precision — lossless here
    * (the generator emits micro-precision values) and exactly what a
    * 100 TB ingest of ns-stamped data would do.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
