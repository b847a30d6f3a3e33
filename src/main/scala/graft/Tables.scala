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
  /** events.ts arrives in whatever precision the upstream generator used —
    * some drops stamp TIMESTAMP(NANOS) (which Spark's reader rejects,
    * [PARQUET_TYPE_ILLEGAL], so we read nanos as epoch-long via the legacy
    * conf and rebuild micros), others plain TIMESTAMP(MICROS) (which reads
    * as TIMESTAMP_NTZ). Normalize BOTH to a session-TZ TimestampType at
    * micro precision — the session TZ is pinned to UTC, so the NTZ cast is
    * wall-value-preserving and matches the DuckDB oracle's naive read.
    * Exactly the precision-normalization step a 100 TB ingest of
    * mixed-precision stamps would run.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // the legacy nanos conf stays SET for the session — a DELIBERATE
    // tradeoff, not an accident: the parquet reader consults it at
    // EXECUTION time too, so a save/restore scoped to analysis (the
    // ScaleUp.ensure pattern, which materializes eagerly) would make
    // the lazy frame returned here throw when the caller finally acts
    // on it. Consequence, documented in the verify recipe: after any
    // events() call, other TIMESTAMP(NANOS) reads in this session
    // yield longs instead of the loud rejection — route them through
    // this accessor.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType             => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType  => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                    => raw
    }
  }
  /** Deterministic `partsupp` derived from `part` × the supplier count.
    *
    * The driver's testdata ships no partsupp table, which blocked the five
    * partsupp-dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20). Rather than
    * synthesize parquet of our own (forbidden), derive the table in-plan
    * with pure integer arithmetic that the DuckDB oracle reproduces
    * verbatim from the SAME parquet inputs (see Parity.PartsuppCte):
    * each part gets 4 supplier rows, `ps_suppkey = (p_partkey*7 + i*13)
    * mod S + 1` for i in 0..3 (S = supplier count, obtained via a
    * broadcast 1-row aggregate, never a driver action), and availqty /
    * supplycost are hash-like mixes of the two keys. All columns are
    * BIGINT so every downstream product/sum is exact — no float drift
    * between engines. At scale this is a narrow flatMap over the part
    * scan: no shuffle, no driver state, 4× part cardinality.
    */
  /** Key-domain block size ScaleUp's ×F replicas offset their keys by
    * (copy c adds `c · KeyOffset` to every key column). partsupp's FK
    * derivation is written against this convention so it stays valid on
    * replicas; unscaled dirs (all keys < KeyOffset) reduce to the plain
    * formula exactly.
    */
  val KeyOffset: Long = 1L << 40

  def partsupp(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // COPY-AWARE FK derivation: mod the part key's within-copy base
    // against the PER-COPY supplier count and re-add the copy offset —
    // a replica part references its own copy's suppliers, so the
    // derived FK joins stay ×F-consistent (global count + global key
    // would point most replica parts at suppliers that don't exist).
    val scnt = supplier(s, d).filter(col("s_suppkey") < KeyOffset)
      .agg(count(lit(1)).as("__scnt"))
    val base = col("p_partkey") % KeyOffset
    val copyOff = col("p_partkey") - base
    part(s, d).select(col("p_partkey"))
      .crossJoin(broadcast(scnt))
      .select(col("p_partkey"), col("__scnt"),
        explode(sequence(lit(0), lit(3))).as("__i"))
      .withColumn("ps_suppkey",
        ((base * 7 + col("__i") * 13) % col("__scnt")) + 1 + copyOff)
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        (((col("p_partkey") * 17 + col("ps_suppkey") * 3) % 9999) + 1)
          .as("ps_availqty"),
        (((col("p_partkey") * 31 + col("ps_suppkey") * 53) % 1000) + 1)
          .as("ps_supplycost"))
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
