package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class EtlSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("incremental refresh merges delta by key: updates win, inserts append") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("incr").toString + "/extract"
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    assert(Refresh.incremental(spark, base, path, Seq("id")) == 2L)
    val delta = Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    assert(Refresh.incremental(spark, delta, path, Seq("id")) == 3L)
    val got = spark.read.parquet(path).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
  }

  test("TypePolicy collapses every type to {Long, Double, String}") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("sh", ShortType), StructField("f", FloatType),
      StructField("dbl", DoubleType), StructField("dec", DecimalType(10, 2)),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("dt", DateType), StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      List(Row(1, 2L, 3.toShort, 4.5f, 6.7, new java.math.BigDecimal("8.90"),
        true, "x", java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))).asJava, schema)
    val out = TypePolicy(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("i") == LongType && types("l") == LongType && types("sh") == LongType)
    assert(types("f") == DoubleType && types("dbl") == DoubleType && types("dec") == DoubleType)
    assert(types("b") == StringType && types("s") == StringType)
    assert(types("dt") == StringType && types("ts") == StringType)
    assert(out.schema.fields.forall(f =>
      Set[DataType](LongType, DoubleType, StringType).contains(f.dataType)))
  }

  test("TypePolicy.collapse is total and idempotent (property)") {
    val candidates = Seq[DataType](ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, DecimalType(38, 4), BooleanType, StringType,
      DateType, TimestampType, BinaryType, ArrayType(IntegerType),
      MapType(StringType, LongType), StructType(Seq(StructField("x", IntegerType))))
    val prop = org.scalacheck.Prop.forAll(org.scalacheck.Gen.oneOf(candidates)) { dt =>
      val once = TypePolicy.collapse(dt)
      Set[DataType](LongType, DoubleType, StringType).contains(once) &&
        TypePolicy.collapse(once) == once
    }
    assert(org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop).passed)
  }

  test("null sentinels n/a and empty string become null, others survive") {
    import spark.implicits._
    val df = Seq("n/a", "", "ok", "N/A", " ").toDF("v")
    val out = Ingest.normalizeNulls(df).as[Option[String]].collect().toSeq
    assert(out == Seq(None, None, Some("ok"), Some("N/A"), Some(" ")))
  }

  test("readCsv infers, null-normalizes, and collapses types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    java.nio.file.Files.writeString(f.toPath,
      "name,age,income,flag\nVillage A,34,1200.5,true\nVillage B,n/a,,false\n")
    val out = Ingest.readCsv(spark, f.getAbsolutePath)
    val types = out.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(types("name") == StringType)
    assert(types("age") == LongType)
    assert(types("income") == DoubleType)
    assert(types("flag") == StringType) // bool collapses to text, as pandas-kind 'b' does
    val rows = out.orderBy("name").collect()
    assert(rows(1).isNullAt(out.columns.indexOf("age")))
    assert(rows(1).isNullAt(out.columns.indexOf("income")))
  }

  test("full refresh overwrites and returns count") {
    import spark.implicits._
    val p = s"${sys.props("java.io.tmpdir")}/graft_test_refresh"
    assert(Refresh.overwrite(Seq(1, 2, 3).toDF("x"), p) == 3L)
    // second refresh fully replaces, not appends
    assert(Refresh.overwrite(Seq(4, 5).toDF("x"), p) == 2L)
  }
}
