package graft.etl

import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests for the ingest policies (SURVEY.md §5): for ANY csv
  * content, the collapsed schema is within {Long, Double, String} and
  * both null sentinels ("n/a", "") read back as null. Generators are
  * driven directly (scalatestplus bridge not in the offline dep set).
  */
class EtlPropSpec extends SparkSpec {

  private val collapsed = Set[DataType](LongType, DoubleType, StringType)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("TypePolicy.collapse maps every Spark type into {Long, Double, String}") {
    val gens: Gen[DataType] = Gen.oneOf(
      ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
      DecimalType(10, 2), DecimalType(38, 18), BooleanType, StringType,
      DateType, TimestampType, BinaryType,
      ArrayType(IntegerType), MapType(StringType, LongType),
      StructType(Seq(StructField("x", IntegerType))))
    samples(gens, 200).foreach { dt =>
      assert(collapsed.contains(TypePolicy.collapse(dt)), dt.toString)
    }
  }

  test("nullify: exactly the sentinel values become null, all others survive") {
    import spark.implicits._
    val cell = Gen.oneOf(
      Gen.const("n/a"), Gen.const(""),
      Gen.alphaNumStr, Gen.const("N/A"), Gen.const(" "), Gen.const("null"))
    val cells = samples(cell, 200)
    val df = cells.zipWithIndex.map { case (c, i) => (i, c) }.toDF("i", "v")
    val out = df.select($"i", Ingest.nullify($"v").as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    cells.zipWithIndex.foreach { case (c, i) =>
      if (Ingest.NullSentinels.contains(c)) assert(out(i).isEmpty, s"'$c' not nulled")
      else assert(out(i).contains(c), s"'$c' was altered")
    }
  }

  test("readCsv round trip: inferred schema collapses; sentinels null out") {
    val dir = java.nio.file.Files.createTempDirectory("csv_prop").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "a.csv"),
      "id,score,name,flag,when\n" +
        "1,1.5,alice,true,2024-01-01\n" +
        "2,n/a,,false,2024-01-02\n" +
        "3,2.25,n/a,true,n/a\n")
    val df = Ingest.readCsv(spark, dir)
    assert(df.schema.fields.forall(f => collapsed.contains(f.dataType)))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType && types("score") == DoubleType)
    assert(types("flag") == StringType && types("when") == StringType)
    val rows = df.orderBy("id").collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // n/a and "" -> null
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(4))
  }
}
