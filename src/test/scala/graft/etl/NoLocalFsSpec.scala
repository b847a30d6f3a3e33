package graft.etl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The data path must address storage through the Hadoop FileSystem API
  * only — `java.io.File` silently misbehaves on `s3a://`/`hdfs://` URIs
  * (exists() returns false, sizes read 0), which is exactly where a
  * 100 TB extract lives. Enforced as a source scan so a refactor can't
  * quietly reintroduce a local-only path.
  */
class NoLocalFsSpec extends AnyFunSuite {
  import scala.jdk.CollectionConverters._

  test("etl/catalog production sources never use java.io.File") {
    val roots = Seq("src/main/scala/graft/etl", "src/main/scala/graft/catalog")
    val offenders = roots.flatMap { r =>
      Files.walk(Paths.get(r)).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filter(p => Files.readString(p).contains("java.io.File"))
        .map(_.toString)
    }
    assert(offenders.isEmpty, s"local-FS API in the data path: $offenders")
  }
}
