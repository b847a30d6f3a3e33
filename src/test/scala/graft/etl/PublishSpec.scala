package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Publish._

/** Scripted-transport specs for the publish fan-out + config validation
  * (S9/S10): behavior of the combinator around the injected session —
  * call ordering, paged last-match-wins project resolution, overwrite
  * mode, guaranteed sign-out, and the InvalidConfiguration wrap.
  */
class PublishSpec extends AnyFunSuite {

  private val dest = Destination("https://tab.example.org", "site", "pat",
    "secret", "Analytics")

  /** Recording fake session: `pages` of (id, name), publish returns a
    * fixed datasource id.
    */
  private class Fake(pages: Seq[(String, String)], failPublish: Boolean = false)
      extends Session {
    val calls = collection.mutable.Buffer.empty[String]
    override def projects: Iterator[(String, String)] = {
      calls += "projects"; pages.iterator
    }
    override def publish(projectId: String, path: String, overwrite: Boolean): String = {
      calls += s"publish:$projectId:$path:overwrite=$overwrite"
      if (failPublish) sys.error("upload refused")
      "ds-1"
    }
    override def signOut(): Unit = calls += "signOut"
  }

  test("publishExtract: paged scan, LAST name match wins, Overwrite mode, sign-out runs") {
    val s = new Fake(Seq("p1" -> "Other", "p2" -> "Analytics",
      "p3" -> "Misc", "p4" -> "Analytics"))
    val ds = publishExtract(_ => s, dest, "/x/extract.parquet")
    assert(ds == "ds-1")
    // the reference's loop assigns project_id without break — last wins
    assert(s.calls == Seq("projects", "publish:p4:/x/extract.parquet:overwrite=true",
      "signOut"))
  }

  test("publishExtract: missing project raises a CLEAR error and still signs out") {
    val s = new Fake(Seq("p1" -> "Other"))
    val e = intercept[NoSuchElementException] {
      publishExtract(_ => s, dest, "/x/e.parquet")
    }
    assert(e.getMessage.contains("Analytics"))
    assert(s.calls.last == "signOut")
  }

  test("publishExtract: a failing upload still signs out and propagates") {
    val s = new Fake(Seq("p1" -> "Analytics"), failPublish = true)
    intercept[RuntimeException] { publishExtract(_ => s, dest, "/x/e.parquet") }
    assert(s.calls.last == "signOut")
  }

  test("validateConfiguration: round trip ok; failures wrap in InvalidConfiguration") {
    val ok = new Fake(Nil)
    validateConfiguration(_ => ok, dest)
    assert(ok.calls == Seq("signOut"))
    val e = intercept[InvalidConfiguration] {
      validateConfiguration(_ => sys.error("bad PAT"), dest)
    }
    assert(e.getMessage.contains("Failed to validate configuration"))
    assert(e.getMessage.contains("bad PAT"))
  }
}
