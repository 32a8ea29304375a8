package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("mm_patchify signatures match a local strided-gather recompute") {
    // the oracle replays the same SQL arithmetic; this pins the
    // GEOMETRY itself against an independent straight-line gather:
    // patch (pr, pc) must cover pixel rows pr*4..pr*4+3, cols
    // pc*4..pc*4+3 of the 16-wide image, and each doc must emit
    // exactly gh*4 patches for gh = len/64 complete patch rows
    val rows = graft.queries.Multimodal.patchify.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val pr = r.getLong(1).toInt
      val pc = r.getLong(2).toInt
      val patch = (0 until 4).map { k =>
        val off = (pr * 4 + k) * 16 + pc * 4
        t.substring(off, off + 4)
      }.mkString
      assert(md5hex(patch) == r.getString(3),
        s"patch ($pr,$pc) of doc ${r.getLong(0)} diverges")
    }
    // iterate the CORPUS side, not the output side: a regression that
    // drops whole docs must fail here, not hide behind the docs that
    // did emit
    val byDoc = rows.groupBy(_.getLong(0))
    texts.foreach { case (id, t) =>
      val gh = t.length / 64
      val got = byDoc.get(id).map(_.length).getOrElse(0)
      assert(got == gh * 4, s"doc $id: $got patches != ${gh * 4}")
    }
  }
}
