package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Multimodal

/** Binary-column plumbing: payload packing, metadata, decode stub,
  * frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("payload metadata: byte length and checksum") {
    val out = Multimodal.metaQuery(docs((1L, "abcd"))).head()
    assert(out.getString(1) == "application/octet-stream")
    assert(out.getInt(2) == 4)
    assert(out.getString(3) == "e2fc714c4727ee9395f324cd2e7f331f") // md5("abcd")
  }

  test("decode stub: dimensions and mean byte of a known payload") {
    val text = "a" * 130 // 130 bytes -> width 64, height ceil(130/64)=3
    val out = Multimodal.decodeQuery(docs((1L, text))).head()
    assert(out.getInt(1) == 64)
    assert(out.getInt(2) == 3)
    assert(out.getDouble(3) == 97.0) // 'a'
  }

  test("frame sampling: every 16th byte") {
    val text = ('a' to 'z').mkString * 2 // 52 chars
    val out = Multimodal.frameSample(docs((1L, text)), 16).head()
    assert(out.getInt(1) == 4) // positions 1,17,33,49
    val expected = Seq(1, 17, 33, 49).map(p => text.charAt(p - 1).toInt).sum
    assert(out.getLong(2) == expected.toLong)
  }
}
