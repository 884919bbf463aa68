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

  test("resize stub: stride sampling hits the target size, checksum matches the kept bytes") {
    val text = "abcdefgh" * 32 // 256 bytes -> k = 4, keep positions 0,4,8,...
    val out = Multimodal.resizeQuery(docs((1L, text))).head()
    assert(out.getInt(1) == 64)
    val kept = (0 until 256 by 4).map(text.charAt).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(kept.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getString(2) == hex)
    // payload smaller than the target passes through whole
    val small = Multimodal.resizeQuery(docs((2L, "tiny"))).head()
    assert(small.getInt(1) == 4)
  }

  test("feature stub: histogram fractions sum to 1 and land in the right bins") {
    val text = "aaAA!!  " // bins: 'a'=97>>5=3, 'A'=65>>5=2, '!'=33>>5=1, ' '=32>>5=1
    val out = Multimodal.featureQuery(docs((1L, text))).head()
    val f = out.getSeq[Double](1)
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0) < 1e-4)
    assert(f(3) == 0.25 && f(2) == 0.25 && f(1) == 0.5)
  }
}
