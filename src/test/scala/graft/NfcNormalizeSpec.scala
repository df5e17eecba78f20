package graft

import org.apache.spark.sql.functions._

/** Native `graft_nfc` expression: canonical-composition semantics, the
  * identity/null laws, and the dedup-key motivation (decomposed and
  * composed spellings must hash equal after normalization). Decomposed
  * fixtures are built from explicit \u escapes — source-file literals
  * could be silently re-normalized by tooling.
  */
class NfcNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val eAcute = "\u00e9"   // composed
  private val eAcuteD = "e\u0301" // e + combining acute
  private val aRing = "\u00c5"    // composed
  private val aRingD = "A\u030a" // A + combining ring

  test("composed and decomposed spellings normalize to identical bytes") {
    val rows = Seq(
      (s"caf$eAcute", s"caf$eAcuteD"),
      (s"${aRing}ngstr${eAcute}m", s"${aRingD}ngstr${eAcuteD}m"),
      ("plain ascii stays", "plain ascii stays"))
      .toDF("composed", "decomposed")
    val bad = rows.select(
        call_function("graft_nfc", $"composed").as("nc"),
        call_function("graft_nfc", $"decomposed").as("nd"))
      .filter($"nc" =!= $"nd" || md5($"nc") =!= md5($"nd"))
    assert(bad.count() == 0,
      "NFC must canonicalize both spellings to the same byte sequence")
  }

  test("idempotent, length-shrinking on decomposed input, null-propagating") {
    import org.apache.spark.sql.Row
    val out = Seq(Tuple1(eAcuteD)).toDF("d")
      .select(
        (call_function("graft_nfc", call_function("graft_nfc", $"d")) ===
          call_function("graft_nfc", $"d")).as("idem"),
        length($"d").as("n_raw"),
        length(call_function("graft_nfc", $"d")).as("n_nfc"),
        call_function("graft_nfc", lit(null).cast("string")).as("null_in"))
      .collect()(0)
    assert(out.getBoolean(0), "nfc(nfc(x)) == nfc(x)")
    assert(out.getInt(1) == 2 && out.getInt(2) == 1,
      "e + combining acute (2 code points) must compose to 1")
    assert(out.isNullAt(3))
  }

  test("the dedup-key law: exact-dedup misses the pair without nfc, catches it with") {
    val docs = Seq((1L, s"r${eAcute}sum$eAcute text"), (2L, s"r${eAcuteD}sum$eAcuteD text"))
      .toDF("doc_id", "text")
    val rawKeys = docs.select(md5($"text")).distinct().count()
    val nfcKeys = docs.select(md5(call_function("graft_nfc", $"text")))
      .distinct().count()
    assert(rawKeys == 2L, "byte-distinct spellings look like different docs")
    assert(nfcKeys == 1L, "canonicalized keys must collapse them")
  }
}
