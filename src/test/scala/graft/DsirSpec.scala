package graft

import graft.llm.{Dsir, TextOps}
import org.apache.spark.sql.functions._

/** DSIR importance-weighted selection (VERDICT r15 item 5): the weight
  * law pinned on a HAND-BUILT vocabulary — λ per hashed-bigram bucket is
  * recomputed independently here from the raw counts and the engine's
  * integer weights must match exactly; selection order, tie-breaks, and
  * the zero-bigram edge are pinned too.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("weight law: engine λ and doc weights equal an independent " +
      "fixed-point recomputation on a hand-built vocabulary") {
    val b = 16
    // target loves "big cats", raw is mixed — hand-built so bucket
    // counts are enumerable
    val target = Seq(
      (1L, "big cats purr"), (2L, "big cats sleep")).toDF("id", "text")
    val raw = Seq(
      (1L, "big cats purr"), (2L, "big cats sleep"),
      (3L, "small dogs bark"), (4L, "small dogs run fast"),
      (5L, "x")).toDF("id", "text") // id 5: zero bigrams
    val lam = Dsir.logRatios(target, raw, "text", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lam.size == b, s"λ must cover all $b buckets: ${lam.size}")

    // independent recomputation: bucket ids via the same md5 hash, λ by
    // the formula in plain scala math
    def buckets(text: String): Seq[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      toks.sliding(2).filter(_.size == 2).map { p =>
        val g = p.mkString(" ")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5.take(8), 16) % b
      }.toSeq
    }
    val tCounts = target.collect().flatMap(r => buckets(r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rCounts = raw.collect().flatMap(r => buckets(r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (tt, tr) = (tCounts.values.sum, rCounts.values.sum)
    (0 until b).foreach { bk =>
      val want = math.round(math.log(
        (tCounts.getOrElse(bk.toLong, 0L) + 1).toDouble * (tr + b) /
          ((rCounts.getOrElse(bk.toLong, 0L) + 1).toDouble * (tt + b))) * 1e6)
      assert(lam(bk.toLong) == want,
        s"bucket $bk: engine λ ${lam(bk.toLong)} != hand λ $want")
    }

    // selection: target-like docs outrank the dog docs; the zero-bigram
    // doc scores exactly 0
    val sel = Dsir.select(raw, lam, "text", "id", b, budget = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byId = sel.toMap
    assert(byId(5L) == 0L, s"zero-bigram doc must weigh 0: ${byId(5L)}")
    assert(Seq(1L, 2L).map(byId).min > Seq(3L, 4L).map(byId).max,
      s"target-like docs must outrank: $byId")
    // hand-recompute doc weights: sum of λ over occurrences
    raw.collect().foreach { r =>
      val want = buckets(r.getString(1)).map(lam).sum
      assert(byId(r.getLong(0)) == want,
        s"doc ${r.getLong(0)}: weight ${byId(r.getLong(0))} != hand $want")
    }
  }

  test("selection is budget-bounded, deterministic, and ties break on the md5(id) key") {
    val b = 8
    // every doc identical → identical weights → pure tie-break ordering
    val docs = (1L to 10L).map(i => (i, "same same text")).toDF("id", "text")
    val lam = Dsir.logRatios(docs, docs, "text", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sel = Dsir.select(docs, lam, "text", "id", b, budget = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(sel.size == 4)
    def h(i: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16)
    }
    val want = (1L to 10L).sortBy(i => (h(i), i)).take(4)
    assert(sel.sorted == want.sorted,
      s"tie-break must follow md5(id): got $sel want $want")
    // rerun → identical selection (content-stable, no RNG state)
    val again = Dsir.select(docs, lam, "text", "id", b, budget = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(again.sorted == sel.sorted)
  }

  test("resample: Gumbel-top-k keys equal a hand recomputation; draws are " +
      "content-stable per salt and independent across salts") {
    val b = 16
    val docs = (1L to 40L).map(i => (i, s"doc $i body words here")).toDF("id", "text")
    val lam = Dsir.logRatios(docs.filter($"id" <= 10), docs, "text", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    def buckets(text: String): Seq[Long] =
      text.trim.toLowerCase.split("\\s+").toSeq.sliding(2)
        .filter(_.size == 2).map(p => h32(p.mkString(" ")) % b).toSeq
    def handKey(id: Long, text: String, salt: String): (Long, Long) = {
      val w = buckets(text).map(lam).sum
      val u = (h32(s"$salt:$id").toDouble + 0.5) / 4294967296.0
      (w, w + math.round(-math.log(-math.log(u)) * 1e6))
    }
    val got = Dsir.resample(docs, lam, "text", "id", b, k = 8, salt = "sA")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keys match the hand formula exactly
    got.foreach { case (id, w, key) =>
      val (hw, hk) = handKey(id, s"doc $id body words here", "sA")
      assert(w == hw && key == hk, s"doc $id: ($w,$key) != hand ($hw,$hk)")
    }
    // the drawn set IS the top-8 hand keys
    val wantTop = (1L to 40L)
      .map(i => i -> handKey(i, s"doc $i body words here", "sA")._2)
      .sortBy { case (i, k) => (-k, i) }.take(8).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
    // content-stable: a rerun draws the identical set
    val again = Dsir.resample(docs, lam, "text", "id", b, k = 8, salt = "sA")
      .collect().map(_.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
    // a different salt draws an independent (here: different) set
    val other = Dsir.resample(docs, lam, "text", "id", b, k = 8, salt = "sB")
      .collect().map(_.getLong(0)).toSet
    assert(other != got.map(_._1).toSet,
      s"different salts should draw different sets: $other")
  }

  test("scoring plan shape: zero-shuffle map over the corpus, TakeOrdered selection") {
    val docs = (1L to 100L).map(i => (i, s"doc number $i words here")).toDF("id", "text")
    val lam = Dsir.logRatios(docs.filter($"id" <= 20), docs, "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plan = Dsir.select(docs, lam, "text", "id", 32, budget = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must plan as distributed top-k, not a global sort:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring must not shuffle the corpus:\n$plan")
  }

  test("empty corpora fit to the all-smoothed table, never null lambdas") {
    // sum() over an empty count table is null; the totals must coalesce
    // to 0 or the collected λ rows NPE (ADVICE r16)
    val docs = Seq((1L, "big cats purr here")).toDF("id", "text")
    val empty = docs.limit(0)
    val b = 16
    for ((t, r) <- Seq((empty, docs), (docs, empty), (empty, empty))) {
      val lam = Dsir.logRatios(t, r, "text", b)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(lam.size == b, s"λ must still cover all $b buckets: ${lam.size}")
    }
    // empty target vs empty raw: the ratio is (1·b)/(1·b) = 1 → λ = 0
    val zero = Dsir.logRatios(empty, empty, "text", b)
      .collect().map(_.getLong(1)).toSet
    assert(zero == Set(0L), s"empty-vs-empty λ must be all zero: $zero")
  }

  test("bucket count is bounded by what the λ map literal tolerates (64k)") {
    val docs = Seq((1L, "big cats purr here")).toDF("id", "text")
    val bMax = 1 << 16
    // boundary accepted: the fit covers all 65536 buckets
    val atMax = Dsir.logRatios(docs, docs, "text", bMax)
    assert(atMax.count() == bMax.toLong)
    // one past refused, at fit time and at both scoring verbs
    intercept[IllegalArgumentException](
      Dsir.logRatios(docs, docs, "text", bMax + 1))
    intercept[IllegalArgumentException](
      Dsir.select(docs, Map(0L -> 1L), "text", "id", bMax + 1, budget = 1))
    intercept[IllegalArgumentException](
      Dsir.resample(docs, Map(0L -> 1L), "text", "id", bMax + 1, k = 1, salt = "s"))
  }
}
