package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench calibration contract (no Spark involved): a machine-load
  * burst localized MID-suite slows a contiguous block of queries but not
  * the suite-level pre/post probes — exactly the shape that produced 7
  * ghost regressions in round 5 (3 in r4, 6 in r3), each costing a judge
  * re-run. `Bench.timeSuite` takes one probe measurement immediately
  * before each query's timed block, so the per-query LOCAL ratio
  * (median / probe_local) absorbs the burst while the global ratio
  * (median / suite probe) spikes — flagged queries self-adjudicate.
  */
class BenchHarnessSpec extends AnyFunSuite {

  test("synthetic mid-suite load burst: local ratios hold, global ratios spike") {
    // Simulated machine: every unit of work (queries AND probe — a real
    // burst slows both) takes `load`× longer. The burst covers queries
    // 3..6 inclusive, turned on/off by the per-query probe call, which
    // timeSuite guarantees runs first in each block.
    val blockMs = 12.0
    var load = 1.0
    var probeCalls = 0
    def spin(): Double = {
      val t0 = System.nanoTime()
      val target = blockMs * load * 1e6
      while (System.nanoTime() - t0 < target) {}
      (System.nanoTime() - t0) / 1e9
    }
    def probe(): Double = {
      // timeSuite takes LocalProbeRuns probes per block, always first in
      // the block — the query index is the probe-call count / that.
      val qIndex = probeCalls / Bench.LocalProbeRuns
      probeCalls += 1
      load = if (qIndex >= 3 && qIndex <= 6) 3.0 else 1.0
      spin()
    }
    val names = (0 until 10).map(i => f"q$i%02d")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val timings = Bench.timeSuite(names, _ => spin(), () => probe(), n = 3, errors)

    assert(errors.isEmpty)
    assert(timings.map(_._1) == names)
    // suite-level probe taken on the quiet machine (as pre/post probes
    // would be: the burst is over before the post-probe runs)
    val suiteProbe = blockMs / 1e3
    val global = timings.map { case (n, t) => n -> t.median / suiteProbe }.toMap
    val local = timings.map { case (n, t) => n -> t.median / t.probeLocal }.toMap
    // every local ratio ≈ 1: the pre-block probe saw the same machine
    local.foreach { case (n, r) =>
      assert(r > 0.5 && r < 1.6, s"$n local ratio $r should self-adjudicate")
    }
    // the burst block's GLOBAL ratios spike past the 2× regression bar —
    // this is the false positive the local ratio exists to dismiss
    Seq("q03", "q04", "q05", "q06").foreach { n =>
      assert(global(n) > 2.0, s"$n global ratio ${global(n)} should show the burst")
    }
    Seq("q00", "q01", "q02", "q07", "q08", "q09").foreach { n =>
      assert(global(n) < 1.6, s"$n global ratio ${global(n)} is outside the burst")
    }
  }

  test("BASELINE.md calibration sanity: no baseline row's local ratio sits far below its global ratio") {
    // The local probe runs fully warm between query blocks, so its median
    // reads FASTER than the suite probe (which includes cold start/end
    // runs) — baseline ratio_local must sit at or above ~the global
    // ratio. A row violating this means the baseline's local probe ran
    // SLOW (a blip deflated the denominator), which is exactly the
    // round-6 miscalibration that made the driver's flags need judge
    // adjudication: regenerate the table with median-of-3 probes.
    val lines = scala.io.Source.fromFile("BASELINE.md", "UTF-8").getLines().toList
    val table = lines
      .dropWhile(!_.startsWith("| query | median sec"))
      .drop(2) // header + separator
      .takeWhile(_.startsWith("| q"))
    assert(table.size >= 100, s"baseline per-query table not found (${table.size} rows)")
    val bad = table.flatMap { l =>
      val cols = l.split("\\|").map(_.trim).filter(_.nonEmpty)
      val (name, ratio, ratioLocal) = (cols(0), cols(2).toDouble, cols(3).toDouble)
      if (ratioLocal >= ratio * 0.8) None
      else Some(s"$name: ratio_local $ratioLocal < 0.8 x ratio $ratio")
    }
    assert(bad.isEmpty,
      s"miscalibrated baseline rows (local probe ran slow — regenerate):\n${bad.mkString("\n")}")
  }

  test("headline line stays under 2000 bytes at full suite width (the parsed:null regression)") {
    // 300 synthetic queries — ~2x the real suite — with long names, plus
    // a full error map with long messages: the WORST realistic shape.
    // Rounds 6 and 7 both shipped a ~15k-char line the driver truncated
    // before json.loads, recording parsed:null; the short-line contract
    // is what makes per-query numbers reach the driver at all.
    val timings = (1 to 300).map(i =>
      f"q_some_quite_long_query_name_$i%03d" -> Bench.Timing(123.456789, 0.123456))
    val errors = scala.collection.mutable.LinkedHashMap(
      (1 to 50).map(i => f"q_err_$i%02d" -> ("boom " * 50)): _*)
    val line = Bench.renderHeadline(timings, errors, 0.1234567, 5,
      "bench_detail.json", "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length < 2000,
      s"headline must stay driver-parseable, got ${line.length} chars")
    // and it is valid JSON by construction — balanced quotes/braces at least
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // the sidecar keeps everything
    val detail = Bench.renderDetail(timings, errors, 0.1234567, 5, "sf")
    assert((1 to 300).forall(i => detail.contains(f"q_some_quite_long_query_name_$i%03d")))
  }

  test("headline is a prefix-free single bare line (the r8 framing postmortem)") {
    // Round 8's headline was intact in the driver's captured tail but
    // sbt-framed — "[info] " prefix, WARN flood around it, "[success]"
    // after — and the parser still recorded parsed:null. The contract:
    // the rendered line is ONE line, starting at byte 0 with '{' and
    // ending with '}', no interior newlines, so that printed raw onto
    // the process stdout fd (Bench.main after spark.stop(), with
    // build.sbt's StdoutOutput pass-through) it reaches the driver as a
    // bare parseable JSON line.
    val timings = Seq("q_a" -> Bench.Timing(1.0, 0.1))
    val line = Bench.renderHeadline(timings,
      scala.collection.mutable.LinkedHashMap("q_b" -> "err\nwith newline"),
      0.1, 5, "bench_detail.json", "/sf")
    assert(line.head == '{' && line.last == '}', s"not brace-framed: $line")
    assert(!line.contains('\n') && !line.contains('\r'),
      "the headline must be one physical line even when error messages hold newlines")
  }

  test("a query failing mid-block is demoted to errors, not propagated") {
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val timings = Bench.timeSuite(Seq("ok", "boom", "ok2"),
      n => if (n == "boom") sys.error("kaput"),
      () => 0.001, n = 2, errors)
    assert(timings.map(_._1) == Seq("ok", "ok2"))
    assert(errors.keySet == Set("boom") && errors("boom").contains("kaput"))
  }

  // ---- budget governor + partial evidence (VERDICT r15 item 1) --------

  test("planRuns law: full N when comfortable, downshift to 3 then 1, skip before blowing the budget") {
    // warm=2s, probe=0.2s → estimate(N=5) = 0.5 + 3*0.2 + 5*2 = 11.1
    val warm = Some(2.0)
    assert(Bench.planRuns(remainSec = 60.0, warm, 1.0, 0.2, 5) == 5)
    assert(Bench.planRuns(remainSec = 14.43, warm, 1.0, 0.2, 5) == 5) // 11.1*1.3
    // below the full-N fence but above the 3-run fence (est3=7.1 → 8.52)
    assert(Bench.planRuns(remainSec = 10.0, warm, 1.0, 0.2, 5) == 3)
    // above the 1-run fence (est1=3.1 → 3.41) but below 3-run
    assert(Bench.planRuns(remainSec = 4.0, warm, 1.0, 0.2, 5) == 1)
    // nothing fits: skip
    assert(Bench.planRuns(remainSec = 2.0, warm, 1.0, 0.2, 5) == 0)
    assert(Bench.planRuns(remainSec = -5.0, warm, 1.0, 0.2, 5) == 0)
    // unwarmed entry estimates from the fallback median
    assert(Bench.planRuns(remainSec = 60.0, None, 2.0, 0.2, 5) == 5)
    assert(Bench.planRuns(remainSec = 2.0, None, 2.0, 0.2, 5) == 0)
  }

  test("timeSuite skips entries the governor zeroes — recorded in skipped, never run, never errors") {
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    val timings = Bench.timeSuite(Seq("a", "b", "c", "d"),
      n => { ran += n; () }, () => 0.001, n = 5, errors,
      nFor = qn => if (qn == "b" || qn == "d") 0 else 2,
      skipped = skipped)
    assert(timings.map(_._1) == Seq("a", "c"))
    assert(skipped.toSeq == Seq("b", "d"))
    assert(!ran.contains("b") && !ran.contains("d"))
    assert(errors.isEmpty)
    // a downshifted entry records its actual run count
    assert(timings.forall(_._2.nRuns == 2))
  }

  test("onTimed fires after every completed entry — the incremental flush seam") {
    val flushed = scala.collection.mutable.ArrayBuffer[Int]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    var count = 0
    Bench.timeSuite(Seq("a", "boom", "c"),
      n => if (n == "boom") sys.error("kaput"),
      () => 0.001, n = 1, errors,
      onTimed = (_, _) => { count += 1; flushed += count })
    // fired for a and c; boom failed before its onTimed
    assert(flushed.toSeq == Seq(1, 2))
  }

  test("headline with a near-total skip list stays driver-parseable (count + head, not the full list)") {
    val timings = (1 to 5).map(i => f"q_done_$i%02d" -> Bench.Timing(1.0, 0.1))
    val skipped = (1 to 240).map(i => f"q_some_quite_long_query_name_$i%03d")
    val line = Bench.renderHeadline(timings, Map.empty[String, String],
      0.15, 5, "bench_detail.json", "/sf", skipped, partial = true, nTotal = 247)
    assert(line.getBytes("UTF-8").length < 2000,
      s"headline with skips must stay short, got ${line.length} chars")
    assert(line.contains("\"n_skipped\":240"))
    assert(line.contains("\"partial\":true"))
    assert(!line.contains('\n'))
    assert(line.head == '{' && line.last == '}')
  }

  test("detail sidecar carries the full skipped list, partial flag, and per-entry run counts") {
    val timings = Seq(
      "q_full" -> Bench.Timing(1.0, 0.1, 7L, 5),
      "q_shifted" -> Bench.Timing(2.0, 0.1, 9L, 3))
    val detail = Bench.renderDetail(timings, Map.empty[String, String], 0.15, 5,
      "/sf", skipped = Seq("q_a", "q_b"), partial = true)
    assert(detail.contains(""""partial":true"""))
    assert(detail.contains(""""skipped":["q_a","q_b"]"""))
    assert(detail.contains(""""n_timed_runs":{"q_full":5,"q_shifted":3}"""))
  }

  test("suiteOrder law: seed 0 is alphabetical; other seeds are stable full " +
      "permutations that rotate the tail; headline records the seed") {
    val names = (1 to 40).map(i => f"q_entry_$i%02d")
    assert(Bench.suiteOrder(names, 0) == names.sorted,
      "seed 0 must reproduce the legacy alphabetical order")
    val s17 = Bench.suiteOrder(names, 17)
    assert(s17.sorted == names.sorted, "a permutation keeps every entry")
    assert(s17 == Bench.suiteOrder(names, 17), "same seed -> same order")
    assert(s17 != names.sorted, "a non-zero seed must actually rotate")
    val s18 = Bench.suiteOrder(names, 18)
    assert(s18 != s17, "consecutive seeds produce different orders")
    // the governor skips the order's TAIL — rotation must change it
    assert(s17.takeRight(5).toSet != s18.takeRight(5).toSet ||
      s17.takeRight(5) != s18.takeRight(5),
      "rotating seeds must not starve a fixed tail")
    val line = Bench.renderHeadline(
      Seq("q_a" -> Bench.Timing(1.0, 0.1, 3L, 5)),
      Map.empty[String, String], 0.15, 5, "d.json", "/sf", orderSeed = 17)
    assert(line.contains(""""order_seed":17"""), line)
  }
}
