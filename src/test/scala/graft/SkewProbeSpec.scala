package graft

/** CI-grade skew gate (VERDICT r14 #1–2): runs the whole SkewProbe —
  * ingest/exact/segment/star dedup window-vs-agg timings plus the ANN
  * hot-cell/hot-bucket work-tracking criterion — inside `sbt test` on
  * the sf0.001 tables, so a regression of any dedup kernel back to a
  * content-keyed window (or an ANN kernel acquiring a task cliff)
  * fails CI instead of waiting for a human-launched probe run.
  *
  * iters=2 and ratio=4 on purpose: the timing criteria are
  * noise-sensitive at fixture scale on shared CI hardware (ADVICE
  * r14) — sub-second baselines mean one GC pause can exceed even the
  * widened band at iters=1 (ADVICE r15), so each shape takes the min
  * of two runs and the band stays widened — at sf0.001 the agg shapes measure
  * well under 2× their windows on a quiet host, and 4× still fails
  * hard if a window shape sneaks back (the window becomes the
  * *library* side and the criterion inverts into ~1×, never >4×...
  * the real tripwire is the SHAPE-equivalence requires plus the
  * d01/d02/d05 plan pins in PlanSpec; the timing gate is the backstop
  * for a kernel that keeps its row counts but regresses its scaling
  * shape). Authoritative numbers still come from the quiet-host
  * sf0.1 main (`runMain graft.SkewProbe`).
  */
class SkewProbeSpec extends SparkSpec {
  test("skew probe passes its exit criteria on the sf0.001 fixture") {
    val failures = SkewProbe.run(spark, sfDir, hotPct = 20, iters = 2, ratio = 4.0)
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
