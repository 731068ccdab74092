package graft.etl

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("update replaces, new key inserts, untouched persists, explicit null wins") {
    val existing = Seq((1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (3L, Option("c"), 30.0)).toDF("k", "s", "v")
    val updates = Seq((2L, Option("B"), 99.0), (4L, None: Option[String], 40.0))
      .toDF("k", "s", "v")
    val merged = Upsert.upsert(existing, updates, Seq("k"))
      .orderBy("k").as[(Long, Option[String], Double)].collect().toSeq
    assert(merged == Seq(
      (1L, Some("a"), 10.0),   // untouched persists
      (2L, Some("B"), 99.0),   // replaced wholesale
      (3L, Some("c"), 30.0),
      (4L, None, 40.0)))       // inserted; its null field stays null
  }

  test("strict mode rejects duplicate update keys (MERGE multiple-match)") {
    val existing = Seq((1L, "a")).toDF("k", "s")
    val dupUpdates = Seq((2L, "x"), (2L, "y")).toDF("k", "s")
    // default: caller's responsibility — duplicates fan out
    assert(Upsert.upsert(existing, dupUpdates, Seq("k")).count() == 3)
    // strict: the plan itself raises
    val e = intercept[Exception] {
      Upsert.upsert(existing, dupUpdates, Seq("k"), strict = true).count()
    }
    assert(e.getMessage.contains("duplicate key") ||
      e.getCause != null && e.getCause.getMessage.contains("duplicate key"))
    // strict passes through clean updates untouched
    val clean = Seq((2L, "x"), (3L, "y")).toDF("k", "s")
    assert(Upsert.upsert(existing, clean, Seq("k"), strict = true).count() == 3)
  }

  test("idempotent: upserting the same batch twice equals once") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("k", "s")
    val once = Upsert.upsert(existing, updates, Seq("k"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("cdc apply: latest seq wins, delete tombstones, delete-then-reinsert lives") {
    val log = Seq(
      (1L, "I", 1L, "a1"), (1L, "U", 2L, "a2"),                    // update wins
      (2L, "I", 1L, "b1"), (2L, "D", 2L, "gone"),                  // tombstoned
      (3L, "I", 1L, "c1"), (3L, "D", 2L, "x"), (3L, "I", 3L, "c2"),// re-inserted
      (4L, "I", 1L, "d1")                                          // plain insert
    ).toDF("k", "op", "seq", "v")
    val got = Upsert.applyCdc(log, Seq("k"), "seq", "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2", 3L -> "c2", 4L -> "d1"))
  }

  test("cdc apply: same-seq tie breaks deterministically (op order), replay-stable") {
    // U and I at the same seq: 'U' > 'I' in the op tie-break, so the
    // update wins on every replay, regardless of input order
    val a = Seq((1L, "I", 5L, "ins"), (1L, "U", 5L, "upd")).toDF("k", "op", "seq", "v")
    val b = Seq((1L, "U", 5L, "upd"), (1L, "I", 5L, "ins")).toDF("k", "op", "seq", "v")
    for (log <- Seq(a, b))
      assert(Upsert.applyCdc(log, Seq("k"), "seq", "op")
        .select("v").as[String].collect().toSeq == Seq("upd"))
  }
}
