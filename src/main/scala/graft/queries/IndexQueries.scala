package graft.queries

import graft.{QueryDef, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing structures: the inverted index (search/retrieval),
  * asymmetric shingle containment (quote/subset detection — what
  * symmetric Jaccard misses), and the n-gram LM table (the classic
  * data-quality scorer's backbone). All exact and oracle-gated. */
object IndexQueries {

  /** INVERTED INDEX build (bigram term → df, tf, bounded posting list)
    * in the TWO-PASS shape: pass 1 computes df/tf per term and filters
    * to the useful band (df ∈ [3, 50] — drops hapaxes AND would drop
    * stopword-grade terms); pass 2 collects postings ONLY for
    * qualifying terms. The order matters at scale: a single-pass
    * collect_list would materialize a hot term's full posting array in
    * one aggregation buffer before any truncation could bite — the
    * df-filter-then-join form never builds a hot term's postings at
    * all. Terms are BIGRAMS (phrase search's unit; the corpus'
    * unigram vocabulary is ~31 tokens, all stopword-grade — every
    * real index drops that band). Postings are sorted, truncated to
    * 10, and CSV-serialized (driver compare sorts rows in pandas,
    * where raw array cells are unhashable — the f05 rule).
    *
    * 100 TB: explode + two term-keyed shuffles; AQE broadcasts the
    * filtered stats side when small. The df band is the skew guard. */
  val ix01InvertedIndex = QueryDef("ix01_inverted_index",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.shinglesAll(col("text"), 2)).as("term"))
      val stats = toks.groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .filter(col("df").between(3, 50))
      toks.join(stats, Seq("term"))
        .groupBy("term", "df", "tf")
        .agg(array_join(
          slice(sort_array(collect_set(col("doc_id"))), 1, 10)
            .cast("array<string>"), ",").as("postings10"))
        .orderBy("term")
    },
    Some("""WITH tok AS (SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
           |    generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS i
           |  FROM documents),
           |term AS (SELECT a.doc_id, a.w || ' ' || b.w AS term
           |         FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1)
           |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf,
           |  array_to_string(list_sort(list_distinct(list(doc_id)))[1:10], ',') AS postings10
           |FROM term GROUP BY term
           |HAVING COUNT(DISTINCT doc_id) BETWEEN 3 AND 50
           |ORDER BY term""".stripMargin))

  /** ASYMMETRIC SHINGLE CONTAINMENT (Broder's containment, the
    * quote/excerpt detector): C(A,B) = |S(A) ∩ S(B)| / |S(A)| ≥ 0.9
    * flags probe A as essentially contained in document B — a relation
    * symmetric Jaccard structurally misses when |A| ≪ |B| (the small
    * quote inside the big doc drags J below any useful threshold while
    * containment sits at 1.0). The probe side is CONSTRUCTED quotes —
    * the first 8 tokens of every 20th doc — so every probe has a known
    * true source (containment exactly 1.0 there) and the oracle
    * verifies both the detector's hits and its integer arithmetic:
    * the threshold applies as the cross-multiply 10·inter ≥ 9·|S(A)|
    * and the reported value divides two exactly-determined integers.
    * Intersections come from the shingle inverted index (pairs only
    * where a shingle is shared — never all-pairs), and cross-only
    * pairing (probe × corpus) keeps fan-out output-bound (the dc03
    * lesson: corpus near-dup families never pair among themselves).
    *
    * Reference: the dedup pass in load_hhs.py:98-105 is exact-key
    * only; containment is the extension its quote-heavy analogue
    * would need. */
  val dd12Containment = QueryDef("dd12_containment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val ex = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("ex_id"),
          concat_ws(" ", slice(TextFunctions.tokens(col("text")), 1, 8)).as("text"))
      val esh = ex.select(col("ex_id"),
        explode(TextFunctions.shingles(col("text"), 2)).as("s"))
      val dsh = docs.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 2)).as("s"))
      val sizes = esh.groupBy("ex_id").agg(count(lit(1)).as("n"))
      val inter = esh.join(dsh, Seq("s"))
        .groupBy("ex_id", "doc_id").agg(count(lit(1)).as("inter"))
      inter.join(sizes, Seq("ex_id"))
        .filter(col("inter") * 10 >= col("n") * 9)
        .select(col("ex_id"), col("doc_id"), col("inter"), col("n"),
          round(col("inter").cast("double") / col("n").cast("double"), 6)
            .as("containment"))
        .orderBy("ex_id", "doc_id")
    },
    Some("""WITH ex AS (SELECT doc_id AS ex_id,
           |        array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:8], ' ') AS text
           |      FROM documents WHERE doc_id % 20 = 0),
           |etok AS (SELECT ex_id, unnest(regexp_split_to_array(text, '\s+')) AS w,
           |        generate_subscripts(regexp_split_to_array(text, '\s+'), 1) AS i FROM ex),
           |esh AS (SELECT DISTINCT a.ex_id, a.w || ' ' || b.w AS s
           |        FROM etok a JOIN etok b ON b.ex_id = a.ex_id AND b.i = a.i + 1),
           |dtok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
           |        generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS i FROM documents),
           |dsh AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS s
           |        FROM dtok a JOIN dtok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
           |sizes AS (SELECT ex_id, COUNT(*) AS n FROM esh GROUP BY ex_id),
           |inter AS (SELECT e.ex_id, d.doc_id, COUNT(*) AS inter
           |          FROM esh e JOIN dsh d ON e.s = d.s GROUP BY 1, 2)
           |SELECT i.ex_id, i.doc_id, i.inter, z.n,
           |  round(CAST(i.inter AS DOUBLE) / CAST(z.n AS DOUBLE), 6) AS containment
           |FROM inter i JOIN sizes z USING (ex_id)
           |WHERE i.inter * 10 >= z.n * 9
           |ORDER BY ex_id, doc_id""".stripMargin))

  /** BIGRAM NEXT-TOKEN TABLE (the n-gram LM the KenLM-style quality
    * scorers train): for every context token seen ≥ 100 times, the
    * top-3 next tokens by count with a deterministic (count DESC,
    * token ASC) tie-break. Counts are exact integers; the rank is a
    * per-context row_number (qf01 shape). Context totals ride the same
    * aggregation's window — no second scan.
    *
    * 100 TB: bigram extraction is row-local (the ds01 lesson — no join
    * builds n-grams); one shuffle by (ctx, nxt) to count, one by ctx
    * to rank. Stopword contexts are hot keys: the windowed top-k here
    * is fine because rows-per-context is already collapsed to DISTINCT
    * next tokens; raw-event top-k under skew goes through TopKAgg's
    * heap (w05) instead. */
  val lm01BigramNext = QueryDef("lm01_bigram_next",
    (s, d) => {
      val pairs = Tables.documents(s, d)
        .select(explode(TextFunctions.shinglesAll(col("text"), 2)).as("sh"))
        .select(split(col("sh"), " ").getItem(0).as("ctx"),
          split(col("sh"), " ").getItem(1).as("nxt"))
        .groupBy("ctx", "nxt").agg(count(lit(1)).as("cnt"))
      val byCtx = Window.partitionBy("ctx")
      val ranked = pairs
        .withColumn("ctx_total", sum(col("cnt")).over(byCtx))
        .withColumn("rk", row_number().over(
          byCtx.orderBy(col("cnt").desc, col("nxt"))).cast("long"))
      ranked.filter(col("ctx_total") >= 100 && col("rk") <= 3)
        .select(col("ctx"), col("nxt"), col("cnt"), col("ctx_total"), col("rk"))
        .orderBy("ctx", "rk")
    },
    Some("""WITH tok AS (SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
           |    generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS i
           |  FROM documents),
           |big AS (SELECT a.w AS ctx, b.w AS nxt, COUNT(*) AS cnt
           |        FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
           |        GROUP BY 1, 2),
           |r AS (SELECT ctx, nxt, cnt,
           |        CAST(SUM(cnt) OVER (PARTITION BY ctx) AS BIGINT) AS ctx_total,
           |        ROW_NUMBER() OVER (PARTITION BY ctx
           |          ORDER BY cnt DESC, nxt) AS rk
           |      FROM big)
           |SELECT ctx, nxt, cnt, ctx_total, CAST(rk AS BIGINT) AS rk
           |FROM r WHERE ctx_total >= 100 AND rk <= 3
           |ORDER BY ctx, rk""".stripMargin))

  val all: Seq[QueryDef] = Seq(ix01InvertedIndex, dd12Containment, lm01BigramNext)
}
