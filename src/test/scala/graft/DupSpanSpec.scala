package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

import java.nio.file.Files

/** Pins the two round-6 text queries' core semantics on crafted corpora
  * written as a documents.parquet (the declared queries read a data
  * dir, so the fixtures go through the same loader path). */
class DupSpanSpec extends SparkSpec {

  // letter-only (TextOps.tokens splits on [^a-z]+, so digits would
  // shred a "w7x"-style word into two tokens) and 4 chars so none
  // collides with the 2-letter gopher stopwords
  private def word(i: Int) = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}zz"

  /** Write a crafted documents table to a fresh dir; rows are
    * (doc_id, text, lang). */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("dupspan").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dup_span_stats finds exactly the planted shared run, correct length") {
    // docs 0 and 1 share ONE contiguous 9-token run; doc 2 is disjoint.
    // A 9-token run = 5 consecutive 5-shingles -> span_tokens = 5+4 = 9.
    val shared = (100 to 108).map(word).mkString(" ")
    val d0 = (0 to 19).map(word).mkString(" ") + " " + shared
    val d1 = shared + " " + (40 to 59).map(word).mkString(" ")
    val d2 = (70 to 99).map(word).mkString(" ")
    val dir = corpus(Seq((0L, d0, "en"), (1L, d1, "en"), (2L, d2, "en")))
    val got = TextQueries.queries("dup_span_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // one span: a=0, b=1, starting at shingle 20 in d0, 0 in d1, 9 tokens
    assert(got.toSeq == Seq((0L, 1L, 20L, 0L, 9L)))
  }

  test("dup_span_stats merges runs but splits on a single-token edit") {
    // identical 30-token docs except doc 1 replaces token 15 -> two
    // spans: tokens [0..14] (11 shingles -> 15 tokens) and [16..29]
    // (10 shingles -> 14 tokens)
    val base = (0 to 29).map(word)
    val edited = base.updated(15, "edited")
    val dir = corpus(Seq(
      (0L, base.mkString(" "), "en"), (1L, edited.mkString(" "), "en")))
    val got = TextQueries.queries("dup_span_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((0L, 1L, 0L, 0L, 15L), (0L, 1L, 16L, 16L, 14L)))
  }

  test("dup_span_trim_stats unions overlapping spans from two earlier partners") {
    // doc 2 shares tokens [0..14] with doc 0 and tokens [8..24] with
    // doc 1 — the two removal spans OVERLAP in [8..14] and must union
    // into ONE island of 25 tokens, not sum to 15+17=32
    val left = (100 to 114).map(word)    // 15 tokens (d0 ∩ d2)
    val right = (108 to 124).map(word)   // 17 tokens (d1 ∩ d2), overlaps by 7
    val victim = (100 to 124).map(word)  // 25 tokens = the union
    val d0 = left.mkString(" ") + " " + (200 to 219).map(word).mkString(" ")
    val d1 = (230 to 249).map(word).mkString(" ") + " " + right.mkString(" ")
    val d2 = victim.mkString(" ") + " " + (260 to 269).map(word).mkString(" ")
    val dir = corpus(Seq((0L, d0, "en"), (1L, d1, "en"), (2L, d2, "en")))
    val got = TextQueries.queries("dup_span_trim_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // victim doc 2: 35 tokens, one 25-token island removed, 10 kept.
    // docs 0/1 lose their LATER-side spans too (vs each other none —
    // d0 and d1 share only the [108..114] overlap via d2? no: d0∩d1
    // share tokens 108..114 = 7 tokens ≥ 2 shingles -> d1 is the later
    // doc and loses that 7-token span as well)
    val d2row = got.find(_._1 == 2L).get
    assert(d2row == (2L, 35L, 25L, 10L, 1L), s"got $got")
    // the d0∩d1 shared run [108..114] trims from the later doc 1
    val d1row = got.find(_._1 == 1L).get
    assert(d1row._3 == 7L && d1row._5 == 1L, s"got $got")
  }

  test("bloom pre-filter: member hashes always might-contain (no false negatives)") {
    import graft.operators.Dedup
    import spark.implicits._
    val members = Seq(0L, 3L, 77777L, 123456789L, 2147483646L)
    val bits = typedLit(Dedup.bloomBits(members))
    val got = members.toDF("h")
      .select(Dedup.bloomMightContain(col("h"), bits).as("m"))
      .collect().map(_.getBoolean(0))
    assert(got.forall(identity))
    // and the filter is not degenerate: most non-members miss
    val probes = (1000L to 1100L).filterNot(members.contains)
    val hits = probes.toDF("h")
      .select(Dedup.bloomMightContain(col("h"), bits).as("m"))
      .collect().count(_.getBoolean(0))
    assert(hits < probes.size / 2, s"bloom too dense: $hits of ${probes.size}")
  }

  test("gopher_quality_flags: rules discriminate as specified") {
    // doc 0: passes everything (60 words incl. >=2 gopher stopwords)
    val good = ("the quick brown fox jumps over and over with vigor " +
      (0 until 50).map(word).mkString(" "))
    // doc 1: too short (3 words)
    val short = "tiny doc here"
    // doc 2: symbol-heavy (## per word)
    val symb = (0 until 60).map(i => s"${word(i)}##").mkString(" ")
    val dir = corpus(Seq((0L, good, "en"), (1L, short, "en"), (2L, symb, "en")))
    val r = TextQueries.queries("gopher_quality_flags")(spark, dir).collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def f(n: String): Long = r.getLong(byName(n))
    assert(f("n_docs") == 3L)
    assert(f("pass_word_count") == 2L) // short doc fails
    assert(f("pass_symbol") == 2L) // symbol doc fails
    assert(f("pass_stop") == 1L) // only doc 0 has >= 2 distinct stopwords
    assert(f("pass_all") == 1L)
  }
}
