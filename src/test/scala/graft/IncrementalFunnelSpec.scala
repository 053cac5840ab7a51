package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries
import graft.sources.KwiSnapshots

import java.nio.file.Files

/** Pins the incremental curation funnel (incremental_funnel) against
  * its full-rebuild twin (curation_funnel) — including the hardest
  * incremental case, which the sf corpora may not contain naturally:
  * a NEW doc whose near-dup edges bridge TWO existing commit-1
  * clusters, forcing the incremental component merge to fuse state
  * components exactly as a from-scratch rebuild would.
  */
class IncrementalFunnelSpec extends SparkSpec {

  // base-26, 3 letters — unique letter-only tokens for i < 17576
  // (a 2-letter version overflows past 'z' at i >= 676 and collapses
  // distinct fillers into accidental near-dups)
  private def word(i: Int) =
    s"${('a' + (i / 676) % 26).toChar}${('a' + (i / 26) % 26).toChar}${('a' + i % 26).toChar}zz"

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("incrfunnel").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("incremental == full rebuild when a new doc bridges two old clusters") {
    // ids 0..21 → cutoff = max(10, 11) = 11: batch1 = 0..10, batch2 = 11..21.
    // Cluster A (batch1): docs 7, 8 — same 30-token text, 2-token tail edit.
    // Cluster B (batch1): docs 9, 10 — a different 30-token family.
    // Bridge (batch2): doc 15 = 20 tokens of A + 20 tokens of B —
    //   jaccard ≥ 0.3 with BOTH clusters, so a full rebuild yields ONE
    //   component {7,8,9,10,15}; the incremental path must merge the
    //   two commit-1 star components through the new×old pairs.
    val aToks = (100 until 130).map(word)
    val bToks = (200 until 230).map(word)
    val docA1 = aToks.mkString(" ")
    val docA2 = (aToks.dropRight(2) ++ Seq(word(400), word(401))).mkString(" ")
    val docB1 = bToks.mkString(" ")
    val docB2 = (bToks.dropRight(2) ++ Seq(word(402), word(403))).mkString(" ")
    val bridge = (aToks.take(20) ++ bToks.take(20)).mkString(" ")
    val fillers = (0 until 7).map(i =>
      i.toLong -> (1000 + 40 * i until 1000 + 40 * i + 25).map(word).mkString(" "))
    val batch2Fill = Seq(11L, 12L, 20L, 21L).zipWithIndex.map { case (id, i) =>
      id -> (3000 + 40 * i until 3000 + 40 * i + 25).map(word).mkString(" ") }
    val rows = fillers ++ Seq(7L -> docA1, 8L -> docA2, 9L -> docB1,
      10L -> docB2, 15L -> bridge) ++ batch2Fill
    val dir = corpus(rows)

    // the full rebuild really does see one merged cluster (sanity of
    // the fixture, via the declared components view)
    val comps = TextQueries.queries("dedup_components")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps.get(7L).contains(5L),
      s"fixture must merge into one 5-doc component rooted at 7; got $comps")

    val full = TextQueries.queries("curation_funnel")(spark, dir).collect()(0)
    val incr = TextQueries.queries("incremental_funnel")(spark, dir).collect()(0)
    assert(incr.toSeq == full.toSeq,
      s"incremental funnel drifted from full rebuild: $incr vs $full")
  }

  test("snapshotDiff 1..2 of the store reads only batch2 shards") {
    // the sf0.001 run builds its store under target/graft-builds; force
    // the build, then inspect the manifests the incremental read used
    TextQueries.queries("incremental_funnel")(spark, sfDir).collect()
    val path = graft.queries.Tables.buildPath(sfDir, "incr-funnel")
    assert(KwiSnapshots.versions(path) == Seq(1, 2))
    val diff = KwiSnapshots.resolveDiff(path, "1..2")
      .map(f => java.nio.file.Paths.get(f).getFileName.toString)
    assert(diff.nonEmpty && diff.forall(_.startsWith("batch2-")),
      s"diff must be exactly the second commit's shards, got $diff")
    val v1 = KwiSnapshots.resolve(path, "1")
      .map(f => java.nio.file.Paths.get(f).getFileName.toString)
    assert(v1.nonEmpty && v1.forall(_.startsWith("batch1-")), v1.toString)
  }
}
