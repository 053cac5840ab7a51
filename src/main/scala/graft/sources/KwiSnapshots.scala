package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot manifests for `.kwi` DSv2 directory stores — the
  * time-travel layer every lakehouse table format (Delta, Iceberg,
  * Hudi — all public designs) builds on the same two ideas: an
  * immutable data-file set per commit, and a tiny versioned manifest
  * that names the files belonging to each version.
  *
  * Mechanics here: every DSv2 commit writes `_snapshot-NNNNN.txt`
  * (tmp + atomic rename) listing the live shard BASENAMES after that
  * commit, so the directory stays relocatable. Reads are unchanged by
  * default (directory listing — zero behavior change for existing
  * stores). Crash contract, stated precisely: a crash between the
  * shard renames and the manifest write never loses DATA (the shards
  * are on disk and every default directory-listing read sees them),
  * but it does fork the two read paths permanently — each later
  * commit bases itself on the PREVIOUS MANIFEST, not the listing
  * (deliberately: the listing would resurrect archived shards after a
  * retain-mode overwrite, and an orphan from a crash is
  * indistinguishable from an archived shard), so the orphaned shards
  * stay visible to listing reads and absent from every snapshot,
  * including `latest`. Recovery from such a crash is explicit, not
  * silent: re-append the orphaned shards (re-run the failed batch) or
  * read the store by directory listing; passing
  * `option("snapshot", "3")` (or `"latest"`) resolves the file set
  * from that manifest instead. `overwrite` + `option("retain","true")`
  * keeps the replaced shards on disk — archive mode, where historical
  * versions stay readable and `vacuum` is the explicit space-reclaim
  * step; a store in archive mode should always be read through a
  * snapshot option, since the raw directory then holds shards from
  * MULTIPLE versions.
  *
  * Single-writer discipline (same as the shard writer's): concurrent
  * committers may race the next version number; the format's contract
  * has always been one writer per store. That discipline covers
  * `vacuum` vs READERS too: `files()` verifies shard existence at
  * PLANNING time, so a vacuum deleting a shard after a snapshot read
  * planned but before its tasks open the file surfaces as a raw task
  * IO error, not the "vacuumed shard" diagnostic — vacuum is a
  * maintenance operation to run when no snapshot read is in flight
  * (the same offline-compaction window every table format schedules).
  */
object KwiSnapshots {

  // {5,}: %05d pads to five digits but WIDENS past 99999 commits — a
  // five-digit-exact match would make version 100000+ invisible to
  // latest() and silently re-base every later commit on stale history
  private val Pattern = """_snapshot-(\d{5,})\.txt""".r

  private def manifestPath(dir: String, v: Int): Path =
    Paths.get(dir, f"_snapshot-$v%05d.txt")

  /** All manifest versions present, ascending. */
  def versions(dir: String): Seq[Int] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala.flatMap { f =>
      f.getFileName.toString match {
        case Pattern(n) => Some(n.toInt)
        case _ => None
      }
    }.toSeq.sorted
    finally s.close()
  }

  def latest(dir: String): Option[Int] = versions(dir).lastOption

  /** Shard files (absolute paths, sorted) belonging to version `v`.
    * Fails loudly on a missing manifest or a manifest naming a shard
    * that no longer exists (vacuumed) — a silent partial read would
    * masquerade as a smaller table. */
  def files(dir: String, v: Int): Seq[String] = {
    val mf = manifestPath(dir, v)
    require(Files.exists(mf),
      s"kwi snapshot $v does not exist at $dir (have: ${versions(dir).mkString(",")})")
    val names = Files.readAllLines(mf).asScala.filter(_.nonEmpty).toSeq
    names.map { n =>
      val f = Paths.get(dir, n)
      require(Files.exists(f),
        s"kwi snapshot $v references vacuumed shard $n — vacuum kept fewer versions than this read needs")
      f.toString
    }.sorted
  }

  /** Resolve a read-option value: "latest" or a version number. */
  def resolve(dir: String, opt: String): Seq[String] = {
    val v =
      if (opt.equalsIgnoreCase("latest"))
        latest(dir).getOrElse(
          throw new IllegalArgumentException(s"no kwi snapshots at $dir"))
      else opt.toInt
    files(dir, v)
  }

  /** Incremental diff read `from..to`: the shards IN version `to` but
    * NOT in version `from` — i.e. exactly the records appended between
    * the two commits (append-only histories; an overwrite in the range
    * makes "new shards" mean the post-overwrite set, which is still
    * the correct re-process set for an incremental consumer). This is
    * the consume-only-what-changed primitive an incremental 100 TB
    * pipeline schedules on: each run reads `lastProcessed..latest`
    * instead of the whole store. */
  def resolveDiff(dir: String, opt: String): Seq[String] = {
    val m = opt.split("\\.\\.", 2)
    require(m.length == 2 && m(0).nonEmpty && m(1).nonEmpty,
      s"snapshotDiff must be '<from>..<to>' (e.g. '1..3' or '2..latest'), got '$opt'")
    def ver(s: String): Int =
      if (s.equalsIgnoreCase("latest"))
        latest(dir).getOrElse(
          throw new IllegalArgumentException(s"no kwi snapshots at $dir"))
      else s.toInt
    val (from, to) = (ver(m(0)), ver(m(1)))
    require(from <= to, s"snapshotDiff range is backwards: $from..$to")
    // existence check BEFORE filesRaw: a vacuumed `from` would
    // otherwise read as an empty base and silently return ALL of
    // `to`'s shards as "new"
    require(Files.exists(manifestPath(dir, from)),
      s"kwi snapshot $from does not exist at $dir (have: ${versions(dir).mkString(",")})")
    val base = filesRaw(dir, from).toSet
    files(dir, to).filterNot(f => base(Paths.get(f).getFileName.toString))
  }

  /** Record the next version's live set and return its number. The
    * base set comes from the PREVIOUS manifest when one exists (the
    * directory listing would wrongly resurrect archived shards after
    * a retain-mode overwrite), falling back to the listing for stores
    * that predate snapshots; `truncate` empties the base; `added` are
    * this commit's new shard basenames. tmp + ATOMIC_MOVE so readers
    * never see a torn manifest. */
  def commit(dir: String, truncate: Boolean, added: Seq[String]): Int = {
    val prev = latest(dir) // one directory listing serves base AND version
    val base: Set[String] =
      if (truncate) Set.empty
      else prev match {
        case Some(v) => filesRaw(dir, v).toSet
        case None => KwiDataSource.filesOf(dir)
          .map(f => Paths.get(f).getFileName.toString).toSet
      }
    val live = (base ++ added).toSeq.sorted
    val v = prev.getOrElse(0) + 1
    val tmp = Paths.get(dir, f"_snapshot-$v%05d.txt.tmp")
    Files.write(tmp, live.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, manifestPath(dir, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Drop history: keep the newest `keepLast` manifests, delete older
    * ones, then delete every `.kwi` shard referenced ONLY by the
    * dropped history (current unreferenced-but-present shards — e.g.
    * an append racing this vacuum — are kept: only files that some
    * DELETED manifest names and no KEPT manifest names are removed).
    * Returns (shardsDeleted, manifestsDeleted). */
  def vacuum(dir: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "vacuum must keep at least the latest snapshot")
    val vs = versions(dir)
    val (drop, keep) = vs.splitAt((vs.length - keepLast).max(0))
    val keptRefs = keep.flatMap(v => filesRaw(dir, v)).toSet
    val dropRefs = drop.flatMap(v => filesRaw(dir, v)).toSet
    val dead = (dropRefs -- keptRefs).toSeq.sorted
    dead.foreach(n => Files.deleteIfExists(Paths.get(dir, n)))
    drop.foreach(v => Files.deleteIfExists(manifestPath(dir, v)))
    (dead.length, drop.length)
  }

  /** Manifest basenames without the existence check (vacuum needs to
    * read manifests whose shards may already be gone). */
  private def filesRaw(dir: String, v: Int): Seq[String] = {
    val mf = manifestPath(dir, v)
    if (!Files.exists(mf)) Seq.empty
    else Files.readAllLines(mf).asScala.filter(_.nonEmpty).toSeq
  }
}
