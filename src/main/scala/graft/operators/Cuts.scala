package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts with a config-selected durability backend — the one
  * switch every iterative operator (Supersteps, Traversal, Triangles,
  * Components, PageRank, the Dedup/stream shared builds) routes its
  * cuts through.
  *
  * Backends:
  *  - default (no config): `localCheckpoint()` — materialized
  *    unreplicated executor blocks. On `local[n]` this is correct and
  *    the fastest cut available (no serialization to disk, no extra
  *    job), and it is today's behavior at every call site,
  *    bit-identical plans included.
  *  - `spark.graft.checkpoint.dir = <path>`: a parquet round-trip
  *    under that directory — the CLUSTER-durable backend. On a real
  *    cluster, localCheckpoint pins unreplicated blocks in executor
  *    storage, so one lost executor kills a 50-superstep job;
  *    a checkpoint written to the shared filesystem (HDFS/S3/...)
  *    survives any executor loss and lets the job resume from the
  *    last cut. Parquet (rather than `df.checkpoint()`) because it
  *    needs no SparkContext-global `setCheckpointDir` mutation, is
  *    columnar-compressed on the wire, and its read-back is an
  *    ordinary FileSourceScan — which also makes every reliable cut a
  *    FRESH STATS LEAF for free (see [[statsLeaf]]).
  *
  * File lifecycle under the reliable backend is the caller's, exactly
  * like `SparkContext.setCheckpointDir`: point the config at a
  * job-scoped scratch directory and drop it when the job ends (cut
  * files are write-once and never referenced again after the next
  * cut's action completes, so a TTL policy also works).
  */
object Cuts {
  /** Session-config key selecting the reliable backend. */
  val DirKey = "spark.graft.checkpoint.dir"

  private def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty)

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Materialize `df` and return a frame reading the materialization —
    * the lineage cut. Eager under both backends (localCheckpoint is
    * eager by default; the parquet write is an action). */
  def cut(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(dir) =>
      val path = s"$dir/cut-${seq.incrementAndGet()}-${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.parquet(path)
      df.sparkSession.read.parquet(path)
    case None => df.localCheckpoint()
  }

  /** A cut that is also a fresh STATS leaf. localCheckpoint's
    * LogicalRDD carries the child plan's BigInt size estimate forward,
    * and every join in a subsequent superstep MULTIPLIES its children's
    * estimates — a k-join step compounds the estimate's bit-length
    * k-fold PER ROUND (double-exponential growth; by round ~15 Catalyst
    * spends minutes inside BigInteger.multiply — measured r13 on the
    * k-core loop). Rebuilding the frame from the checkpointed RDD makes
    * the cut a fresh leaf; the row conversion is one pass over an
    * already-materialized checkpoint. The reliable backend's parquet
    * read-back is ALREADY a fresh leaf (file-size stats), so it needs
    * no rebuild — and costs no row conversion on later reads. */
  def statsLeaf(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(_) => cut(df)
    case None =>
      val cp = df.localCheckpoint()
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** `df.cut()` postfix form — the drop-in spelling for the former
    * `.localCheckpoint()` call sites. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Cuts.cut(df)
  }
}
