package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Reader/writer for the reference's `.kwi` single-file vector format.
  *
  * The reference ships two incompatible `.kwi` layouts whose read paths
  * are both broken (header-size vs skip mismatch,
  * vector_db/src/local_storage.rs:74-81 vs :221; entry-table overwrite
  * at offset 32, vector_db/src/binary_index.rs:227-234; short bincode
  * reads, :160-165). Per SURVEY.md §7.5.3 we implement the evident spec
  * — LocalStorage's length-prefixed record stream — with one consistent
  * layout:
  *
  *   header (20 bytes LE): magic "KWI\0" | version u32 = 1 | count u64 |
  *                          reserved u32
  *   record:   id_len u32 | id UTF-8 bytes | data_len u32 (#floats) |
  *             data_len × f32 LE | metadata_len u32 | metadata UTF-8 JSON
  *             (metadata_len = 0 ⇒ no metadata)
  *
  * A `.kwi` file is single-file by design (it is the reference's
  * interchange artifact, not our scale path — parquet is). Write runs on
  * the driver via `toLocalIterator` (constant memory); read parses
  * sequentially and returns a DataFrame. Tombstone-free: delete is a
  * compacting rewrite, matching `LocalStorage::delete_vector`
  * (local_storage.rs:363-375).
  */
object KwiFormat {
  val Magic: Array[Byte] = Array('K'.toByte, 'W'.toByte, 'I'.toByte, 0.toByte)
  val Version = 1
  val HeaderSize = 20

  /** Write rows (id STRING, embedding ARRAY&lt;FLOAT&gt;, metadata STRING?) to
    * `path`. Returns the record count. */
  def write(df: DataFrame, path: String): Long = {
    val tmp = Paths.get(path + ".tmp")
    Files.createDirectories(tmp.toAbsolutePath.getParent)
    val hasMeta = df.columns.contains("metadata")
    val cols = if (hasMeta) df.select("id", "embedding", "metadata")
               else df.select("id", "embedding")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
    var count = 0L
    try {
      out.write(header(0L)) // placeholder count, patched below
      val it = cols.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        writeRecord(out, r, hasMeta)
        count += 1
      }
    } finally out.close()
    patchCount(tmp, count)
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    count
  }

  /** Parse `path` into a DataFrame (id, embedding, metadata). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = readRecords(Paths.get(path)).map {
      case (id, vec, meta) => Row(id, vec, meta.orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq),
      CollectionManager.schema.copy(fields = CollectionManager.schema.fields.take(3)))
  }

  /** Header-declared record count without scanning the body
    * (local_storage.rs:350-361 `get_vector_count`). */
  def count(path: String): Long = {
    val bytes = readN(Paths.get(path), HeaderSize)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    require(magic.sameElements(Magic), s"bad magic in $path")
    require(bb.getInt() == Version, s"bad version in $path")
    bb.getLong()
  }

  // --- internals ---

  private def header(count: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).putInt(Version).putLong(count).putInt(0)
    bb.array()
  }

  private def patchCount(p: Path, count: Long): Unit = {
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(count).flip()
      ch.write(bb, 8) // count sits after magic(4) + version(4)
    } finally ch.close()
  }

  private def writeRecord(out: java.io.OutputStream, r: Row, hasMeta: Boolean): Unit = {
    val id = r.getString(0).getBytes("UTF-8")
    val vec = r.getSeq[Float](1)
    val meta = if (hasMeta && !r.isNullAt(2)) r.getString(2).getBytes("UTF-8")
               else Array.emptyByteArray
    val bb = ByteBuffer
      .allocate(4 + id.length + 4 + vec.length * 4 + 4 + meta.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(id.length).put(id)
    bb.putInt(vec.length)
    vec.foreach(bb.putFloat)
    bb.putInt(meta.length).put(meta)
    out.write(bb.array())
  }

  /** Closeable record iterator: drains to EOF normally, but callers that
    * stop early (limit pushdown, task kill) must call `close()` or the
    * file handle leaks — the DSv2 PartitionReader wires this into its
    * own close(). */
  final class RecordIterator(p: Path)
      extends Iterator[(String, Array[Float], Option[String])]
      with AutoCloseable {
    private val declared = KwiFormat.count(p.toString)
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(p.toFile)))
    in.skipNBytes(HeaderSize)
    private var remaining = declared
    private var closed = false
    def close(): Unit = if (!closed) { closed = true; in.close() }
    def hasNext: Boolean = {
      if (remaining <= 0) { close(); false } else true
    }
    def next(): (String, Array[Float], Option[String]) = {
      try {
        val id = new String(readLenPrefixed(in), "UTF-8")
        val dim = readIntLE(in)
        val data = new Array[Float](dim)
        val buf = new Array[Byte](dim * 4)
        in.readFully(buf)
        val fb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < dim) { data(i) = fb.getFloat(); i += 1 }
        val metaBytes = readLenPrefixed(in)
        val meta = if (metaBytes.isEmpty) None else Some(new String(metaBytes, "UTF-8"))
        remaining -= 1
        (id, data, meta)
      } catch { case e: EOFException => close(); throw e }
    }
  }

  private[sources] def readRecords(p: Path): RecordIterator = new RecordIterator(p)

  private def readIntLE(in: DataInputStream): Int = {
    val b = new Array[Byte](4)
    in.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }

  private def readLenPrefixed(in: DataInputStream): Array[Byte] = {
    val n = readIntLE(in)
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  private def readN(p: Path, n: Int): Array[Byte] = {
    val in = new FileInputStream(p.toFile)
    try { val b = new Array[Byte](n); new DataInputStream(in).readFully(b); b }
    finally in.close()
  }
}
