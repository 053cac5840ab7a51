package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path for the `.kwi` format:
  * `spark.read.format("kwi").load(pathOrDir)`.
  *
  * Scale shape: one input partition per `.kwi` file — a directory of
  * exported shards reads fully parallel — and required-column pushdown
  * so `select(id)` never materializes embedding arrays into rows (the
  * bytes are still streamed past, which is inherent to a
  * length-prefixed record format, but per-row allocation goes away).
  * Writing stays with `KwiFormat.write` (the format is a single-file
  * interchange artifact by design; parquet is the scale store).
  */
class KwiDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kwi"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KwiDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KwiTable(properties.get("path"))
}

object KwiDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("metadata", StringType, nullable = true)))

  /** A path is one `.kwi` file or a directory of them (sorted for
    * deterministic partition order). */
  def filesOf(path: String): Seq[String] = {
    require(path != null, "kwi source requires a load path")
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.getFileName.toString.endsWith(".kwi")) buf += f.toString
        }
        buf.sorted.toSeq
      } finally s.close()
    } else Seq(path)
  }
}

class KwiTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"kwi:$path"
  override def schema(): StructType = KwiDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KwiScanBuilder(path)
}

class KwiScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = KwiDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KwiScan(path, required)
}

class KwiScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    KwiDataSource.filesOf(path).map(f => KwiInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KwiReaderFactory(required)
}

case class KwiInputPartition(file: String) extends InputPartition

class KwiReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[KwiInputPartition].file
    new PartitionReader[InternalRow] {
      private val it = KwiFormat.readRecords(Paths.get(file))
      private var cur: (String, Array[Float], Option[String]) = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "id" => UTF8String.fromString(cur._1)
          case "embedding" => ArrayData.toArrayData(cur._2)
          case "metadata" => cur._3.map(UTF8String.fromString).orNull
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }))
      // release the underlying file handle even when the scan terminates
      // early (limit pushdown, task cancellation)
      override def close(): Unit = it.close()
    }
  }
}
