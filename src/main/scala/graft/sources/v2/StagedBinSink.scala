package graft.sources.v2

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK with a full commit/abort protocol — the write
  * half of the connector story [[EventGenSource]] starts (the
  * reference persists results as JSON files, e.g. its card-metadata
  * sink; this is the transactional form a distributed engine needs).
  *
  * Storage: each task stages length-prefixed UnsafeRow pages to
  * `_staging/<writeId>/part-<pid>-<tid>.bin`; the driver-side job
  * commit MOVES staged files into `data/` as
  * `<writeId>-part-<pid>-<tid>.bin` (pid/tid restart per Spark
  * application — the writeId prefix is what keeps a later run's files
  * from colliding with committed ones) and then atomically swaps a
  * plain-text manifest (`_manifest` → schema json + one committed
  * file per line + committed epoch ids). Readers only ever see files
  * listed by a fully-written manifest, so:
  *  - a crashed/aborted job leaves data/ and the manifest untouched
  *    (abort deletes its staging directory);
  *  - task retries are safe — uncommitted staged files are never
  *    listed and are swept with the staging dir;
  *  - a re-delivered streaming epoch is a no-op: `commit(epochId, _)`
  *    consults the manifest's epoch set first (the same
  *    batchId-idempotence contract as the foreachBatch UpsertStore).
  *
  * Scale notes: the protocol is the object-store-committer shape —
  * stage per task, one driver rename pass per job, one atomic
  * manifest swap — sized O(#files) driver work with zero data moves
  * through the driver. Local NIO stands in for the DFS client so the
  * spec stays hermetic; on HDFS/S3 the same three calls map to
  * rename/PUT + conditional manifest swap. UnsafeRow pages round-trip
  * any Catalyst schema byte-exactly without a parser dependency. */
class StagedBinSink extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = StagedBinSink.root(options.get("path"))
    val m = StagedBinSink.readManifest(p)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed manifest under $p — nothing to read"))
    m.schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StagedBinTable(StagedBinSink.root(properties.get("path")), schema)
}

object StagedBinSink {
  private[v2] def root(path: String): Path = {
    require(path != null && path.nonEmpty, "option 'path' is required")
    Paths.get(path)
  }

  final case class Manifest(schema: StructType, files: Seq[String], epochs: Set[Long])

  private def manifestPath(root: Path): Path = root.resolve("_manifest")

  private[v2] def readManifest(root: Path): Option[Manifest] = {
    val mp = manifestPath(root)
    if (!Files.exists(mp)) None
    else {
      val lines = Files.readAllLines(mp, StandardCharsets.UTF_8).asScala.toSeq
      val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
      val (epochLines, fileLines) = lines.tail.partition(_.startsWith("epoch:"))
      Some(Manifest(schema, fileLines.filter(_.nonEmpty),
        epochLines.map(_.stripPrefix("epoch:").toLong).toSet))
    }
  }

  /** Atomic swap: write a temp sibling, then ATOMIC_MOVE over the
    * manifest — readers see the old or the new list, never a torn one. */
  private def writeManifest(root: Path, m: Manifest): Unit = {
    val tmp = root.resolve(s"_manifest.tmp-${java.util.UUID.randomUUID()}")
    val body = (m.schema.json +: (m.files ++ m.epochs.toSeq.sorted.map(e => s"epoch:$e")))
      .mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Driver-side job commit: move staged files into data/, then swap
    * the manifest. `epoch` = Some(id) makes the commit idempotent on
    * re-delivery; `truncate` drops previously committed files first. */
  private[v2] def commitJob(
      root: Path,
      schema: StructType,
      staged: Seq[StagedFile],
      epoch: Option[Long],
      truncate: Boolean): Unit = synchronized {
    val prev = readManifest(root)
    if (epoch.exists(e => prev.exists(_.epochs.contains(e)))) {
      staged.foreach(s => Files.deleteIfExists(Paths.get(s.stagedPath)))
      return // epoch already applied — idempotent skip
    }
    val dataDir = Files.createDirectories(root.resolve("data"))
    val names = staged.map { s =>
      val src = Paths.get(s.stagedPath)
      // committed name keeps the staging write-id prefix: part ids and
      // task ids RESTART in every Spark application, so a bare
      // part-<pid>-<tid>.bin from a second run would collide with (and
      // silently replace) a file an earlier run committed — corrupting
      // append mode and racing truncate's delete pass. The write-id is
      // unique per job (batch: per-write UUID; streaming: queryId-epoch).
      val name = s"${src.getParent.getFileName}-${src.getFileName}"
      Files.move(src, dataDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      s"data/$name"
    }
    val keep = if (truncate) Seq.empty else prev.map(_.files).getOrElse(Seq.empty)
    // names are globally unique, but exclude the just-committed set from
    // the truncate sweep anyway — the delete pass must never be able to
    // touch files this commit just moved in
    if (truncate) prev.foreach(_.files.filterNot(names.toSet).foreach(
      f => Files.deleteIfExists(root.resolve(f))))
    writeManifest(root, Manifest(schema, keep ++ names,
      prev.map(_.epochs).getOrElse(Set.empty) ++ epoch))
  }

  private[v2] def abortJob(root: Path, writeId: String): Unit = {
    val dir = root.resolve("_staging").resolve(writeId)
    if (Files.exists(dir)) {
      Files.list(dir).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dir)
    }
  }
}

private[v2] final case class StagedFile(stagedPath: String, rows: Long)
  extends WriterCommitMessage

private class StagedBinTable(root: Path, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_staged_bin($root)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new StagedBinScan(root, schema0)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StagedBinWriteBuilder(root, info.schema(), info.queryId(), truncate = false)
}

private class StagedBinWriteBuilder(
    root: Path, schema: StructType, queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new StagedBinWriteBuilder(root, schema, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new StagedBinBatchWrite(root, schema, queryId, truncate)
    override def toStreaming: StreamingWrite =
      new StagedBinStreamingWrite(root, schema, queryId, truncate)
  }
}

private class StagedBinBatchWrite(
    root: Path, schema: StructType, writeId: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StagedBinWriterFactory(root.toString, writeId, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    StagedBinSink.commitJob(root, schema,
      messages.toSeq.map(_.asInstanceOf[StagedFile]), None, truncate)
    StagedBinSink.abortJob(root, writeId) // sweep the now-empty staging dir
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedBinSink.abortJob(root, writeId)
}

private class StagedBinStreamingWrite(
    root: Path, schema: StructType, queryId: String, truncate: Boolean)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StagedBinWriterFactory(root.toString, queryId, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    StagedBinSink.commitJob(root, schema,
      messages.toSeq.map(_.asInstanceOf[StagedFile]), Some(epochId), truncate)
    StagedBinSink.abortJob(root, s"$queryId-$epochId")
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    StagedBinSink.abortJob(root, s"$queryId-$epochId")
}

/** Serves both batch and streaming writes; staging dirs are keyed by
  * (queryId[, epoch]) so concurrent epochs never collide. */
private class StagedBinWriterFactory(rootStr: String, writeId: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer(writeId, partitionId, taskId)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    writer(s"$writeId-$epochId", partitionId, taskId)

  private def writer(dir: String, partitionId: Int, taskId: Long) = {
    val staging = Files.createDirectories(
      Paths.get(rootStr).resolve("_staging").resolve(dir))
    new StagedBinWriter(
      staging.resolve(f"part-$partitionId%05d-$taskId.bin"), schema)
  }
}

/** Length-prefixed UnsafeRow pages: 4-byte big-endian length + row
  * bytes. Task commit hands the staged path to the driver; task abort
  * deletes it (a retried task writes a fresh file keyed by taskId). */
private class StagedBinWriter(file: Path, schema: StructType)
    extends DataWriter[InternalRow] {
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(Files.newOutputStream(file)))
  private val toUnsafe = UnsafeProjection.create(schema)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val u = toUnsafe(record)
    out.writeInt(u.getSizeInBytes)
    u.writeToStream(out, new Array[Byte](4096))
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(file.toString, rows)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
  override def close(): Unit = out.close()
}

// ------------------------------------------------------------ read back

private final case class StagedBinPartition(file: String) extends InputPartition

private class StagedBinScan(root: Path, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    StagedBinSink.readManifest(root).map(_.files).getOrElse(Seq.empty)
      .map(f => StagedBinPartition(root.resolve(f).toString): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new StagedBinReaderFactory(schema.length)
}

private class StagedBinReaderFactory(numFields: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(partition.asInstanceOf[StagedBinPartition].file))))
    new PartitionReader[InternalRow] {
      private val row = new UnsafeRow(numFields)
      private var cur: UnsafeRow = _
      override def next(): Boolean =
        try {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          row.pointTo(bytes, len)
          cur = row
          true
        } catch { case _: EOFException => false }
      override def get(): InternalRow = cur
      override def close(): Unit = in.close()
    }
  }
}
