package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.UUID

/** The metadata-plane contract a [[SnapshotLog]] needs from its store:
  * the manifests ARE the table, and the ONLY primitive the commit
  * protocol requires of them is an atomic create-if-absent. Everything
  * else is plain reads. An object store that offers a conditional put
  * (`If-None-Match: *`) implements this trait in a page of code; the
  * data plane (immutable data files) needs nothing beyond ordinary
  * PUT/GET and never routes through here.
  *
  * Names are relative manifest file names (`v<20-digit>.json`) — the
  * store owns where they live.
  */
trait CommitStore {
  /** Publish `payload` at `name` iff absent; true iff THIS call created
    * it. The whole optimistic-concurrency story rests on this one
    * atomicity guarantee. */
  def putIfAbsent(name: String, payload: Array[Byte]): Boolean

  /** The committed bytes at `name`, or None if absent. */
  def get(name: String): Option[Array[Byte]]

  /** All published names (unordered). */
  def list(): Seq[String]

  /** Remove `name` (vacuum's manifest-horizon trim). */
  def delete(name: String): Unit

  def exists(name: String): Boolean = get(name).isDefined
}

/** [[CommitStore]] over a Hadoop filesystem directory. The atomic
  * create-if-absent branches per scheme:
  *  - local FS: `link(2)` via `Files.createLink` — POSIX hard-link
  *    creation fails atomically if the target exists (`rename(2)` would
  *    silently REPLACE it, destroying the CAS);
  *  - HDFS and rename-contract stores: write-then-rename, which fails
  *    on an existing destination.
  * Object stores without atomic rename use [[InMemoryCommitStore]]'s
  * shape instead: a conditional put, no tmp file at all. */
final class FsCommitStore(fs: FileSystem, dir: Path) extends CommitStore {
  override def putIfAbsent(name: String, payload: Array[Byte]): Boolean = {
    fs.mkdirs(dir)
    val dst = new Path(dir, name)
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.json")
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    if (fs.getScheme == "file") {
      val (t, d) = (Paths.get(tmp.toUri.getPath), Paths.get(dst.toUri.getPath))
      // tmp cleanup goes through the Hadoop FS so the checksum sibling
      // (ChecksumFileSystem's .crc) is swept with it — a NIO delete
      // would leak one crc file per commit forever
      try { Files.createLink(d, t); fs.delete(tmp, false); true }
      catch { case _: FileAlreadyExistsException => fs.delete(tmp, false); false }
    } else {
      if (fs.exists(dst)) { fs.delete(tmp, false); false }
      else fs.rename(tmp, dst)
    }
  }

  override def get(name: String): Option[Array[Byte]] = {
    val p = new Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(org.apache.commons.io.IOUtils.toByteArray(in)) finally in.close()
    }
  }

  override def exists(name: String): Boolean = fs.exists(new Path(dir, name))

  override def list(): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.getName)

  override def delete(name: String): Unit = fs.delete(new Path(dir, name), false)
}

/** [[CommitStore]] over an in-memory map whose `putIfAbsent` has exactly
  * an object store's conditional-put semantics (`If-None-Match: *` —
  * one winner per name, atomically). Running the full contention matrix
  * against this store proves the trait's contract is sufficient for the
  * commit protocol — an S3-style backend then only re-implements these
  * four methods over HTTP. Also the deterministic test double for
  * multi-writer races: no filesystem timing can mask a protocol bug. */
final class InMemoryCommitStore extends CommitStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  override def putIfAbsent(name: String, payload: Array[Byte]): Boolean =
    objects.putIfAbsent(name, payload) == null

  override def get(name: String): Option[Array[Byte]] = Option(objects.get(name))

  override def list(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSeq
  }

  override def delete(name: String): Unit = { objects.remove(name); () }
}
