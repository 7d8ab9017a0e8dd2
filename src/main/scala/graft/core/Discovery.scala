package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** File-backed engine discovery: a shared directory is the registry,
  * one file per registration, ZooKeeper-sequential-node style —
  * `<root>/<space>/node-<seq>-<uuid>` containing the address. Multiple
  * server processes on a host (or on a shared filesystem) register and
  * discover each other through it; `get` returns the oldest live
  * registration (the reference picks engines the same
  * created-order-first way from its ZK namespace,
  * kyuubi-ha/.../client/DiscoveryClient.scala `getServerHost` /
  * ServiceDiscovery's create-sequential registration).
  *
  * Liveness: explicit `unregister` removes the node; a positive
  * `ttlMs` additionally expires nodes whose file hasn't been touched
  * within the TTL (`heartbeat()` refreshes this client's nodes) —
  * standing in for ZK's ephemeral-node session timeout. A production
  * multi-host deployment would swap in a ZK/etcd client behind the
  * same [[DiscoveryClient]] trait.
  */
final class FileDiscoveryClient(root: Path, ttlMs: Long = 0L) extends DiscoveryClient {

  // space → node files THIS client created (for unregister/heartbeat)
  private val mine = new ConcurrentHashMap[String, java.util.List[Path]]()

  private def spaceDir(space: String): Path = {
    // spaces are hierarchical ("user/alice") — map to nested dirs,
    // refusing path escapes
    require(!space.split("/").contains(".."), s"bad space: $space")
    root.resolve(space)
  }

  // ZK-sequential-node counter: a per-space `seq` file advanced under
  // an OS file lock, so registration order is total even across
  // processes. The OS lock is held on behalf of the whole JVM —
  // FileChannel.lock() THROWS OverlappingFileLockException rather than
  // queueing when another thread of this process holds it — so the
  // file lock is additionally serialized through a JVM-local monitor
  // per seq file.
  private def nextSeq(dir: Path): Long = {
    val seqFile = dir.resolve("seq")
    val monitor = FileDiscoveryClient.seqMonitors
      .computeIfAbsent(seqFile.toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized { nextSeqLocked(seqFile) }
  }

  private def nextSeqLocked(seqFile: Path): Long = {
    val ch = java.nio.channels.FileChannel.open(seqFile,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        val buf = java.nio.ByteBuffer.allocate(32)
        val read = ch.read(buf, 0)
        val cur = if (read <= 0) 0L
          else new String(buf.array(), 0, read, StandardCharsets.UTF_8).trim match {
            case "" => 0L
            case s => s.toLong
          }
        val out = java.nio.ByteBuffer.wrap((cur + 1).toString.getBytes(StandardCharsets.UTF_8))
        ch.truncate(0)
        ch.write(out, 0)
        cur
      } finally lock.release()
    } finally ch.close()
  }

  override def register(space: String, address: String): Unit = {
    val dir = spaceDir(space)
    Files.createDirectories(dir)
    val name = f"node-${nextSeq(dir)}%020d-${UUID.randomUUID().toString.take(8)}"
    // write-then-move so readers never observe a half-written address
    val tmp = Files.createTempFile(dir, ".tmp-", "")
    Files.write(tmp, address.getBytes(StandardCharsets.UTF_8))
    val node = dir.resolve(name)
    Files.move(tmp, node, StandardCopyOption.ATOMIC_MOVE)
    mine.computeIfAbsent(space, _ =>
      java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())).add(node)
  }

  private def liveNodes(space: String): Seq[Path] = {
    val dir = spaceDir(space)
    if (!Files.isDirectory(dir)) return Seq.empty
    val now = System.currentTimeMillis()
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("node-"))
      .filter { p =>
        val fresh = ttlMs <= 0 ||
          (try now - Files.getLastModifiedTime(p).toMillis <= ttlMs
           catch { case _: Throwable => false })
        // reap on read: an expired node is a dead engine's — delete it
        // (ZK would have dropped the ephemeral node at session expiry),
        // so a later heartbeat from a revenant client can't revive it
        if (!fresh) { try Files.deleteIfExists(p) catch { case _: Throwable => } }
        fresh
      }
      .toSeq.sortBy(_.getFileName.toString)
    finally listing.close()
  }

  override def get(space: String): Option[String] =
    liveNodes(space).iterator.flatMap { p =>
      // a node can vanish between list and read (concurrent unregister)
      try Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
      catch { case _: Throwable => None }
    }.find(_.nonEmpty)

  /** Every space with at least one live registration node (admin
    * enumeration — the ZK analogue walks the namespace children).
    */
  def spaces(): Seq[String] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val walk = Files.walk(root)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("node-"))
      .map(p => root.relativize(p.getParent).toString)
      .toSeq.distinct.sorted
    finally walk.close()
  }

  /** Every live registration in the space, registration order. */
  override def getAll(space: String): Seq[String] =
    liveNodes(space).flatMap { p =>
      try Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
      catch { case _: Throwable => None }
    }.filter(_.nonEmpty)

  override def unregister(space: String): Unit = {
    Option(mine.remove(space)).foreach(_.forEach { p =>
      try Files.deleteIfExists(p) catch { case _: Throwable => }
    })
  }

  /** Delete any node in `space` carrying `address` — even one another
    * process registered (the killed engine can't unregister itself).
    */
  override def evict(space: String, address: String): Unit =
    liveNodes(space).foreach { p =>
      val content =
        try Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
        catch { case _: Throwable => None }
      if (content.contains(address)) {
        try Files.deleteIfExists(p) catch { case _: Throwable => }
      }
    }

  /** Refresh the TTL on every node this client registered. */
  def heartbeat(): Unit = {
    val now = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
    mine.values.forEach(_.forEach { p =>
      try Files.setLastModifiedTime(p, now) catch { case _: Throwable => }
    })
  }
}

object FileDiscoveryClient {
  // JVM-wide monitors keyed by seq-file path: file locks are per-JVM,
  // so same-process concurrency must be serialized in-process first.
  private[core] val seqMonitors = new ConcurrentHashMap[String, Object]()
}

/** Backend selection by URL — the deployable entry points
  * (EngineMain, EngineProcBuilder) accept one discovery string and
  * this factory picks the client, the way the reference selects its
  * HA client class from configuration
  * (kyuubi-ha/.../DiscoveryClientProvider.scala):
  *
  *   - `zk://host:port[,host2:port2][/namespace]` → ZooKeeper
  *   - `etcd://host:port[/namespace]` (or `etcds://` for TLS) → etcd's
  *     gRPC-gateway JSON endpoint
  *   - anything else → a filesystem path for the file-backed registry
  *
  * The string travels verbatim to spawned engine JVMs, so launcher and
  * engine always land on the same backend.
  */
object DiscoveryClients {
  def fromUrl(url: String): DiscoveryClient = {
    def splitNs(rest: String): (String, String) = rest.indexOf('/') match {
      case -1 => (rest, "graft")
      case i => (rest.take(i), Option(rest.drop(i + 1)).filter(_.nonEmpty).getOrElse("graft"))
    }
    if (url.startsWith("zk://")) {
      val (conn, ns) = splitNs(url.stripPrefix("zk://"))
      new ZookeeperDiscoveryClient(conn, ns)
    } else if (url.startsWith("etcd://") || url.startsWith("etcds://")) {
      val secure = url.startsWith("etcds://")
      val (ep, ns) = splitNs(url.stripPrefix(if (secure) "etcds://" else "etcd://"))
      new EtcdDiscoveryClient((if (secure) "https://" else "http://") + ep, ns)
    } else new FileDiscoveryClient(java.nio.file.Paths.get(url))
  }
}

/** Register one address and exit — a minimal second *process* for
  * cross-JVM discovery tests (and a building block for wrapper
  * scripts). Usage: DiscoveryRegisterMain <rootDir> <space> <address>.
  */
object DiscoveryRegisterMain {
  def main(args: Array[String]): Unit = {
    val Array(rootDir, space, address) = args
    new FileDiscoveryClient(java.nio.file.Paths.get(rootDir)).register(space, address)
    println(s"REGISTERED $space -> $address")
  }
}
