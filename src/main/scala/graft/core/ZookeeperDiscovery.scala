package graft.core

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.curator.framework.{CuratorFramework, CuratorFrameworkFactory}
import org.apache.curator.retry.ExponentialBackoffRetry
import org.apache.zookeeper.CreateMode
import org.apache.zookeeper.KeeperException.NoNodeException

/** ZooKeeper-backed engine discovery — the multi-host production
  * backend behind the same [[DiscoveryClient]] trait the file registry
  * implements (reference
  * kyuubi-ha/.../client/zookeeper/ZookeeperDiscoveryClient.scala):
  *
  *   - registration is an EPHEMERAL_SEQUENTIAL node
  *     `/<namespace>/<space>/node-<seq>` holding the address, so a
  *     dead engine's registration disappears with its ZK session —
  *     no TTL bookkeeping, the ensemble is the liveness oracle;
  *   - `get` returns the OLDEST live registration (lowest sequence),
  *     the reference's created-order engine pick
  *     (DiscoveryClient.getServerHost);
  *   - transient connection loss is retried with exponential backoff
  *     (the reference's RetryPolicies conf).
  *
  * Spaces are hierarchical ("user/alice") and map to ZK paths; parent
  * nodes are persistent, only the registration leaf is ephemeral.
  */
final class ZookeeperDiscoveryClient(
    connectString: String,
    namespace: String = "graft",
    sessionTimeoutMs: Int = 15000) extends DiscoveryClient with AutoCloseable {

  private val client: CuratorFramework = CuratorFrameworkFactory.builder()
    .connectString(connectString)
    .namespace(namespace)
    .sessionTimeoutMs(sessionTimeoutMs)
    .retryPolicy(new ExponentialBackoffRetry(100, 3))
    .build()
  client.start()
  client.blockUntilConnected()

  // space → full node paths THIS client created (for unregister)
  private val mine = new ConcurrentHashMap[String, java.util.List[String]]()

  private def spacePath(space: String): String = {
    require(!space.split("/").contains(".."), s"bad space: $space")
    "/" + space
  }

  override def register(space: String, address: String): Unit = {
    val path = client.create()
      .creatingParentsIfNeeded()
      .withMode(CreateMode.EPHEMERAL_SEQUENTIAL)
      .forPath(s"${spacePath(space)}/node-", address.getBytes(StandardCharsets.UTF_8))
    mine.computeIfAbsent(space, _ =>
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())).add(path)
  }

  override def get(space: String): Option[String] = getAll(space).headOption

  /** Every live registration in the space, registration (sequence) order. */
  override def getAll(space: String): Seq[String] = {
    val base = spacePath(space)
    try {
      client.getChildren.forPath(base).asScala.toSeq.sorted.flatMap { child =>
        // a node can vanish between list and read (engine died) — skip it
        try Some(new String(client.getData.forPath(s"$base/$child"), StandardCharsets.UTF_8))
        catch { case _: NoNodeException => None }
      }.filter(_.nonEmpty)
    } catch { case _: NoNodeException => Seq.empty }
  }

  override def unregister(space: String): Unit =
    Option(mine.remove(space)).foreach(_.forEach { path =>
      try client.delete().forPath(path)
      catch { case _: NoNodeException => () }
    })

  /** Ends the ZK session: every ephemeral registration this client
    * created disappears from the ensemble — the crash-liveness story.
    */
  override def close(): Unit = client.close()
}
