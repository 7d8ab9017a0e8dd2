package graft.core

/** Server-side plugin seams (reference kyuubi-server-plugin module:
  * `org.apache.kyuubi.plugin.SessionConfAdvisor` and
  * `org.apache.kyuubi.plugin.GroupProvider`) — the two extension
  * points a deployment implements without patching the server:
  * per-session conf policy and user→group resolution.
  */

/** Advises extra session configuration at OpenSession time. Returned
  * entries OVERWRITE the client-supplied conf (reference
  * SessionConfAdvisor.getConfOverlay contract) — the hook where a
  * platform team pins queue names, memory ceilings, or result-format
  * policy per user/tenant regardless of what the JDBC URL asked for.
  */
trait SessionConfAdvisor {
  def confOverlay(user: String, sessionConf: Map[String, String]): Map[String, String] =
    Map.empty
}

object SessionConfAdvisor {
  /** Reflectively instantiate advisor classes (reference
    * `kyuubi.session.conf.advisor` takes a class-name list; each needs
    * a zero-arg constructor). Overlays apply in list order — later
    * advisors win conflicts.
    */
  def load(classNames: Seq[String]): Seq[SessionConfAdvisor] =
    classNames.map { cn =>
      Class.forName(cn).getDeclaredConstructor().newInstance()
        .asInstanceOf[SessionConfAdvisor]
    }
}

/** Profile-file advisor — the reference's FileSessionConfAdvisor
  * (kyuubi-server/.../session/FileSessionConfAdvisor.scala:32-47): the
  * client names one or more profiles via `graft.session.conf.profile`
  * (comma-separated, later profiles win) and each profile is a Java
  * properties file `<profile>.conf` under the directory named by the
  * `GRAFT_SESSION_CONF_DIR` env or the `graft.session.conf.dir` system
  * property. Files are re-read when older than `reloadIntervalMs`
  * (reference SESSION_CONF_FILE_RELOAD_INTERVAL via a Guava loading
  * cache; a timestamped map here — same contract, no dependency).
  * Missing profiles contribute nothing — a typo must not fail the
  * session, matching the reference's empty-on-miss cache loader.
  */
final class FileSessionConfAdvisor(
    confDirOverride: Option[String] = None,
    reloadIntervalMs: Long = 600000L) extends SessionConfAdvisor {

  def this() = this(None, 600000L) // reflective-load constructor

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Map[String, String])]()

  private def confDir: Option[String] =
    confDirOverride
      .orElse(sys.env.get("GRAFT_SESSION_CONF_DIR"))
      .orElse(sys.props.get("graft.session.conf.dir"))

  private def loadProfile(profile: String): Map[String, String] = {
    val now = System.currentTimeMillis()
    val cached = cache.get(profile)
    if (cached != null && now - cached._1 < reloadIntervalMs) return cached._2
    val loaded = confDir.map { dir =>
      val f = java.nio.file.Paths.get(dir, s"$profile.conf")
      if (!java.nio.file.Files.isReadable(f)) Map.empty[String, String]
      else {
        val props = new java.util.Properties()
        val in = java.nio.file.Files.newInputStream(f)
        try props.load(in) finally in.close()
        import scala.jdk.CollectionConverters._
        props.asScala.toMap
      }
    }.getOrElse(Map.empty)
    cache.put(profile, (now, loaded))
    loaded
  }

  /** Drop every cached profile so the next session re-reads the files
    * (the admin refresh endpoint's lever — without it an operator's
    * profile edit waits out `reloadIntervalMs`).
    */
  def invalidateCache(): Unit = cache.clear()

  override def confOverlay(user: String,
      sessionConf: Map[String, String]): Map[String, String] =
    sessionConf.get("graft.session.conf.profile") match {
      case None => Map.empty
      case Some(profiles) =>
        profiles.split(",").map(_.trim).filter(_.nonEmpty)
          .foldLeft(Map.empty[String, String])((acc, p) => acc ++ loadProfile(p))
    }
}

/** Resolves a session user to groups — drives the GROUP share level's
  * engine namespace (reference GroupProvider.primaryGroup; default
  * provider there is Hadoop UGI groups, inapplicable without a Hadoop
  * user database).
  */
trait GroupProvider {
  def primaryGroup(user: String, sessionConf: Map[String, String]): String
  def groups(user: String, sessionConf: Map[String, String]): Seq[String] =
    Seq(primaryGroup(user, sessionConf))
}

object GroupProvider {
  /** Reflective load by class name (reference
    * `kyuubi.session.group.provider`).
    */
  def load(className: String): GroupProvider =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[GroupProvider]
}

/** Default provider: the user principal with any @domain stripped —
  * 'alice@corp.example' → 'alice' (the rule Engine.shareKey inlined
  * before this seam existed).
  */
final class UserPrefixGroupProvider extends GroupProvider {
  override def primaryGroup(user: String, sessionConf: Map[String, String]): String =
    user.takeWhile(_ != '@')
}

/** Conf-driven provider — the in-sandbox stand-in for a
  * directory-backed provider. Membership is read from the
  * server-reserved `graft.server.session.group` /
  * `graft.server.session.groups` keys (comma-separated, first =
  * primary): `Engine.advisedConf` strips any client-supplied
  * `graft.server.*` entry BEFORE advisor overlays run, so only a
  * SessionConfAdvisor (server code) can populate them — group
  * membership is never self-asserted by the client.
  *
  * The legacy client-settable `graft.session.group(s)` keys are
  * honored only when the server opts in by pinning
  * `graft.server.trust.client.groups=true` (an advisor-set conf,
  * itself unspoofable for the same reason). Deployments with
  * group-subject authz policies should use a server-resolved
  * provider (this one fed by an advisor, or a directory-backed
  * [[GroupProvider]]).
  */
final class ConfGroupProvider extends GroupProvider {
  override def primaryGroup(user: String, sessionConf: Map[String, String]): String =
    groups(user, sessionConf).head

  override def groups(user: String, sessionConf: Map[String, String]): Seq[String] = {
    def parse(v: String): Seq[String] =
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val pinned = sessionConf.get("graft.server.session.group")
      .orElse(sessionConf.get("graft.server.session.groups"))
      .map(parse).getOrElse(Seq.empty)
    val trustClient =
      sessionConf.get("graft.server.trust.client.groups").contains("true")
    val client =
      if (trustClient)
        sessionConf.get("graft.session.group")
          .orElse(sessionConf.get("graft.session.groups"))
          .map(parse).getOrElse(Seq.empty)
      else Seq.empty
    val declared = if (pinned.nonEmpty) pinned else client
    if (declared.nonEmpty) declared else Seq(user.takeWhile(_ != '@'))
  }
}
