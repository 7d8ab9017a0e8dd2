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
