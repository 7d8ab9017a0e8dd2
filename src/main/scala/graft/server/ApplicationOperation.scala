package graft.server

/** Cluster-application tracking seam — the reference's
  * `ApplicationOperation` trait (kyuubi-server/.../engine/
  * ApplicationOperation.scala) with its YARN and Kubernetes state
  * vocabularies. Batch/engine apps here run as local JVMs (no cluster
  * exists in-sandbox), but batch status speaks the production
  * vocabulary through this seam: the local implementation tracks
  * processes, and the K8s/YARN mappings translate pod phases /
  * RM report states exactly as the reference does
  * (KubernetesApplicationOperation.scala:699-711,
  * YarnApplicationOperation.scala:177-201) so swapping in a real
  * cluster client changes the lookup, not the state machine.
  */
object ApplicationState extends Enumeration {
  type ApplicationState = Value
  val PENDING, RUNNING, FINISHED, KILLED, FAILED, ZOMBIE, NOT_FOUND, UNKNOWN = Value

  def isTerminated(state: ApplicationState): Boolean = state match {
    case FAILED | KILLED | FINISHED | NOT_FOUND => true
    case _ => false
  }

  /** NOT_FOUND only counts as failure when the tracker can persist
    * terminal states (then "no record" means it never ran); a purely
    * live tracker can't distinguish finished-and-gone from never-ran.
    */
  def isFailed(state: ApplicationState, supportPersistedAppState: Boolean): Boolean =
    state match {
      case FAILED | KILLED => true
      case NOT_FOUND if supportPersistedAppState => true
      case _ => false
    }

  /** Our batch "applications" execute as tracked operations; their
    * operation-state names translate into this production vocabulary
    * so batch status reads the same whether the app ran in-process,
    * on YARN, or on K8s.
    */
  def fromOperationStateName(name: String): ApplicationState =
    name.toUpperCase match {
      case "INITIALIZED" | "PENDING" => PENDING
      case "RUNNING" | "COMPILED" => RUNNING
      case "FINISHED" | "CLOSED" => FINISHED
      case "CANCELED" | "TIMEOUT" => KILLED
      case "ERROR" => FAILED
      case _ => UNKNOWN
    }
}

final case class ApplicationInfo(
    id: String,
    name: String,
    state: ApplicationState.ApplicationState,
    url: Option[String] = None,
    error: Option[String] = None)

object ApplicationInfo {
  val NotFound: ApplicationInfo =
    ApplicationInfo("", "", ApplicationState.NOT_FOUND)
}

/** (succeeded, message) — kill never throws; failures are reported in
  * the message (the reference's KillResponse contract).
  */
trait ApplicationOperation {
  /** Quick capability check for an application-manager kind
    * ("local", "yarn", "k8s") before the heavier calls.
    */
  def isSupported(appMgr: String): Boolean
  def getApplicationInfoByTag(tag: String): ApplicationInfo
  def killApplicationByTag(tag: String): (Boolean, String)
  def supportPersistedAppState: Boolean
}

/** Local-process implementation (the reference's
  * JpsApplicationOperation): an application is a JVM/OS process whose
  * command line carries the unique tag. Live-only — no persisted
  * terminal state, so a missing process is NOT_FOUND, not FAILED.
  */
final class LocalApplicationOperation extends ApplicationOperation {
  import scala.jdk.CollectionConverters._

  override def isSupported(appMgr: String): Boolean =
    appMgr == null || appMgr.isEmpty || appMgr.equalsIgnoreCase("local")

  override def supportPersistedAppState: Boolean = false

  private def findByTag(tag: String): Option[ProcessHandle] =
    ProcessHandle.allProcesses().iterator().asScala.find { h =>
      h.isAlive && h.info().commandLine().map[Boolean](_.contains(tag)).orElse(false)
    }

  override def getApplicationInfoByTag(tag: String): ApplicationInfo =
    findByTag(tag) match {
      case Some(h) =>
        ApplicationInfo(h.pid().toString,
          h.info().command().orElse("jvm"), ApplicationState.RUNNING)
      case None => ApplicationInfo.NotFound
    }

  override def killApplicationByTag(tag: String): (Boolean, String) =
    findByTag(tag) match {
      case Some(h) =>
        val ok = h.destroy()
        (ok, if (ok) s"killed pid ${h.pid()}" else s"destroy() refused for pid ${h.pid()}")
      case None => (false, s"no live process carries tag $tag")
    }
}

/** Kubernetes state mapping, cluster-client-free: the pod/container
  * status shapes a watch would deliver, translated to
  * [[ApplicationState]] with the reference's exact rules —
  * container state (when a state-source container is named) wins
  * unless the pod is already terminated; a DELETE event on a
  * non-terminated pod is a FAILURE, not a disappearance.
  */
object KubernetesStateMapping {
  import ApplicationState._

  /** A container is in exactly one of waiting/running/terminated (the
    * K8s container-state contract).
    */
  sealed trait ContainerState
  final case class Waiting(reason: Option[String]) extends ContainerState
  case object Running extends ContainerState
  final case class Terminated(exitCode: Int) extends ContainerState

  final case class ContainerStatus(name: String, state: ContainerState)

  final case class PodStatus(name: String, phase: String,
      containers: Seq[ContainerStatus] = Nil)

  sealed trait EventType
  case object AddOrUpdate extends EventType
  case object Delete extends EventType

  /** Waiting reasons that still mean "coming up" (anything else
    * waiting — ImagePullBackOff, CrashLoopBackOff, … — is failure).
    */
  private val PendingWaitingReasons = Set("ContainerCreating", "PodInitializing")

  def podStateToApplicationState(phase: String): ApplicationState = phase match {
    case "Pending" => PENDING
    case "Running" => RUNNING
    case "Succeeded" => FINISHED
    case "Failed" | "Error" => FAILED
    case "OOMKilled" => KILLED
    case "Unknown" => UNKNOWN
    case _ => UNKNOWN
  }

  def containerStateToApplicationState(state: ContainerState): ApplicationState =
    state match {
      case Waiting(reason) =>
        val r = reason.map(_.trim).filter(_.nonEmpty)
        if (r.isEmpty || PendingWaitingReasons.contains(r.get)) PENDING else FAILED
      case Running => RUNNING
      case Terminated(0) => FINISHED
      case Terminated(_) => FAILED
    }

  /** Pod + optional state-source container → application state, for an
    * ADD/UPDATE or DELETE watch event.
    */
  def toApplicationState(pod: PodStatus, stateContainer: Option[String],
      event: EventType): ApplicationState = {
    val fromPod = podStateToApplicationState(pod.phase)
    val fromContainer = stateContainer.flatMap(n =>
      pod.containers.find(_.name.equalsIgnoreCase(n)))
      .map(cs => containerStateToApplicationState(cs.state))
    val state = fromContainer match {
      // spark container already terminated but sidecars keep the pod up
      case Some(cs) if ApplicationState.isTerminated(cs) => cs
      case _ if ApplicationState.isTerminated(fromPod) => fromPod
      case Some(cs) => cs
      case None => fromPod
    }
    event match {
      case AddOrUpdate => state
      case Delete =>
        if (ApplicationState.isTerminated(state)) state else FAILED
    }
  }
}

/** YARN state mapping: (YarnApplicationState, FinalApplicationStatus)
  * report pair → [[ApplicationState]], the reference's exact decision
  * table; any combination outside it fails the application rather
  * than guessing.
  */
object YarnStateMapping {
  import ApplicationState._

  def toApplicationState(yarnState: String, finalStatus: String): ApplicationState =
    (yarnState, finalStatus) match {
      case ("NEW", "UNDEFINED") | ("NEW_SAVING", "UNDEFINED") |
           ("SUBMITTED", "UNDEFINED") | ("ACCEPTED", "UNDEFINED") => PENDING
      case ("RUNNING", "UNDEFINED") | ("RUNNING", "SUCCEEDED") => RUNNING
      case ("FINISHED", "SUCCEEDED") => FINISHED
      case ("FINISHED", "FAILED") | ("FAILED", "FAILED") => FAILED
      case ("KILLED", "KILLED") => KILLED
      case _ => FAILED
    }
}
