package graft.core

/** Operation lifecycle state machine.
  *
  * Semantics follow the reference gateway's operation states and legal
  * transitions (kyuubi-common/.../operation/OperationState.scala:26-63):
  * INITIALIZED → PENDING → RUNNING → COMPILED → FINISHED /
  * TIMEOUT / CANCELED / CLOSED / ERROR, where the terminal states are
  * FINISHED, TIMEOUT, CANCELED, CLOSED, ERROR and CLOSED is reachable
  * from any state.
  */
sealed abstract class OperationState(val name: String, val terminal: Boolean) {
  override def toString: String = name
}

object OperationState {
  case object Initialized extends OperationState("INITIALIZED", false)
  case object Pending extends OperationState("PENDING", false)
  case object Running extends OperationState("RUNNING", false)
  case object Compiled extends OperationState("COMPILED", false)
  case object Finished extends OperationState("FINISHED", true)
  case object Timeout extends OperationState("TIMEOUT", true)
  case object Canceled extends OperationState("CANCELED", true)
  case object Closed extends OperationState("CLOSED", true)
  case object Error extends OperationState("ERROR", true)

  val all: Seq[OperationState] =
    Seq(Initialized, Pending, Running, Compiled, Finished, Timeout, Canceled, Closed, Error)

  /** Legal transitions; anything → Closed is allowed. */
  private val legal: Map[OperationState, Set[OperationState]] = Map(
    Initialized -> Set(Pending, Running, Canceled, Timeout, Error),
    Pending -> Set(Running, Canceled, Timeout, Error, Finished),
    Running -> Set(Compiled, Finished, Canceled, Timeout, Error),
    Compiled -> Set(Finished, Canceled, Timeout, Error),
    Finished -> Set.empty,
    Timeout -> Set.empty,
    Canceled -> Set.empty,
    Closed -> Set.empty,
    Error -> Set.empty)

  def isValidTransition(from: OperationState, to: OperationState): Boolean =
    to == Closed || legal.getOrElse(from, Set.empty).contains(to)

  def validateTransition(from: OperationState, to: OperationState): Unit =
    if (!isValidTransition(from, to)) {
      throw new IllegalStateException(s"Illegal operation state transition $from -> $to")
    }
}
