package graft.server

import org.scalatest.funsuite.AnyFunSuite

import graft.server.KubernetesStateMapping._

/** The ApplicationOperation seam: local process tracking plus the
  * K8s pod-phase and YARN report-state decision tables (reference
  * KubernetesApplicationOperation.scala:609-711,
  * YarnApplicationOperation.scala:177-201).
  */
class ApplicationOperationSpec extends AnyFunSuite {
  import ApplicationState._

  // ---- K8s pod phases ----

  test("pod phases map per the reference table") {
    assert(podStateToApplicationState("Pending") == PENDING)
    assert(podStateToApplicationState("Running") == RUNNING)
    assert(podStateToApplicationState("Succeeded") == FINISHED)
    assert(podStateToApplicationState("Failed") == FAILED)
    assert(podStateToApplicationState("Error") == FAILED)
    assert(podStateToApplicationState("OOMKilled") == KILLED)
    assert(podStateToApplicationState("Unknown") == UNKNOWN)
    assert(podStateToApplicationState("SomethingNew") == UNKNOWN)
  }

  test("container states: creating is pending, crash-looping is failed, exit code decides") {
    assert(containerStateToApplicationState(Waiting(Some("ContainerCreating"))) == PENDING)
    assert(containerStateToApplicationState(Waiting(Some("PodInitializing"))) == PENDING)
    assert(containerStateToApplicationState(Waiting(None)) == PENDING)
    assert(containerStateToApplicationState(Waiting(Some("ImagePullBackOff"))) == FAILED)
    assert(containerStateToApplicationState(Waiting(Some("CrashLoopBackOff"))) == FAILED)
    assert(containerStateToApplicationState(Running) == RUNNING)
    assert(containerStateToApplicationState(Terminated(0)) == FINISHED)
    assert(containerStateToApplicationState(Terminated(137)) == FAILED)
  }

  test("state-source container wins unless the pod already terminated; sidecars don't mask") {
    val sparkDone = PodStatus("drv", "Running", Seq(
      ContainerStatus("spark-kubernetes-driver", Terminated(0)),
      ContainerStatus("sidecar", Running)))
    // spark container terminated cleanly while a sidecar keeps the pod Running
    assert(toApplicationState(sparkDone, Some("spark-kubernetes-driver"), AddOrUpdate)
      == FINISHED)
    // pod-only state source: the sidecar-held Running phase is what we see
    assert(toApplicationState(sparkDone, None, AddOrUpdate) == RUNNING)
    // pod terminated: container state can't resurrect it
    val podGone = PodStatus("drv", "Failed", Seq(
      ContainerStatus("spark-kubernetes-driver", Running)))
    assert(toApplicationState(podGone, Some("spark-kubernetes-driver"), AddOrUpdate)
      == FAILED)
  }

  test("DELETE of a non-terminated pod is a failure, not a disappearance") {
    val live = PodStatus("drv", "Running")
    assert(toApplicationState(live, None, Delete) == FAILED)
    val done = PodStatus("drv", "Succeeded")
    assert(toApplicationState(done, None, Delete) == FINISHED)
  }

  // ---- YARN report pairs ----

  test("YARN (state, finalStatus) decision table") {
    assert(YarnStateMapping.toApplicationState("NEW", "UNDEFINED") == PENDING)
    assert(YarnStateMapping.toApplicationState("SUBMITTED", "UNDEFINED") == PENDING)
    assert(YarnStateMapping.toApplicationState("ACCEPTED", "UNDEFINED") == PENDING)
    assert(YarnStateMapping.toApplicationState("RUNNING", "UNDEFINED") == RUNNING)
    assert(YarnStateMapping.toApplicationState("RUNNING", "SUCCEEDED") == RUNNING)
    assert(YarnStateMapping.toApplicationState("FINISHED", "SUCCEEDED") == FINISHED)
    assert(YarnStateMapping.toApplicationState("FINISHED", "FAILED") == FAILED)
    assert(YarnStateMapping.toApplicationState("FAILED", "FAILED") == FAILED)
    assert(YarnStateMapping.toApplicationState("KILLED", "KILLED") == KILLED)
    // any combination outside the table fails the app rather than guessing
    assert(YarnStateMapping.toApplicationState("RUNNING", "KILLED") == FAILED)
  }

  // ---- terminal/failure predicates ----

  test("isTerminated / isFailed honor persisted-state support") {
    assert(Seq(FAILED, KILLED, FINISHED, NOT_FOUND).forall(isTerminated))
    assert(Seq(PENDING, RUNNING, ZOMBIE, UNKNOWN).forall(s => !isTerminated(s)))
    assert(isFailed(NOT_FOUND, supportPersistedAppState = true))
    assert(!isFailed(NOT_FOUND, supportPersistedAppState = false))
    assert(isFailed(KILLED, supportPersistedAppState = false))
  }

  // ---- local (Jps-style) implementation against a real process ----

  test("local operation finds and kills a tagged process") {
    val tag = s"graft-app-tag-${java.util.UUID.randomUUID()}"
    // sleep must not be bash's last -c command, or bash exec-replaces
    // itself with sleep and the tagged command line vanishes from /proc
    val proc = new ProcessBuilder("bash", "-c", s": $tag; sleep 60; exit 0").start()
    val op = new LocalApplicationOperation
    try {
      assert(op.isSupported("local") && op.isSupported(null) && !op.isSupported("yarn"))
      assert(!op.supportPersistedAppState)
      val info = op.getApplicationInfoByTag(tag)
      assert(info.state == RUNNING, s"expected RUNNING, got $info")
      assert(info.id == proc.pid().toString)
      val (ok, msg) = op.killApplicationByTag(tag)
      assert(ok, msg)
      proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(!proc.isAlive)
      // live-only tracker: a dead process is NOT_FOUND (not FAILED)
      var tries = 0
      while (op.getApplicationInfoByTag(tag).state != NOT_FOUND && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(op.getApplicationInfoByTag(tag).state == NOT_FOUND)
      assert(!op.killApplicationByTag(tag)._1)
    } finally proc.destroyForcibly()
  }

  test("operation-state names translate to the application vocabulary") {
    assert(fromOperationStateName("Running") == RUNNING)
    assert(fromOperationStateName("Finished") == FINISHED)
    assert(fromOperationStateName("Error") == FAILED)
    assert(fromOperationStateName("Canceled") == KILLED)
    assert(fromOperationStateName("Timeout") == KILLED)
    assert(fromOperationStateName("Pending") == PENDING)
    assert(fromOperationStateName("whatever") == UNKNOWN)
  }
}
