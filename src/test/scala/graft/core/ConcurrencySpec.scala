package graft.core

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Multi-tenancy under concurrency: many sessions running statements
  * simultaneously against one engine (shared SparkContext, isolated
  * session state), plus explicit cancellation of a running operation.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("16 sessions x 4 statements run concurrently with correct results") {
    val engine = new Engine(spark)
    val pool = Executors.newFixedThreadPool(16)
    // submissions block in awaitTermination on `pool`; operations MUST
    // run on a different executor or the two workloads deadlock
    val opPool = Executors.newFixedThreadPool(16)
    val opEc: ExecutionContext = ExecutionContext.fromExecutor(opPool)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work = (1 to 16).map { u =>
        Future {
          val sess = engine.openSession(s"user$u")
          (1 to 4).map { i =>
            val op = sess.executeStatement(
              s"SELECT sum(id) AS s FROM range(${u * 1000 + i})")(opEc)
            op.awaitTermination(120000)
            assert(op.currentState == OperationState.Finished, s"${op.exception}")
            val n = (u * 1000 + i).toLong
            assert(op.fetchIterator.next().getLong(0) == n * (n - 1) / 2)
          }
          engine.closeSession(sess.id)
        }
      }
      Await.result(Future.sequence(work), 180.seconds)
      assert(engine.openSessionCount == 0)
    } finally { pool.shutdown(); opPool.shutdown() }
  }

  test("cancel() stops a running statement and lands in CANCELED") {
    val engine = new Engine(spark)
    val sess = engine.openSession("canceller")
    implicit val ec: ExecutionContext = ExecutionContext.global
    // a statement slow enough to still be running when we cancel
    val op = sess.executeStatement(
      "SELECT count(*) FROM range(1000000000) a CROSS JOIN range(100) b")
    // The op passes through RUNNING into COMPILED within milliseconds
    // (COMPILED = spark.sql returned, jobs now executing); waiting for
    // RUNNING alone can miss the window entirely and burn the whole
    // deadline while the query completes — then cancel() arrives too
    // late and the test flakes FINISHED.
    val deadline = System.nanoTime() + 30e9.toLong
    while (!Set[OperationState](OperationState.Running, OperationState.Compiled)
        .contains(op.currentState) && System.nanoTime() < deadline)
      Thread.sleep(5)
    op.cancel()
    val state = op.awaitTermination(60000)
    assert(state == OperationState.Canceled, s"got $state")
  }

  test("cancel racing completion never poisons the pooled thread's interrupt flag") {
    // Regression for the run()-epilogue race: a canceller that read a
    // non-null execThread must not deliver its interrupt AFTER the
    // runner nulled the ref and cleared the flag — that would hand a
    // poisoned interrupt to the executor's next task. Operation guards
    // the interrupt and the null+clear pair with one lock; this stress
    // loop races cancel() against fast completions on a SINGLE-thread
    // pool and probes the flag after every round (FIFO guarantees the
    // probe runs after the op future's body has fully exited).
    val engine = new Engine(spark)
    val sess = engine.openSession("racer")
    val opPool = Executors.newSingleThreadExecutor()
    val opEc: ExecutionContext = ExecutionContext.fromExecutor(opPool)
    try {
      for (i <- 1 to 200) {
        val op = sess.executeStatement(s"SELECT $i AS v")(opEc)
        // jitter the cancel point across the op lifecycle so some land
        // mid-run, some in the epilogue, some after terminal
        if (i % 3 == 1) Thread.sleep(0, (i % 7) * 100000)
        else if (i % 3 == 2) Thread.sleep(i % 5)
        op.cancel()
        op.awaitTermination(60000)
        assert(op.currentState.terminal, s"iteration $i: ${op.currentState}")
        val probe = Future(Thread.interrupted())(opEc)
        assert(!Await.result(probe, 10.seconds),
          s"iteration $i left a poisoned interrupt flag on the pooled thread")
      }
    } finally {
      engine.closeSession(sess.id)
      opPool.shutdown()
    }
  }

  test("a mid-run interrupt cannot leave the op RUNNING or wedge the next op") {
    // Regression: scala.util.Try catches only NonFatal, so a cancel's
    // InterruptedException escaping runInternal used to blow through
    // the run() epilogue — skipping the interrupt-flag clear AND the
    // execThread release. The op could sit non-terminal forever
    // (clients polling an op no thread executes) and the pooled
    // thread, still referenced by the dead op's execThread, could be
    // interrupted AGAIN while running the NEXT operation. run() now
    // catches Throwable, so the epilogue is unconditional.
    val engine = new Engine(spark)
    val sess = engine.openSession("interrupter")
    val opPool = Executors.newSingleThreadExecutor()
    val opEc: ExecutionContext = ExecutionContext.fromExecutor(opPool)
    try {
      val op = sess.executeStatement(
        "SELECT count(*) FROM range(1000000000) a CROSS JOIN range(1000) b")(opEc)
      val deadline = System.nanoTime() + 30e9.toLong
      while (!Set[OperationState](OperationState.Running, OperationState.Compiled)
          .contains(op.currentState) && System.nanoTime() < deadline)
        Thread.sleep(5)
      op.cancel() // cancels the job group AND interrupts the exec thread
      val st = op.awaitTermination(60000)
      assert(st.terminal, s"interrupted op must reach a terminal state, got $st")
      // the same pooled thread must run the next operation cleanly —
      // before the fix it could be wedged by the leftover interrupt
      val op2 = sess.executeStatement("SELECT 7 AS v")(opEc)
      assert(op2.awaitTermination(60000) == OperationState.Finished,
        s"next op on the pool must finish: ${op2.currentState} ${op2.exception}")
      assert(op2.fetchIterator.next().getInt(0) == 7)
    } finally {
      engine.closeSession(sess.id)
      opPool.shutdown()
    }
  }
}
