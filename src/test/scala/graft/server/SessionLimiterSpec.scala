package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Unit decision table for the limiter's admission accounting —
  * especially the interaction between admissions in flight and
  * hot-swapped unlimited/deny lists (reference kyuubi-server/.../
  * session/SessionLimiter.scala derives release keys from the CURRENT
  * list, which desyncs counters across a swap; ours records the keys
  * each admission actually took).
  */
class SessionLimiterSpec extends AnyFunSuite {

  test("release decrements exactly the keys the admission took") {
    val l = new SessionLimiter(userLimit = 2, ipLimit = 2, userIpLimit = 2)
    val a = l.increment("u", "1.2.3.4")
    assert(a.keys.toSet == Set("u", "1.2.3.4", "u:1.2.3.4"))
    assert(l.count("u") == 1 && l.count("1.2.3.4") == 1 && l.count("u:1.2.3.4") == 1)
    l.release(a)
    assert(l.count("u") == 0 && l.count("1.2.3.4") == 0 && l.count("u:1.2.3.4") == 0)
  }

  test("user added to unlimited AFTER admission still releases its keys on close") {
    val l = new SessionLimiter(userLimit = 1)
    val a = l.increment("u", "")
    l.setUnlimitedUsers(Set("u")) // hot swap mid-connection
    l.release(a)
    // no permanent slot leak: the counter is balanced, and once the
    // user leaves the unlimited list the cap is fully available again
    assert(l.count("u") == 0)
    l.setUnlimitedUsers(Set.empty)
    l.release(l.increment("u", ""))
  }

  test("user removed from unlimited AFTER admission releases nothing it never took") {
    val l = new SessionLimiter(userLimit = 1, ipLimit = 2)
    l.setUnlimitedUsers(Set("svc"))
    val svc = l.increment("svc", "9.9.9.9") // bypass: takes NO keys
    assert(svc.keys.isEmpty)
    // a sibling connection holds real counts on the shared ip key
    val other = l.increment("u", "9.9.9.9")
    l.setUnlimitedUsers(Set.empty) // hot swap mid-connection
    l.release(svc)
    // svc's release must not erase the sibling's ip count
    assert(l.count("9.9.9.9") == 1 && l.count("u") == 1)
    l.release(other)
    assert(l.count("9.9.9.9") == 0 && l.count("u") == 0)
  }

  test("refused admission rolls back every key it had taken") {
    val l = new SessionLimiter(userLimit = 2, ipLimit = 1)
    val a = l.increment("u", "1.1.1.1")
    val e = intercept[IllegalStateException](l.increment("u", "1.1.1.1"))
    assert(e.getMessage.contains("per ipaddress"))
    // the refused open ate no user:ip or user headroom
    assert(l.count("u") == 1 && l.count("1.1.1.1") == 1)
    l.release(a)
    assert(l.count("u") == 0 && l.count("1.1.1.1") == 0)
  }

  test("deny-IP list rejects with the reference message; deny beats unlimited") {
    val l = new SessionLimiter(userLimit = 10,
      initialUnlimitedUsers = Set("svc"), initialDenyIps = Set("6.6.6.6"))
    val e = intercept[IllegalStateException](l.increment("svc", "6.6.6.6"))
    assert(e.getMessage ==
      "Connection denied because the client ip is in the deny ip list. (ipAddress: 6.6.6.6)")
    // hot-swap: un-denying the ip admits; re-denying rejects again
    l.setDenyIps(Set.empty)
    l.release(l.increment("svc", "6.6.6.6"))
    l.setDenyIps(Set("6.6.6.6"))
    intercept[IllegalStateException](l.increment("u", "6.6.6.6"))
    // an open with no ip (e.g. a non-socket transport) is not denied
    l.release(l.increment("u", ""))
  }
}
