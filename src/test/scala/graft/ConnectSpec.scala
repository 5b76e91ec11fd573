package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Connect
import scala.concurrent.duration._

/** Retry semantics of the Connect helper (reference `connect.go:38-41`:
  * 4 pings at 1 s before giving up). */
class ConnectSpec extends AnyFunSuite {

  test("succeeds on first try without retrying") {
    var calls = 0
    val got = Connect.withRetry(attempts = 4, delay = 1.milli) { () => calls += 1; 42 }
    assert(got === 42 && calls === 1)
  }

  test("retries through transient failures") {
    var calls = 0
    val got = Connect.withRetry(attempts = 4, delay = 1.milli) { () =>
      calls += 1
      if (calls < 3) sys.error("not ready")
      "up"
    }
    assert(got === "up" && calls === 3)
  }

  test("throws the last failure after exhausting attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Connect.withRetry(attempts = 4, delay = 1.milli) { () =>
        calls += 1; sys.error(s"down $calls")
      }
    }
    assert(calls === 4 && e.getMessage === "down 4")
  }
}
