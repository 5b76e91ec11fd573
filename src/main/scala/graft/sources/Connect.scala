package graft.sources

import scala.concurrent.duration._

/** Connection bring-up with ping-retry — the reference's `Connect`
  * (`connect.go:37-73`: parse DSN, open, ping up to 4× at 1 s intervals
  * before failing). Engine-agnostic here: wraps any side-effecting
  * "ping" (a JDBC `Connection.isValid`, a warehouse health check) in
  * bounded retries. */
object Connect {

  /** Run `ping` up to `attempts` times, sleeping `delay` between
    * failures; returns the first success or throws the last failure
    * (reference retry loop: `connect.go:38-41,56-64`). */
  @annotation.tailrec
  def withRetry[T](attempts: Int = 4, delay: FiniteDuration = 1.second)(ping: () => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    scala.util.Try(ping()) match {
      case scala.util.Success(t) => t
      case scala.util.Failure(e) if attempts <= 1 => throw e
      case scala.util.Failure(_) =>
        Thread.sleep(delay.toMillis)
        withRetry(attempts - 1, delay)(ping)
    }
  }
}
