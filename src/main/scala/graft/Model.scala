package graft

/** The reference's streamed entity, recovered from its tests
  * (`hashes_test.go:146-162`, producer `hashes_test.go:205-215`; struct
  * lives in the private parent repo). Column names follow the intended
  * INSERT (`hashes.go:25`): `limits_hashes(user_id, amount, msg, sha256sum)`.
  * `UInt32 amount` widened to Long (Spark has no unsigned ints). */
final case class LimitHash(
    user_id: String,
    amount: Long,
    msg: Array[Byte],
    sha256sum: String)

/** Typed row of the events corpus table (post ns→µs conversion). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)
