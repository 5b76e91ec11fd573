package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.hadoop.fs.{FileSystem, Path}

/** PRODUCTION conditional-put [[LedgerStores.AtomicCreate]] for object
  * stores (VERDICT r19 next #5 — the shipping leg behind the
  * [[LedgerStores.register]] extension point): the ledger's one
  * CAS primitive — create-this-key-only-if-absent — expressed as the
  * HTTP conditional PUT every major object store serves natively,
  * so a 100 TB warehouse on object storage gets real multi-writer
  * safety without an external coordination table.
  *
  * The store arbitrates server-side; the client only sends the
  * precondition header and interprets the failure status:
  *
  *   - Amazon S3:          `If-None-Match: *`              → HTTP 412
  *   - Google Cloud (XML): `x-goog-if-generation-match: 0` → HTTP 412
  *   - Azure Blob/ABFS:    `If-None-Match: *`              → HTTP 409
  *
  * (all three are the stores' public documented conditional-write
  * semantics; 412 and 409 both mean "the key already exists — you
  * lost the CAS", every other non-2xx is a real failure and throws.)
  *
  * ONLY the ledger control plane routes through this client — the
  * `.v-<ordinal>` publishes and maintenance-lease files, a handful of
  * tiny objects per commit. The data plane (parquet segments, reads,
  * listings) stays on the deployment's Hadoop FileSystem connector for
  * the scheme (S3A and friends), whose `create(overwrite = false)` is
  * the check-then-act hazard this class exists to replace
  * ([[LedgerStores]]). Wire-up:
  *
  * {{{
  * LedgerStores.register("s3a", new ConditionalPutHttp(p =>
  *   URI.create(s"https://\${p.toUri.getHost}.s3.amazonaws.com\${p.toUri.getPath}")))
  * }}}
  *
  * plus whatever request signing the deployment's store needs — pass a
  * `decorate` hook to add auth headers (an emulated store needs none;
  * see ObjectStoreLedgerSpec for the full lifecycle against one). */
class ConditionalPutHttp(
    endpoint: Path => URI,
    precondition: (String, String) = ConditionalPutHttp.S3Header,
    decorate: HttpRequest.Builder => HttpRequest.Builder = identity)
    extends LedgerStores.AtomicCreate {

  private val client = HttpClient.newHttpClient()

  override def tryCreateExclusive(fs: FileSystem, p: Path,
      bytes: Array[Byte]): Boolean = {
    val req = decorate(HttpRequest.newBuilder(endpoint(p))
      .header(precondition._1, precondition._2))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.discarding())
      catch {
        case e: java.io.IOException => throw e
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new java.io.IOException(s"conditional PUT of $p interrupted", e)
      }
    resp.statusCode() match {
      case c if c >= 200 && c < 300 => true
      case 412 | 409 => false // precondition failed: lost the CAS, key exists
      case c => throw new java.io.IOException(
        s"conditional PUT of $p to ${req.uri()} failed: HTTP $c — " +
          "neither a win nor a clean CAS loss; refusing to guess " +
          "(a guessed 'false' could double-publish an ordinal on retry)")
    }
  }
}

object ConditionalPutHttp {
  /** S3 / Azure flavor: create-only-if-absent via `If-None-Match: *`. */
  val S3Header: (String, String) = "If-None-Match" -> "*"
  /** GCS XML-API flavor: generation 0 = "the object must not exist". */
  val GcsHeader: (String, String) = "x-goog-if-generation-match" -> "0"
}
