package graft.etl

import org.apache.spark.sql.SparkSession

/** Engine-side re-expression of the reference's asynchronous-export
  * acquisition loop — the code path every sync starts with.
  *
  * Reference behavior (app/core/onadata.py:93-144 `_download_export`):
  * GET the form's `export_async` endpoint; a 202 response carries a JSON
  * body with `job_status`, and the client (a) downloads `export_url` when
  * `job_status == "SUCCESS"`, (b) raises with `progress` on `"FAILURE"`,
  * (c) otherwise appends `&job_uuid=<uuid>` so the SAME server-side job is
  * resumed on re-poll, sleeps `30 * (retries + 1)` seconds, and re-polls up
  * to 3 times before declaring the export stuck. A 401 refreshes the OAuth
  * access token and restarts the poll loop from scratch; a 404 or any
  * other status is a hard failure. The export body itself is streamed to a
  * temp file with its own retry loop (onadata.py:30-45), and the transport
  * underneath retries 500/502/503/504 with an exponential backoff of
  * factor 1.1 (onadata.py:57-69, urllib3 `Retry`).
  *
  * This environment has no network, so the TRANSPORT IS INJECTED: `poll`
  * and `fetch` are plain functions and the clock is a `sleeper` callback.
  * The state machine — resume-by-job_uuid, linear poll backoff, poll
  * budget, token-refresh restart, fetch retries, failure taxonomy — is the
  * real, spec-tested engine code; a production deployment supplies an HTTP
  * `poll`/`fetch` pair and `Thread.sleep` without touching this logic.
  *
  * Two deliberate divergences from the reference, both defensive:
  *   - `job_uuid` is appended to the URL only if not already present (the
  *     reference re-appends on every in-progress poll, growing the URL);
  *   - token refreshes are capped (`maxTokenRefreshes`) — the reference
  *     recurses unboundedly on repeated 401s (onadata.py:127-130).
  * And one reference BUG not reproduced: `write_export_to_temp_file` is
  * invoked with `retry=3` against an `if retry < 3` guard (onadata.py:107,
  * 41), so its retry loop can never fire and a transient non-200 returns
  * `None`. Here `fetch` genuinely gets `maxFetchAttempts` tries.
  */
object AsyncExport {

  /** One poll of the async-export endpoint — the reference's observable
    * response surface, minus the wire.
    */
  sealed trait PollResult
  object PollResult {
    /** HTTP 202 with a JSON job document (onadata.py:98-121). */
    final case class Accepted(jobStatus: String,
                              jobUuid: Option[String] = None,
                              exportUrl: Option[String] = None,
                              progress: Option[String] = None) extends PollResult
    /** HTTP 401 — access token expired (onadata.py:127-130). */
    case object TokenExpired extends PollResult
    /** HTTP 404 — form or export gone (onadata.py:132-136). */
    case object NotFound extends PollResult
    /** Any other terminal HTTP status (onadata.py:138-143). */
    final case class HttpError(statusCode: Int) extends PollResult
  }

  /** Terminal acquisition failure — mirrors the reference's
    * `FailedExternalRequest` taxonomy so callers can route
    * per-cause (retry the sync later vs deactivate the file).
    */
  final case class ExportFailed(reason: String)
      extends RuntimeException(s"Failed to export CSV: $reason")

  /** Transport-level retry with exponential backoff — the reference's
    * urllib3 `Retry(total=3, backoff_factor=1.1, status_forcelist=
    * [500, 502, 503, 504])` (onadata.py:57-69). Retries ONLY when
    * `retryable` says so (the forcelist), sleeping
    * `backoffFactor * 2^(attempt-1)` seconds (urllib3's curve) between
    * attempts; non-retryable results and exhausted budgets return as-is
    * for the caller's own failure handling.
    */
  def withRetry[A](call: () => A)(retryable: A => Boolean,
                                  maxRetries: Int = 3,
                                  backoffFactor: Double = 1.1,
                                  sleeper: Long => Unit): A = {
    var attempt = 0
    var out = call()
    while (retryable(out) && attempt < maxRetries) {
      sleeper((backoffFactor * math.pow(2, attempt) * 1000).toLong)
      attempt += 1
      out = call()
    }
    out
  }

  /** Append (or REPLACE) the `job_uuid` param: the server may issue a new
    * uuid mid-flight (old job purged, or a fresh job after a 401 restart);
    * keeping the stale one would poll a dead job until the budget runs out.
    */
  private[etl] def addJobUuid(url: String, uuid: String): String = {
    val base = url
      .replaceAll("([?&])job_uuid=[^&]*&", "$1")
      .replaceAll("[?&]job_uuid=[^&]*$", "")
    val sep = if (base.contains("?")) "&" else "?"
    s"$base${sep}job_uuid=$uuid"
  }

  /** Drive the poll/backoff/resume state machine until the export body is
    * on local (or any Hadoop-FS) storage; returns the fetched path.
    *
    * @param exportUrl    the `export_async.json?format=csv...` URL
    * @param poll         GET the URL, classify the response
    * @param fetch        stream `export_url` to a file; None = non-200
    * @param sleeper      receives each backoff in MILLISECONDS (inject
    *                     `Thread.sleep` in production, a recorder in tests)
    * @param refreshToken invoked on [[PollResult.TokenExpired]] before the
    *                     loop restarts with a fresh poll budget
    * @param maxPolls     in-progress re-polls before "took too long"
    *                     (reference: 3, onadata.py:115-121)
    */
  def downloadExport(exportUrl: String,
                     poll: String => PollResult,
                     fetch: String => Option[String],
                     sleeper: Long => Unit,
                     refreshToken: () => Unit = () => (),
                     maxPolls: Int = 3,
                     maxFetchAttempts: Int = 3,
                     maxTokenRefreshes: Int = 1): String = {
    import PollResult._
    var url = exportUrl
    var polls = 0           // in-progress re-polls spent (resets on 401)
    var refreshes = 0
    while (true) {
      poll(url) match {
        case Accepted("SUCCESS", _, Some(ready), _) =>
          var attempt = 0
          while (attempt < maxFetchAttempts) {
            fetch(ready) match {
              case Some(path) => return path
              case None       => attempt += 1
            }
          }
          throw ExportFailed(s"URL: $ready download failed after $maxFetchAttempts attempts")
        case Accepted("FAILURE", _, _, progress) =>
          throw ExportFailed(progress.getOrElse("FAILURE"))
        case Accepted("SUCCESS", _, None, _) =>
          // a SUCCESS with no export_url is a malformed terminal response
          // — falling through to the in-progress branch would burn the
          // whole poll budget and then blame a stuck job ("took too
          // long") for what is actually a bad server payload
          throw ExportFailed(s"URL: $url job_status SUCCESS carried no export_url")
        case Accepted(_, jobUuid, _, _) =>
          jobUuid.foreach(u => url = addJobUuid(url, u))
          if (polls >= maxPolls)
            throw ExportFailed(s"URL: $url took too long")
          sleeper(30000L * (polls + 1))
          polls += 1
        case TokenExpired =>
          if (refreshes >= maxTokenRefreshes)
            throw ExportFailed(s"URL: $url access token refresh loop")
          refreshToken()
          refreshes += 1
          polls = 0
          // the reference restarts the recursion fresh (onadata.py:129):
          // drop any appended job_uuid too — the refreshed session may
          // start a brand-new job, and its status response will hand us
          // the uuid to resume from
          url = exportUrl
        case NotFound =>
          throw ExportFailed(s"URL: $url 404 not found")
        case HttpError(code) =>
          throw ExportFailed(s"URL: $url, status_code: $code")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The complete S5 story: acquire the CSV export (poll/backoff/resume),
    * ingest it with the reference's null/type policy ([[Ingest.readCsv]]),
    * and atomically full-refresh the columnar extract
    * ([[Refresh.overwriteStaged]] — the committed extract survives a
    * crash mid-refresh); returns the refreshed extract's row count —
    * exactly what the reference's sync returns to its scheduler
    * (app/utils/onadata_utils.py flow).
    */
  def syncExport(spark: SparkSession,
                 exportUrl: String,
                 poll: String => PollResult,
                 fetch: String => Option[String],
                 sleeper: Long => Unit,
                 extractPath: String,
                 refreshToken: () => Unit = () => ()): Long = {
    val csv = downloadExport(exportUrl, poll, fetch, sleeper, refreshToken)
    Refresh.overwriteStaged(Ingest.readCsv(spark, csv), extractPath)
  }
}
