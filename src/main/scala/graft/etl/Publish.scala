package graft.etl

/** Post-commit publish fan-out + destination-config validation — the
  * engine-side half of the reference's Tableau sink (S9/S10,
  * app/libs/tableau/client.py), with ALL external I/O injected exactly
  * like [[AsyncExport]]'s transport (no Tableau SDK or network in env;
  * the combinator owns the behavior the reference implements around the
  * SDK):
  *
  *  - publish runs AFTER the extract commit (the reference publishes the
  *    written .hyper artifact, app/utils/hyper_utils.py);
  *  - sign-in opens a session, sign-out ALWAYS runs (the reference's
  *    `with server.auth.sign_in(...)` context manager, client.py:53-55);
  *  - the project id comes from a full paged scan of all projects
  *    (`TSC.Pager`, client.py:60-62) and the LAST name match wins —
  *    the reference's loop assigns without breaking; we keep that
  *    semantic but raise a CLEAR error when no project matches (the
  *    reference would die on an unbound local — a latent crash this
  *    port refuses to reproduce);
  *  - publish mode is Overwrite (client.py:57);
  *  - validation (S10) is a sign-in/sign-out round trip whose failure is
  *    wrapped in [[Publish.InvalidConfiguration]] (client.py:21-38,
  *    surfaced to the config CRUD as HTTP 400 in the reference).
  */
object Publish {

  /** The destination config the reference builds a client from
    * (configuration.py fields; token arrives already decrypted — at-rest
    * crypto is F7's `Security` pair).
    */
  case class Destination(serverAddress: String, siteName: String,
                         tokenName: String, tokenValue: String,
                         projectName: String)

  case class InvalidConfiguration(msg: String, cause: Throwable)
    extends Exception(msg, cause)

  /** One signed-in session; `projects` streams (id, name) pages flattened
    * (the Pager), `publish` returns the created datasource id.
    */
  trait Session {
    def projects: Iterator[(String, String)]
    def publish(projectId: String, extractPath: String, overwrite: Boolean): String
    def signOut(): Unit
  }

  /** The injected transport: PAT sign-in → session, throwing on bad
    * auth/address.
    */
  type SignIn = Destination => Session

  /** S10: validate a destination by a sign-in/sign-out round trip;
    * any failure is wrapped in [[InvalidConfiguration]].
    */
  def validateConfiguration(signIn: SignIn, dest: Destination): Unit =
    try signIn(dest).signOut()
    catch {
      case scala.util.control.NonFatal(e) =>
        throw InvalidConfiguration(s"Failed to validate configuration: ${e.getMessage}", e)
    }

  /** S9: publish a committed extract. Returns the datasource id. */
  def publishExtract(signIn: SignIn, dest: Destination,
                     extractPath: String): String = {
    val session = signIn(dest)
    try {
      // full paged scan; LAST match wins (reference loop semantics)
      val projectId = session.projects.foldLeft(Option.empty[String]) {
        case (acc, (id, name)) => if (name == dest.projectName) Some(id) else acc
      }.getOrElse(throw new NoSuchElementException(
        s"project '${dest.projectName}' not found on ${dest.serverAddress}"))
      session.publish(projectId, extractPath, overwrite = true)
    } finally {
      // a signOut failure on an already-broken session must not REPLACE
      // the original publish/lookup exception (finally semantics would
      // propagate it and hide the root cause) — sign-out is best-effort
      try session.signOut()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
