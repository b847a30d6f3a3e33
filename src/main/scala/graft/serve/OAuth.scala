package graft.serve

/** The OAuth2 code-flow state machine (oauth.py:24-146), engine-side:
  * the behavior the reference implements AROUND its external pieces —
  * state issuance with a 5-minute TTL and single-use redemption
  * (Redis `setex`/`get`+`delete`, oauth.py:51,91-96), server resolution
  * by URL then by id, the create-or-update user upsert, and the
  * 302-vs-token response split — with the external pieces injected
  * ([[OAuth.Exchange]] = `request_onadata_credentials` + profile fetch;
  * randomness and the clock injected for deterministic replay).
  */
object OAuth {

  /** What the login route stashes behind the state key. */
  case class AuthState(serverId: Long, redirectUrl: Option[String])

  /** In-memory TTL + single-use state store — the Redis `setex` /
    * `get`-then-`delete` pair. The clock is supplied per call so specs
    * replay expiry deterministically. Every [[put]] sweeps expired
    * entries first (O(in-flight logins), driver-side), so abandoned
    * logins — /oauth/login is unauthenticated by design, so anyone can
    * mint states — are bounded by the TTL window instead of
    * accumulating for the server's lifetime.
    */
  class StateStore(ttlMillis: Long = 5 * 60 * 1000L) {
    private val entries =
      collection.mutable.Map.empty[String, (AuthState, Long)]
    def put(key: String, st: AuthState, nowMillis: Long): Unit =
      synchronized {
        entries.filterInPlace { case (_, (_, deadline)) => nowMillis < deadline }
        entries(key) = (st, nowMillis + ttlMillis)
      }
    /** Single-use redemption: present AND unexpired, then deleted. */
    def take(key: String, nowMillis: Long): Option[AuthState] = synchronized {
      val hit = entries.remove(key)
      hit.collect { case (st, deadline) if nowMillis < deadline => st }
    }
  }

  /** code → (accessToken, refreshToken); throw [[CredentialsError]] for
    * the reference's 400 branch.
    */
  type Exchange = (graft.catalog.ServerMeta, String) => (String, String)
  /** accessToken → username; throw for the reference's 502 branch. */
  type Profile = String => String

  case class CredentialsError(msg: String) extends Exception(msg)

  /** Deterministic bearer token for an authenticated user id (the
    * engine-side analog of `create_access_token`): HMAC-SHA256 over the
    * id under the serving secret, hex-encoded.
    */
  def accessToken(secret: String, userId: Long): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(s"user:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
