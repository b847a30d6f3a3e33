package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Credential-shaped scalar helpers (SURVEY.md §2 F7/F9).
  *
  * The reference Fernet-encrypts stored server tokens
  * (app/core/security.py:25-46) and mints UUIDs for export artifacts
  * (app/core/security.py:51). In-engine equivalents built ONLY from
  * codegen'd built-ins — no UDF, no driver-side crypto:
  *
  *  - token at rest: AES + base64. ECB mode is used for the
  *    deterministic demo/oracle path (same plaintext → same token);
  *    production callers should pass "GCM" (the default authenticated
  *    mode — nondeterministic by design).
  *  - deterministic id: an RFC-4122-shaped (version-4 layout) identifier
  *    derived from md5 of a seed column — reproducible across engines
  *    and runs, unlike the built-in `uuid()` (also exposed for parity).
  */
object Security {

  /** Encrypt-and-encode a string column: base64(aes_encrypt(text, key)). */
  def encryptToken(text: Column, key: String, mode: String = "GCM"): Column =
    base64(aes_encrypt(text.cast("binary"), lit(key), lit(mode)))

  /** Inverse of [[encryptToken]]: try_aes_decrypt(unbase64(token)) as
    * string — NULL on a corrupt token or key mismatch, the null-safe
    * shape the rest of the module composes with (aes_decrypt would
    * throw in GCM tag verification and fail the whole job over one bad
    * row among 10^9; a key-rotation sweep filters the nulls instead).
    */
  def decryptToken(token: Column, key: String, mode: String = "GCM"): Column =
    try_aes_decrypt(unbase64(token), lit(key), lit(mode)).cast(StringType)

  /** Deterministic RFC-4122-shaped id (8-4-4-4-12, version nibble '4',
    * variant nibble 'a') from md5 of `seed` — engine-portable string ops
    * only, so an oracle can reproduce it exactly.
    */
  def deterministicUuid(seed: Column): Column = {
    val h = md5(concat(lit("uuid:"), seed.cast(StringType)))
    concat(
      substring(h, 1, 8), lit("-"),
      substring(h, 9, 4), lit("-4"),
      substring(h, 14, 3), lit("-a"),
      substring(h, 18, 3), lit("-"),
      substring(h, 21, 12))
  }

  /** The built-in nondeterministic UUID (F9): one fresh v4 per row. */
  def randomUuid(): Column = expr("uuid()")
}
