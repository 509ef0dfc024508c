package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.sparkproject.connect.grpc.{Metadata, ServerCall, ServerCallHandler, ServerInterceptor, Status}

/** Minted per-connection tokens — the issuance half of the reference's
  * auth stack (`ella-server/src/server/auth.rs`): `AuthProvider` signs
  * HMAC-SHA256 JWTs whose `jti` is a fresh connection id, `handshake`
  * mints one and REGISTERS the id, and the interceptor admits a
  * request only when the signature verifies AND the id is still
  * registered — so a structurally valid token is revocable by
  * dropping its registration, without key rotation.
  *
  * The Spark-first wiring: [[GraftAuthInterceptor]] installs on the
  * Connect gRPC server via `spark.connect.grpc.interceptor.classes`
  * (the conf requires a zero-arg class, so the key + registry live in
  * this object, installed by [[Serve.start]] before the service
  * boots); the handshake surface is HTTP on the [[MetricsServer]]
  * (`POST /token` gated by the admin secret ≙ flight.rs
  * `do_handshake`; `DELETE /token/<jti>` revokes). Tokens carry
  * `iat` + `jti` like the reference's `RegisteredClaims` (no
  * expiration — lifetime is the registration, exactly auth.rs).
  *
  * Scale note: verification is driver-local HMAC + one concurrent-set
  * lookup per RPC — no Spark job, no state beyond O(live
  * connections).
  */
object TokenAuth {
  @volatile private var key: Option[SecretKeySpec] = None
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val b64 = Base64.getUrlEncoder.withoutPadding
  private val b64d = Base64.getUrlDecoder

  /** Install the signing secret (and clear prior registrations). */
  def install(secret: String): Unit = {
    require(secret.nonEmpty, "token-auth secret must be non-empty")
    key = Some(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    registered.clear()
  }

  /** Disable token auth; the interceptor becomes a pass-through. */
  def uninstall(): Unit = { key = None; registered.clear() }

  def enabled: Boolean = key.isDefined
  def activeTokens: Int = registered.size()

  private def sign(data: String): String = {
    val k = key.getOrElse(sys.error("token auth not installed"))
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(k)
    b64.encodeToString(mac.doFinal(data.getBytes(UTF_8)))
  }

  /** Mint + register a connection token (≙ ConnectionManager.handshake).
    * Returns (token, jti). */
  def mint(subject: Option[String] = None): (String, String) = {
    val jti = java.util.UUID.randomUUID().toString.replace("-", "")
    val iat = System.currentTimeMillis() / 1000L
    val sub = subject.map(s => s""","sub":"${s.replace("\\", "").replace("\"", "")}"""").getOrElse("")
    val header = b64.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val payload = b64.encodeToString(s"""{"jti":"$jti","iat":$iat$sub}""".getBytes(UTF_8))
    val body = s"$header.$payload"
    registered.add(jti)
    (s"$body.${sign(body)}", jti)
  }

  /** Drop a connection id; its token stops verifying immediately. */
  def revoke(jti: String): Boolean = registered.remove(jti)

  /** Right(jti) when the signature verifies and the id is registered. */
  def verify(token: String): Either[String, String] = {
    if (!enabled) return Left("token auth not installed")
    token.split('.') match {
      case Array(h, p, s) =>
        val expect = sign(s"$h.$p")
        if (!java.security.MessageDigest.isEqual(expect.getBytes(UTF_8), s.getBytes(UTF_8)))
          Left("invalid token: bad signature")
        else {
          // a bad base64 payload must REJECT, not throw into the RPC
          // (it cannot normally happen — the signature already
          // verified — but a defense against signing-oracle misuse)
          val payload = try new String(b64d.decode(p), UTF_8)
            catch { case _: IllegalArgumentException => "" }
          """"jti"\s*:\s*"([0-9a-f]+)"""".r.findFirstMatchIn(payload).map(_.group(1)) match {
            case Some(jti) if registered.contains(jti) => Right(jti)
            case Some(_) => Left("no active connection found for connection id")
            case None => Left("invalid token: missing connection id")
          }
        }
      case _ => Left("invalid token: not a signed token")
    }
  }

  /** `Authorization: Bearer <token>` → verify (≙ extract_payload). */
  def verifyHeader(header: Option[String]): Either[String, String] =
    header match {
      case Some(h) => h.split(" ", 2) match {
        case Array("Bearer", t) => verify(t)
        case _ => Left("authorization header is not a Bearer token")
      }
      case None => Left("missing connection token")
    }
}

/** gRPC interceptor admitting only minted, still-registered tokens
  * (≙ `impl Interceptor for ConnectionManager`). Zero-arg so
  * `spark.connect.grpc.interceptor.classes` can construct it; a
  * pass-through while [[TokenAuth]] is not installed, so the conf may
  * stay set across serve restarts in one JVM. */
final class GraftAuthInterceptor extends ServerInterceptor {
  private val AuthKey =
    Metadata.Key.of("authorization", Metadata.ASCII_STRING_MARSHALLER)

  override def interceptCall[Req, Resp](
      call: ServerCall[Req, Resp],
      headers: Metadata,
      next: ServerCallHandler[Req, Resp]): ServerCall.Listener[Req] = {
    if (!TokenAuth.enabled) next.startCall(call, headers)
    else TokenAuth.verifyHeader(Option(headers.get(AuthKey))) match {
      case Right(_) => next.startCall(call, headers)
      case Left(msg) =>
        call.close(Status.UNAUTHENTICATED.withDescription(msg), new Metadata)
        new ServerCall.Listener[Req] {}
    }
  }
}
