package graft.spec

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

/** Secret encryption for pipeline configs — the `encrypt_string` /
  * vault surface (reference: ansible-vault strings in YAML configs,
  * pipelinewise/cli/__init__.py `encrypt_string`,
  * cli/utils.py vault load/dump).
  *
  * JDK-only implementation: PBKDF2-derived AES-256-GCM. Ciphertext
  * format `!graft-vault:base64(salt(16) || iv(12) || ct+tag)` — a
  * self-contained string that can sit anywhere in a spec JSON;
  * [[decryptConfigured]] resolves any such value at load time.
  */
object Vault {

  val Prefix = "!graft-vault:"
  private val Iterations = 120000
  private val rnd = new SecureRandom()

  private def key(secret: String, salt: Array[Byte]): SecretKeySpec = {
    val f = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val k = f.generateSecret(new PBEKeySpec(
      secret.toCharArray, salt, Iterations, 256)).getEncoded
    new SecretKeySpec(k, "AES")
  }

  def encrypt(plain: String, secret: String): String = {
    val salt = new Array[Byte](16); rnd.nextBytes(salt)
    val iv = new Array[Byte](12); rnd.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key(secret, salt),
      new GCMParameterSpec(128, iv))
    val ct = c.doFinal(plain.getBytes(StandardCharsets.UTF_8))
    Prefix + Base64.getEncoder.encodeToString(salt ++ iv ++ ct)
  }

  def decrypt(vaulted: String, secret: String): String = {
    require(vaulted.startsWith(Prefix), s"not a vault string: expected $Prefix...")
    val raw = Base64.getDecoder.decode(vaulted.stripPrefix(Prefix))
    val (salt, rest) = raw.splitAt(16)
    val (iv, ct) = rest.splitAt(12)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key(secret, salt),
      new GCMParameterSpec(128, iv))
    new String(c.doFinal(ct), StandardCharsets.UTF_8)
  }

  /** Resolve a possibly-vaulted config value: plain strings pass
    * through, `!graft-vault:` strings decrypt with the secret from
    * `GRAFT_VAULT_SECRET` (or the supplied one).
    */
  def resolve(value: String, secret: => Option[String] =
      sys.env.get("GRAFT_VAULT_SECRET")): String =
    if (!value.startsWith(Prefix)) value
    else decrypt(value, secret.getOrElse(sys.error(
      "vaulted value present but GRAFT_VAULT_SECRET is not set")))
}
