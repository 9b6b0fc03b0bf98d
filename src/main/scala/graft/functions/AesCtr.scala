package graft.functions

import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.unsafe.types.UTF8String

/** AES-CTR payload crypto.
  *
  * The reference decrypts each record's `dbObject` with AES in CTR mode,
  * using the full 16-byte IV as the big-endian initial counter
  * (reference: steps/dks.py:125-134). `javax.crypto`'s
  * "AES/CTR/NoPadding" with `IvParameterSpec(iv)` has exactly those
  * semantics. Key, IV and ciphertext travel base64-encoded; plaintext is
  * UTF-8 — same contract as the reference.
  *
  * Static helpers below are the codegen targets, so the expressions stay
  * inside whole-stage codegen (no UDF boxing, no fallback).
  */
object AesCtr {
  private val ciphers = ThreadLocal.withInitial[Cipher](() =>
    Cipher.getInstance("AES/CTR/NoPadding"))

  def apply(mode: Int, data: Array[Byte], key: Array[Byte], iv: Array[Byte]): Array[Byte] = {
    val c = ciphers.get()
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ciphertext b64 × key b64 × iv b64 → utf8 plaintext */
  def decryptB64(ct: UTF8String, keyB64: UTF8String, ivB64: UTF8String): UTF8String = {
    val d = Base64.getDecoder
    UTF8String.fromBytes(apply(Cipher.DECRYPT_MODE,
      d.decode(ct.toString), d.decode(keyB64.toString), d.decode(ivB64.toString)))
  }

  /** utf8 plaintext × key b64 × iv b64 → ciphertext b64 */
  def encryptB64(plain: UTF8String, keyB64: UTF8String, ivB64: UTF8String): UTF8String = {
    val d = Base64.getDecoder
    UTF8String.fromString(Base64.getEncoder.encodeToString(
      apply(Cipher.ENCRYPT_MODE, plain.getBytes, d.decode(keyB64.toString), d.decode(ivB64.toString))))
  }
}
