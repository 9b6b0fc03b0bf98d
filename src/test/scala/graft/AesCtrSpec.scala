package graft

import java.util.Base64

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AesCtr

/** AES-CTR parity: the reference decrypts with pycryptodome CTR using
  * the full 16-byte IV as big-endian initial counter
  * (reference: steps/dks.py:125-134, steps/tests.py:24-46). NIST
  * SP 800-38A §F.5.1/F.5.2 pins those exact semantics, so matching the
  * published vectors proves cross-implementation parity — a roundtrip
  * test alone can't (a mirrored bug passes its own roundtrip).
  */
class AesCtrSpec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // NIST SP 800-38A F.5.1 (AES-128 CTR encrypt)
  private val key = hex("2b7e151628aed2a6abf7158809cf4f3c")
  private val counter = hex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
  private val plain = hex(
    "6bc1bee22e409f96e93d7e117393172a" +
      "ae2d8a571e03ac9c9eb76fac45af8e51" +
      "30c81c46a35ce411e5fbc1191a0a52ef" +
      "f69f2445df4f9b17ad2b417be66c3710")
  private val cipher = hex(
    "874d6191b620e3261bef6864990db6ce" +
      "9806f66b7970fdff8617187bb9fffdff" +
      "5ae4df3edbd5d35e5b4f09020db03eab" +
      "1e031dda2fbe03d1792170a0f3009cee")

  test("matches NIST SP 800-38A F.5.1 AES-128-CTR vectors") {
    assert(AesCtr(javax.crypto.Cipher.ENCRYPT_MODE, plain, key, counter)
      .toSeq === cipher.toSeq)
    assert(AesCtr(javax.crypto.Cipher.DECRYPT_MODE, cipher, key, counter)
      .toSeq === plain.toSeq)
  }

  test("counter increments across blocks (block 2 differs from block 1 keystream)") {
    // encrypting 32 zero bytes: keystream blocks must differ
    val zeros = Array.fill[Byte](32)(0)
    val ks = AesCtr(javax.crypto.Cipher.ENCRYPT_MODE, zeros, key, counter)
    assert(ks.slice(0, 16).toSeq !== ks.slice(16, 32).toSeq)
  }

  test("b64 helpers roundtrip utf-8 incl. non-ascii") {
    val enc = Base64.getEncoder
    val keyB64 = UTF8String.fromString(enc.encodeToString(key))
    val ivB64 = UTF8String.fromString(enc.encodeToString(counter))
    val msg = UTF8String.fromString("""{"k": "çπ中文", "n": 42}""")
    val ct = AesCtr.encryptB64(msg, keyB64, ivB64)
    assert(AesCtr.decryptB64(ct, keyB64, ivB64).toString === msg.toString)
    assert(ct.toString !== msg.toString)
  }
}
