package graft

import org.apache.spark.sql.functions._

/** Ground-truth contracts for the AES pair (q154's oracle can only see
  * the round-trip identity and the PKCS#7 length law — these pin the
  * cipher itself):
  *
  *  - the PUBLIC all-zero AES-128-ECB known-answer vector
  *    (key = 16×00, plaintext = 16×00 → 66e94bd4ef8a2c3b884cfa59ca342b2e,
  *    NIST FIPS-197 / SP 800-38A family; reproduced with `openssl enc
  *    -aes-128-ecb -nopad` independently of the JVM);
  *  - ECB is deterministic; CBC without an explicit IV is salted
  *    (Spark prepends a random IV) so equal plaintexts encrypt
  *    differently yet still round-trip;
  *  - GCM authenticates: try_aes_decrypt under a wrong key yields NULL,
  *    never garbage plaintext.
  *
  * Reference surface: DAGUtils.cpp AesEncrypt/AesDecrypt(+IV) rows.
  */
class CryptoSpec extends SparkTestBase {

  test("AES-128-ECB reproduces the public all-zero known-answer vector") {
    // Spark's ECB is PKCS-padded only, so a 16-byte plaintext encrypts to
    // two blocks; block 1 is the raw AES of the plaintext block and must
    // equal the public vector.
    val row = spark.sql(
      """SELECT lower(substr(hex(aes_encrypt(
        |  cast(unhex('00000000000000000000000000000000') as binary),
        |  cast(unhex('00000000000000000000000000000000') as binary),
        |  'ECB')), 1, 32)) AS ct1""".stripMargin).head()
    assert(row.getString(0) === "66e94bd4ef8a2c3b884cfa59ca342b2e")
  }

  test("ECB is deterministic; IV-less CBC is salted but still inverts") {
    val r = spark.sql(
      """SELECT
        |  aes_encrypt('payload', '0123456789abcdef', 'ECB') =
        |    aes_encrypt('payload', '0123456789abcdef', 'ECB')       AS ecb_same,
        |  aes_encrypt('payload', '0123456789abcdef', 'CBC') =
        |    aes_encrypt('payload', '0123456789abcdef', 'CBC')       AS cbc_same,
        |  cast(aes_decrypt(aes_encrypt('payload', '0123456789abcdef', 'CBC'),
        |    '0123456789abcdef', 'CBC') as string)                   AS rt""".stripMargin)
      .head()
    assert(r.getBoolean(0), "ECB must be deterministic")
    assert(!r.getBoolean(1), "CBC without IV must salt (random IV per call)")
    assert(r.getString(2) === "payload")
  }

  test("CBC with an explicit IV matches an independent openssl ciphertext") {
    // AesEncryptIV analog: aes_encrypt(..., iv) must be deterministic and
    // byte-identical to `openssl enc -aes-128-cbc -K 3031..66 -iv 0001..0f`
    // over the same 16-byte plaintext (PKCS padding on both sides). Spark
    // emits [iv][ciphertext]; the suffix after the 16-byte IV is compared.
    val r = spark.sql(
      """SELECT lower(substr(hex(aes_encrypt('payload-16bytes!',
        |  '0123456789abcdef', 'CBC', 'DEFAULT',
        |  unhex('000102030405060708090A0B0C0D0E0F'))), 33)) AS ct,
        |cast(aes_decrypt(aes_encrypt('payload-16bytes!',
        |  '0123456789abcdef', 'CBC', 'DEFAULT',
        |  unhex('000102030405060708090A0B0C0D0E0F')),
        |  '0123456789abcdef', 'CBC') as string) AS rt""".stripMargin).head()
    assert(r.getString(0) ===
      "dc584f316230b0c6c625a66f1706f287ed70156ab322002d8496cdd2707f3de4")
    assert(r.getString(1) === "payload-16bytes!")
  }

  test("GCM try_aes_decrypt rejects a wrong key with NULL, not garbage") {
    val r = spark.sql(
      """SELECT
        |  try_aes_decrypt(aes_encrypt('secret', '0123456789abcdef', 'GCM'),
        |    'ffffffffffffffff', 'GCM') AS bad,
        |  cast(try_aes_decrypt(aes_encrypt('secret', '0123456789abcdef', 'GCM'),
        |    '0123456789abcdef', 'GCM') as string) AS good""".stripMargin).head()
    assert(r.isNullAt(0), "wrong-key GCM decrypt must be NULL")
    assert(r.getString(1) === "secret")
  }
}
