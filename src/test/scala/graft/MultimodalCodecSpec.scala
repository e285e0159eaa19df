package graft

import graft.operators.Multimodal

/** Byte-level contracts for the WAV PCM codec behind q155 (the oracle
  * only sees the derived metadata; these pin the codec itself). */
class MultimodalCodecSpec extends SparkTestBase {

  test("WAV round-trip is bit-exact including both Short extremes") {
    val wave = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1, 12345, -12345)
    val (sr, decoded) = Multimodal.wavDecode(1L, Multimodal.makeWav(44100, wave))
    assert(sr === 44100)
    assert(decoded.toSeq === wave.toSeq)
  }

  test("WAV header fields are canonical RIFF/PCM") {
    val bytes = Multimodal.makeWav(16000, Array[Short](7, -7))
    assert(bytes.length === 48) // 44-byte header + 2×2 data
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    // byte rate = sr × block align (LE32 at offset 28)
    val byteRate = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8) |
      ((bytes(30) & 0xff) << 16) | ((bytes(31) & 0xff) << 24)
    assert(byteRate === 32000)
  }

  test("corrupted magic and truncated data are rejected, not misparsed") {
    val good = Multimodal.makeWav(8000, Array[Short](1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.wavDecode(2L, badMagic))
    intercept[IllegalArgumentException](
      Multimodal.wavDecode(3L, good.dropRight(2))) // data shorter than header claims
  }
}
