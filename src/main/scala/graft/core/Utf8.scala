package graft.core

object Utf8 {
  /** Exact byte count of `s.getBytes(UTF_8)` without materializing it:
    * an unpaired surrogate (high without a following low, or stray low)
    * encodes as a single '?' replacement byte, not a 3/4-byte sequence.
    * Single source of truth — the extractor's buffer sizing and the
    * pipeline's byte metrics must agree.
    */
  def encodedLength(s: String): Long = {
    if (s == null) return 0L
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1
            else if (c < 0x800) 2
            else if (Character.isHighSurrogate(c)) {
              if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) { i += 1; 4 }
              else 1
            }
            else if (Character.isLowSurrogate(c)) 1
            else 3)
      i += 1
    }
    n
  }
}
