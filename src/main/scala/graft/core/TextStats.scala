package graft.core

/** Per-text-block analysis record — mirror of NLPTextProperties
  * (`wordslab.nlptextdoc/NLPTextAnalyzer.cs:13-30`).
  */
final case class TextStats(
    chars: Int,
    letterChars: Int,
    numberChars: Int,
    otherChars: Int,
    words: Int,
    avgWordLength: Int) {
  def whitespaceChars: Int = chars - letterChars - numberChars - otherChars
}

object TextStats {

  /** Whitespace with C# char.IsWhiteSpace semantics: Java's isWhitespace
    * EXCLUDES the non-breaking spaces (U+00A0, U+2007, U+202F) and NEL
    * (U+0085) that C# includes — the reference splits words on all of them
    * (`NLPTextAnalyzer.cs:217`), and &nbsp; decodes to U+00A0.
    */
  @inline def isWhitespaceCs(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u00A0' || c == '\u2007' || c == '\u202F' || c == '\u0085'

  /** C# string.Trim() analog (strips the same whitespace set as above). */
  def trimCs(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && isWhitespaceCs(s.charAt(a))) a += 1
    while (b > a && isWhitespaceCs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Word/char counting with the exact semantics of
    * `NLPTextAnalyzer.CountWordsAndChars` (`NLPTextAnalyzer.cs:205-255`):
    * words are maximal non-whitespace runs (C# IsWhiteSpace set);
    * avgWordLength is the integer division of summed word lengths by word
    * count; char classes via Character.isLetter / isDigit-equivalent
    * (C# Char.IsNumber) / other.
    */
  def of(text: String): TextStats = {
    var letters = 0; var numbers = 0; var others = 0
    var words = 0; var sumWordLen = 0
    var inWord = false; var wordStart = -1; var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isWhitespaceCs(c)) {
        if (inWord) { words += 1; sumWordLen += i - wordStart; inWord = false; wordStart = -1 }
      } else {
        if (!inWord) { inWord = true; wordStart = i }
        if (Character.isLetter(c)) letters += 1
        else if (Character.isDigit(c)) numbers += 1
        else others += 1
      }
      i += 1
    }
    if (inWord) { words += 1; sumWordLen += n - wordStart }
    val avg = if (words > 0) sumWordLen / words else 0
    TextStats(n, letters, numbers, others, words, avg)
  }

  /** Stable 64-bit content hash of a text block: XXH64(UTF-8 bytes, seed 0),
    * the same hash family the reference uses for its unique-text dictionary
    * (`NLPTextAnalyzer.ComputeStableHash:269-274`). We keep the canonical
    * XXH64 value (the reference byte-flips it through BitConverter; parity
    * of the *dedup semantics* only needs internal consistency).
    */
  def textHash(text: String): Long =
    XxHash64.hash(text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L)
}

/** Standard XXH64 (Yann Collet's xxHash, public spec
  * github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), seed
  * parameterized. Spark's builtin `xxhash64` expression is the same
  * algorithm at seed 42 over Catalyst's internal encoding; we need seed-0
  * bytes-level hashing in plain Scala (driver/executor code paths outside
  * codegen), so implement it here.
  */
object XxHash64 {
  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  private val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)
  @inline private def readLong(b: Array[Byte], i: Int): Long = {
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
    ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)
  }
  @inline private def readInt(b: Array[Byte], i: Int): Long = {
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
    ((b(i + 3) & 0xffL) << 24)
  }
  @inline private def round(acc: Long, in: Long): Long =
    rotl(acc + in * P2, 31) * P1
  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  def hash(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(bytes, i))
        v2 = round(v2, readLong(bytes, i + 8))
        v3 = round(v3, readLong(bytes, i + 16))
        v4 = round(v4, readLong(bytes, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, readLong(bytes, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readInt(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  def hashLong(value: Long, seed: Long): Long = {
    var h = seed + P5 + 8
    h = rotl(h ^ round(0L, value), 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }
}
