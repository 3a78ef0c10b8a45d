package graft.functions

/** TiKV key-codec core (pure byte-level functions; wrapped as Catalyst
  * expressions in [[CodecExpr]]).
  *
  * Semantics mirror the reference's codec surface:
  *  - memcomparable "EncodeBytes" (reference `codec/codec.go:50-52` via
  *    tikv client-go): the input is emitted in groups of 8 bytes, each
  *    group zero-padded to 8 and followed by a marker byte
  *    `0xFF - pad_count` (= 0xF7 + group_len); a full group's marker is
  *    0xFF and an input whose length is a multiple of 8 gets a trailing
  *    empty group (8 zero bytes + marker 0xF7). The encoding preserves
  *    unsigned-lexicographic order — the property the whole scheme
  *    exists for (verified by scalacheck).
  *  - APIv2 raw-key encoding (reference `codec/codec.go:47-52`): prepend
  *    the 4-byte mode prefix `['r',0,0,0]`, then memcomparable-encode.
  *  - APIv2 decode/strip (reference `checksum/checksum.go:31-43`):
  *    memcomparable-decode, then strip the 4-byte prefix of non-empty
  *    keys (reference panics on <4 bytes; here: null/IllegalArgument).
  *  - complemented timestamp (reference `codec/codec.go:35-36`): first 8
  *    bytes as big-endian uint64, bitwise complement (TiKV stores `~ts`
  *    so newer timestamps sort first).
  *  - Go-style escaped-string key parsing (reference
  *    `config/config.go:59-64` `--format=escaped`).
  */
object TiKVCodec {

  val ApiV2Prefix: Array[Byte] = Array('r'.toByte, 0, 0, 0)

  /** Memcomparable encode: order-preserving, self-terminating. */
  def memcomparableEncode(raw: Array[Byte]): Array[Byte] = {
    val groups = raw.length / 8 + 1
    val out = new Array[Byte](groups * 9)
    var g = 0
    while (g < groups) {
      val start = g * 8
      val len = math.min(8, raw.length - start)
      System.arraycopy(raw, start, out, g * 9, len)
      // bytes [len,8) stay zero (pad); marker = 0xF7 + len
      out(g * 9 + 8) = (0xF7 + len).toByte
      g += 1
    }
    out
  }

  /** Memcomparable decode; returns null on malformed input (the
    * analytics-friendly analog of the reference's panic). */
  def memcomparableDecode(enc: Array[Byte]): Array[Byte] = {
    if (enc == null || enc.length == 0 || enc.length % 9 != 0) return null
    val groups = enc.length / 9
    val last = (enc(groups * 9 - 1) & 0xFF) - 0xF7
    if (last < 0 || last > 8) return null
    val out = new Array[Byte]((groups - 1) * 8 + last)
    var g = 0
    while (g < groups) {
      val marker = enc(g * 9 + 8) & 0xFF
      val expect = if (g < groups - 1) 8 else last
      if (marker != 0xF7 + expect) return null
      // padding bytes of the final group must be zero
      var j = expect
      while (j < 8) { if (enc(g * 9 + j) != 0) return null; j += 1 }
      System.arraycopy(enc, g * 9, out, g * 8, expect)
      g += 1
    }
    out
  }

  /** APIv2 raw-key encode: mode prefix + memcomparable. */
  def encodeApiV2Key(raw: Array[Byte]): Array[Byte] = {
    val prefixed = new Array[Byte](4 + raw.length)
    System.arraycopy(ApiV2Prefix, 0, prefixed, 0, 4)
    System.arraycopy(raw, 0, prefixed, 4, raw.length)
    memcomparableEncode(prefixed)
  }

  /** APIv2 raw-key decode: memcomparable-decode, strip the 4-byte mode
    * prefix of non-empty keys. Null on malformed / short keys. */
  def decodeApiV2Key(enc: Array[Byte]): Array[Byte] = {
    val decoded = memcomparableDecode(enc)
    if (decoded == null) null
    else if (decoded.length == 0) decoded
    else if (decoded.length < 4) null
    else java.util.Arrays.copyOfRange(decoded, 4, decoded.length)
  }

  /** Complemented big-endian timestamp of the first 8 key bytes. The
    * result is the uint64 `~ts` reinterpreted as a signed long (callers
    * needing the unsigned rendering widen to decimal). */
  def decodeTs(key: Array[Byte]): java.lang.Long = {
    if (key == null || key.length < 8) return null
    var ts = 0L
    var i = 0
    while (i < 8) { ts = (ts << 8) | (key(i) & 0xFFL); i += 1 }
    ~ts
  }

  /** Go-style escaped string → bytes: \a \b \f \n \r \t \v \\ \' \"
    * \xHH, and 1-3 octal digits. Unknown escapes / truncated input →
    * null. Non-escape chars are UTF-8 encoded. */
  def unescapeGo(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') {
        // iterate by code point: charAt-wise iteration would split
        // surrogate pairs into two invalid UTF-8 sequences
        val cp = s.codePointAt(i)
        out.write(new String(Character.toChars(cp)).getBytes("UTF-8"))
        i += Character.charCount(cp)
      } else {
        if (i + 1 >= s.length) return null
        s.charAt(i + 1) match {
          case 'a' => out.write(7); i += 2
          case 'b' => out.write(8); i += 2
          case 'f' => out.write(12); i += 2
          case 'n' => out.write(10); i += 2
          case 'r' => out.write(13); i += 2
          case 't' => out.write(9); i += 2
          case 'v' => out.write(11); i += 2
          case '\\' => out.write('\\'.toInt); i += 2
          case '\'' => out.write('\''.toInt); i += 2
          case '"' => out.write('"'.toInt); i += 2
          case 'x' =>
            if (i + 4 > s.length) return null
            val hx = s.substring(i + 2, i + 4)
            if (!hx.forall(h => Character.digit(h, 16) >= 0)) return null
            out.write(Integer.parseInt(hx, 16)); i += 4
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            if (v > 255) return null
            out.write(v); i = j
          case _ => return null
        }
      }
    }
    out.toByteArray
  }

  /** Bytes → Go-style escaped string (printable ASCII passes through). */
  def escapeGo(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    b.foreach { byte =>
      val v = byte & 0xFF
      v match {
        case 0x5C => sb.append("\\\\")
        case 0x22 => sb.append("\\\"")
        case 0x0A => sb.append("\\n")
        case 0x0D => sb.append("\\r")
        case 0x09 => sb.append("\\t")
        case _ if v >= 0x20 && v < 0x7F => sb.append(v.toChar)
        case _ => sb.append(f"\\x$v%02x")
      }
    }
    sb.toString
  }
}
