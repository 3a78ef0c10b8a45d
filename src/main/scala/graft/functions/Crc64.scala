package graft.functions

/** CRC64 (reflected ECMA-182 polynomial, the variant used by Go's
  * `hash/crc64` ECMA table and by TiKV's raw checksum digest — see
  * reference `checksum/checksum.go:25-29` which XOR-folds per-range
  * crc64 values computed storage-side).
  *
  * Table-driven, init `~0`, final complement — so
  * `update(update(0, a), b) == crc64(a ++ b)` (the complements cancel),
  * which lets the key/value pair be digested without concatenation.
  */
object Crc64 {
  final val Poly = 0xC96C5795D7870F42L // reflected ECMA-182

  private val table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1L) != 0L) (crc >>> 1) ^ Poly else crc >>> 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  /** Continue a CRC64 over `bytes`; `crc0 = 0` starts a fresh digest. */
  def update(crc0: Long, bytes: Array[Byte]): Long = {
    var crc = ~crc0
    var i = 0
    val n = bytes.length
    while (i < n) {
      crc = table(((crc ^ bytes(i)) & 0xFF).toInt) ^ (crc >>> 8)
      i += 1
    }
    ~crc
  }

  def crc64(bytes: Array[Byte]): Long = update(0L, bytes)

  /** Digest of `key ‖ value` without materializing the concatenation. */
  def crc64(key: Array[Byte], value: Array[Byte]): Long =
    update(update(0L, key), value)
}
