package graft.functions

/** FNV-1a 64-bit — the one engine-independent, dependency-free hash used
  * wherever a deterministic non-Spark hash is needed (SimHash token bits,
  * the multimodal stub features). Single definition so the constants can't
  * drift between call sites; byte and char variants are distinct hashes by
  * design (documented at each use). */
object Fnv {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def bytes(data: Array[Byte], limit: Int = Int.MaxValue): Long = {
    var h = Offset
    var i = 0
    val n = math.min(data.length, limit)
    while (i < n) { h ^= data(i) & 0xFF; h *= Prime; i += 1 }
    h
  }

  def chars(s: CharSequence): Long = {
    var h = Offset
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= Prime; i += 1 }
    h
  }
}
