package graft.multimodal

/** The VP8 boolean arithmetic coder (RFC 6386 §7) — the entropy layer
  * under every lossy-WebP still: a binary arithmetic coder whose
  * per-bool probability is an 8-bit integer p (P(bit=0) ≈ p/256),
  * with the spec's exact integer split law
  * `split = 1 + ((range−1)·p >> 8)` so encoder and decoder stay in
  * lockstep without floating point. Trees (§8) map multi-symbol
  * alphabets onto bool sequences.
  *
  * The decoder tolerates the coder's inherent 2-byte lookahead past
  * the partition end (zero-fill, as the spec prescribes) but records
  * deeper overruns so [[Vp8Codec]] can fail truncated partitions
  * instead of silently decoding zeros.
  *
  * Reference provenance: the reference pipeline treats media blobs as
  * opaque payloads (backfill_user_profiles.py:144-153); the coder is
  * the public RFC 6386 specification.
  */
object Vp8Entropy {

  /** §7.3 decoder over `b[from, until)`. */
  final class BoolDecoder(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var range = 255
    private var value = (next() << 8) | next()
    private var bitCount = 0
    private var overrunBytes = 0

    private def next(): Int =
      if (pos < until) { val v = b(pos) & 0xff; pos += 1; v }
      else { overrunBytes += 1; 0 }

    /** True when decoding demanded bytes beyond the partition plus
      * the coder's legal 2-byte lookahead — a truncated stream. */
    def overran: Boolean = overrunBytes > 2

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      val bit =
        if (value >= big) { range -= split; value -= big; 1 }
        else { range = split; 0 }
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      bit
    }

    /** Uniform bit (p = 1/2). */
    def bit(): Int = bool(128)

    /** n-bit unsigned literal, MSB first (§7.5 L(n)). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Flagged signed delta: L(n) magnitude then a sign bit, both
      * behind a presence flag (the header's `B(1) ? sign(L(n))`). */
    def signedUpdate(n: Int): Int =
      if (bit() == 0) 0
      else {
        val mag = literal(n)
        if (bit() == 1) -mag else mag
      }

    /** Walk a §8 tree: entries ≤ 0 are leaves (−symbol), positive
      * entries are the index of the node's child pair; probs are
      * indexed by node/2. `start` lets token decode skip the EOB
      * branch after a zero token. */
    def tree(t: Array[Int], probs: Array[Int], start: Int = 0): Int = {
      var i = start
      while (true) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
      }
      -1 // unreachable
    }
  }

  /** §7.4 encoder (fixture side) with carry propagation. */
  final class BoolEncoder {
    private var lowValue = 0
    private var range = 255
    private var count = -24
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]()

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { lowValue += split; range -= split }
      else range = split
      var shift = 0
      while ((range << shift) < 128) shift += 1
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((lowValue << (offset - 1)) & 0x80000000) != 0) {
          // carry: ripple back through any 0xff run
          var x = out.length - 1
          while (x >= 0 && out(x) == -1) { out(x) = 0; x -= 1 }
          require(x >= 0, "carry out of stream head")
          out(x) = (out(x) + 1).toByte
        }
        out += ((lowValue >>> (24 - offset)) & 0xff).toByte
        lowValue <<= offset
        lowValue &= 0xffffff
        shift = count
        count -= 8
      }
      lowValue <<= shift
    }

    def bit(v: Int): Unit = bool(128, v)

    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }

    def signedUpdate(n: Int, v: Int): Unit =
      if (v == 0) bit(0)
      else { bit(1); literal(n, math.abs(v)); bit(if (v < 0) 1 else 0) }

    /** Encode `symbol` down tree `t` (inverse of BoolDecoder.tree):
      * depth-first search for the leaf, then emit the path bools. */
    def tree(t: Array[Int], probs: Array[Int], symbol: Int,
        start: Int = 0): Unit = {
      def path(base: Int): Option[List[Int]] = {
        def desc(bit: Int): Option[List[Int]] = {
          val child = t(base + bit)
          if (child <= 0) {
            if (-child == symbol) Some(bit :: Nil) else None
          } else path(child).map(bit :: _)
        }
        desc(0).orElse(desc(1))
      }
      var bits = path(start).getOrElse(
        sys.error(s"symbol $symbol not in tree"))
      var base = start
      while (bits.nonEmpty) {
        val b = bits.head
        bits = bits.tail
        bool(probs(base >> 1), b)
        base = t(base + b)
      }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bit(0); i += 1 }
      out.toArray
    }
  }
}
