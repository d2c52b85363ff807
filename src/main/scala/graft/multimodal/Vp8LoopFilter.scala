package graft.multimodal

/** The VP8 in-loop deblocking filter (RFC 6386 §15), luma plane —
  * applied after full-frame reconstruction, macroblock by macroblock
  * in raster order: left MB edge, interior vertical edges (x+4/8/12),
  * top MB edge, interior horizontal edges. Interior edges are skipped
  * for 16×16-mode macroblocks with no coefficients (the spec's
  * no-coeff gate); B_PRED macroblocks always filter them. Both the
  * NORMAL filter (6-tap mask, high-edge-variance split between the
  * 4-tap and the 27/18/9 wide adjustment) and the SIMPLE filter
  * (2-tap mask, 4-tap adjustment) are implemented; per-MB levels come
  * from segments plus the keyframe intra/B_PRED loop-filter deltas.
  *
  * All arithmetic is the spec's signed-8-bit pipeline: pixels map to
  * value−128, every intermediate clamps to [−128,127].
  *
  * The planted fixtures encode at filter level 0 (the filter is a
  * no-op there, keeping the DC-only exactness argument intact); this
  * pass exists for general crawl content.
  */
object Vp8LoopFilter {
  import Vp8Codec.{Header, MbInfo}

  private def c128(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  /** shared 4-tap adjustment (§15.2 common_adjust); returns F. */
  private def commonAdjust(p: Array[Int], i1: Int, i0: Int, j0: Int,
      j1: Int, useOuter: Boolean): Int = {
    val pp1 = p(i1) - 128; val pp0 = p(i0) - 128
    val qq0 = p(j0) - 128; val qq1 = p(j1) - 128
    val a = c128((if (useOuter) c128(pp1 - qq1) else 0) + 3 * (qq0 - pp0))
    val f = c128(a + 4) >> 3
    val e = c128(a + 3) >> 3
    p(j0) = c128(qq0 - f) + 128
    p(i0) = c128(pp0 + e) + 128
    f
  }

  private def hev(p: Array[Int], i1: Int, i0: Int, j0: Int, j1: Int,
      t: Int): Boolean =
    math.abs(p(i1) - p(i0)) > t || math.abs(p(j1) - p(j0)) > t

  private def simpleMask(p: Array[Int], i1: Int, i0: Int, j0: Int,
      j1: Int, edge: Int): Boolean =
    math.abs(p(i0) - p(j0)) * 2 + math.abs(p(i1) - p(j1)) / 2 <= edge

  private def normalMask(p: Array[Int], i3: Int, i2: Int, i1: Int,
      i0: Int, j0: Int, j1: Int, j2: Int, j3: Int, interior: Int,
      edge: Int): Boolean =
    simpleMask(p, i1, i0, j0, j1, edge) &&
      math.abs(p(i3) - p(i2)) <= interior &&
      math.abs(p(i2) - p(i1)) <= interior &&
      math.abs(p(i1) - p(i0)) <= interior &&
      math.abs(p(j3) - p(j2)) <= interior &&
      math.abs(p(j2) - p(j1)) <= interior &&
      math.abs(p(j1) - p(j0)) <= interior

  /** §15.3 subblock filter across one 8-pixel span (indices i3..j3,
    * p-side then q-side). */
  private def subblockFilter(p: Array[Int], idx: Array[Int],
      hevT: Int, interior: Int, edge: Int): Unit = {
    val Array(i3, i2, i1, i0, j0, j1, j2, j3) = idx
    if (normalMask(p, i3, i2, i1, i0, j0, j1, j2, j3, interior, edge)) {
      val h = hev(p, i1, i0, j0, j1, hevT)
      val f = commonAdjust(p, i1, i0, j0, j1, h)
      if (!h) {
        val a = c128(f + 1) >> 1
        p(j1) = c128((p(j1) - 128) - a) + 128
        p(i1) = c128((p(i1) - 128) + a) + 128
      }
    }
  }

  /** §15.3 macroblock-edge filter. */
  private def mbFilter(p: Array[Int], idx: Array[Int], hevT: Int,
      interior: Int, edge: Int): Unit = {
    val Array(i3, i2, i1, i0, j0, j1, j2, j3) = idx
    if (normalMask(p, i3, i2, i1, i0, j0, j1, j2, j3, interior, edge)) {
      if (!hev(p, i1, i0, j0, j1, hevT)) {
        val w = c128(c128((p(i1) - 128) - (p(j1) - 128)) +
          3 * ((p(j0) - 128) - (p(i0) - 128)))
        var a = c128((27 * w + 63) >> 7)
        p(j0) = c128((p(j0) - 128) - a) + 128
        p(i0) = c128((p(i0) - 128) + a) + 128
        a = c128((18 * w + 63) >> 7)
        p(j1) = c128((p(j1) - 128) - a) + 128
        p(i1) = c128((p(i1) - 128) + a) + 128
        a = c128((9 * w + 63) >> 7)
        p(j2) = c128((p(j2) - 128) - a) + 128
        p(i2) = c128((p(i2) - 128) + a) + 128
      } else commonAdjust(p, i1, i0, j0, j1, useOuter = true)
    }
  }

  private def simpleFilter(p: Array[Int], i1: Int, i0: Int, j0: Int,
      j1: Int, edge: Int): Unit =
    if (simpleMask(p, i1, i0, j0, j1, edge))
      commonAdjust(p, i1, i0, j0, j1, useOuter = true)

  def filterLuma(plane: Array[Int], stride: Int, mbRows: Int,
      mbCols: Int, hdr: Header, mbs: Array[MbInfo]): Unit = {
    val idx = new Array[Int](8)
    var mbY = 0
    while (mbY < mbRows) {
      var mbX = 0
      while (mbX < mbCols) {
        val mi = mbs(mbY * mbCols + mbX)
        val lvl = Vp8Codec.mbFilterLevel(hdr, mi.segId,
          mi.ymode == Vp8Tables.BPred)
        if (lvl > 0) {
          var interior = lvl
          if (hdr.sharpness > 0) {
            interior >>= (if (hdr.sharpness > 4) 2 else 1)
            if (interior > 9 - hdr.sharpness) interior = 9 - hdr.sharpness
          }
          if (interior < 1) interior = 1
          val hevT =
            if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbEdge = (lvl + 2) * 2 + interior
          val subEdge = lvl * 2 + interior
          val x0 = mbX * 16
          val y0 = mbY * 16
          val innerEdges = mi.hasCoeffs ||
            mi.ymode == Vp8Tables.BPred

          def vSpan(x: Int, y: Int): Unit = {
            var k = 0
            while (k < 8) { idx(k) = y * stride + x - 4 + k; k += 1 }
          }
          def hSpan(x: Int, y: Int): Unit = {
            var k = 0
            while (k < 8) { idx(k) = (y - 4 + k) * stride + x; k += 1 }
          }

          if (hdr.simpleFilter) {
            if (mbX > 0) {
              var y = 0
              while (y < 16) {
                val b = (y0 + y) * stride + x0
                simpleFilter(plane, b - 2, b - 1, b, b + 1, mbEdge)
                y += 1
              }
            }
            if (innerEdges) {
              var e = 4
              while (e < 16) {
                var y = 0
                while (y < 16) {
                  val b = (y0 + y) * stride + x0 + e
                  simpleFilter(plane, b - 2, b - 1, b, b + 1, subEdge)
                  y += 1
                }
                e += 4
              }
            }
            if (mbY > 0) {
              var x = 0
              while (x < 16) {
                val b = y0 * stride + x0 + x
                simpleFilter(plane, b - 2 * stride, b - stride, b,
                  b + stride, mbEdge)
                x += 1
              }
            }
            if (innerEdges) {
              var e = 4
              while (e < 16) {
                var x = 0
                while (x < 16) {
                  val b = (y0 + e) * stride + x0 + x
                  simpleFilter(plane, b - 2 * stride, b - stride, b,
                    b + stride, subEdge)
                  x += 1
                }
                e += 4
              }
            }
          } else {
            if (mbX > 0) {
              var y = 0
              while (y < 16) {
                vSpan(x0, y0 + y)
                mbFilter(plane, idx, hevT, interior, mbEdge)
                y += 1
              }
            }
            if (innerEdges) {
              var e = 4
              while (e < 16) {
                var y = 0
                while (y < 16) {
                  vSpan(x0 + e, y0 + y)
                  subblockFilter(plane, idx, hevT, interior, subEdge)
                  y += 1
                }
                e += 4
              }
            }
            if (mbY > 0) {
              var x = 0
              while (x < 16) {
                hSpan(x0 + x, y0)
                mbFilter(plane, idx, hevT, interior, mbEdge)
                x += 1
              }
            }
            if (innerEdges) {
              var e = 4
              while (e < 16) {
                var x = 0
                while (x < 16) {
                  hSpan(x0 + x, y0 + e)
                  subblockFilter(plane, idx, hevT, interior, subEdge)
                  x += 1
                }
                e += 4
              }
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
