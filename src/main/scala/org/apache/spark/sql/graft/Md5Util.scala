package org.apache.spark.sql.graft

import org.apache.spark.unsafe.types.UTF8String

/** The one copy of the MD5 plumbing every codegen kernel shares: a
  * thread-local digester (MessageDigest is stateful and not
  * thread-safe; codegen'd call sites run on task threads) and the hex
  * encoding whose output must stay byte-identical to both engines'
  * `md5()` — a divergence here would silently break the cross-engine
  * hash parity all the kernels exist to guarantee, so it lives in
  * exactly one place.
  */
private[graft] object Md5Util {
  private val digester = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** A reset, thread-local MD5 instance. */
  def md5(): java.security.MessageDigest = {
    val md = digester.get()
    md.reset()
    md
  }

  private val hex = "0123456789abcdef".toCharArray

  def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
