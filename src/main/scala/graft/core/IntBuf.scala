package graft.core

/** Minimal growable primitive int buffer (no boxing; reused per task). */
final class IntBuf(initial: Int = 32) {
  private var a = new Array[Int](initial)
  var length = 0
  def clear(): Unit = length = 0
  def +=(v: Int): Unit = {
    if (length == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(length) = v
    length += 1
  }
  @inline def apply(i: Int): Int = a(i)
  /** Backing array (valid indices: 0 until length; invalidated by +=).
    * For hot read loops that want direct array access.
    */
  def raw: Array[Int] = a
  def isEmpty: Boolean = length == 0
  def nonEmpty: Boolean = length > 0
  def toArray: Array[Int] = java.util.Arrays.copyOf(a, length)
}
