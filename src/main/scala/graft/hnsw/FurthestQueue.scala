package graft.hnsw

import scala.collection.mutable.ArrayBuffer

/** One graph edge / search candidate: target vertex and its distance. */
final case class Neighbor(dst: Long, dist: Double)

/** Distance-ascending bounded candidate list — the HNSW working set
  * (reference: src/data_structures/queue.rs:12-114). Insertion keeps the
  * list sorted via binary search (queue.rs:162-182); ties are broken by id
  * so every queue state is a deterministic function of its contents
  * (the reference leaves tie order to insertion order — we strengthen to a
  * total order for reproducible distributed builds).
  */
final class FurthestQueue private (private val buf: ArrayBuffer[Neighbor])
    extends Serializable {

  def this() = this(ArrayBuffer.empty)

  def size: Int = buf.size
  def isEmpty: Boolean = buf.isEmpty
  def nonEmpty: Boolean = buf.nonEmpty

  /** Binary search for the ascending insertion index of (dist, id)
    * (reference queue.rs:162-182 `search_sorted`). Double.compare gives
    * a TOTAL order with NaN greatest — a corrupt (NaN) distance sorts to
    * the tail where trimming evicts it, never to the head where it would
    * become a permanent false "nearest". */
  private def insertionIndex(dist: Double, dst: Long): Int = {
    var left = 0
    var right = buf.size
    while (left < right) {
      val mid = left + (right - left) / 2
      val m = buf(mid)
      val c = java.lang.Double.compare(m.dist, dist)
      if (c < 0 || (c == 0 && m.dst < dst)) left = mid + 1
      else right = mid
    }
    left
  }

  /** Ordered insert (reference queue.rs:30-45). */
  def insert(dst: Long, dist: Double): Unit =
    buf.insert(insertionIndex(dist, dst), Neighbor(dst, dist))

  /** Head = best candidate (reference queue.rs:47-49). */
  def getNearest: Option[Neighbor] = buf.headOption

  /** Last = worst candidate (reference queue.rs:51-53). */
  def getFurthest: Option[Neighbor] = buf.lastOption

  /** Drop and return the worst candidate (reference queue.rs:55-57). */
  def popFurthest(): Option[Neighbor] =
    if (buf.isEmpty) None else Some(buf.remove(buf.size - 1))

  /** First k in ascending order (reference queue.rs:59-61). */
  def kNearest(k: Int): Seq[Neighbor] = buf.take(k).toSeq

  /** Keep only the k best (reference queue.rs:63-65). */
  def trimToKNearest(k: Int): Unit =
    if (buf.size > k) buf.dropRightInPlace(buf.size - k)

  /** Element-wise remap preserving order (reference queue.rs:68-85; order
    * preservation assumes the maps don't change the metric). */
  def map(vectorMap: Long => Long, distMap: Double => Double): FurthestQueue =
    new FurthestQueue(buf.map(n => Neighbor(vectorMap(n.dst), distMap(n.dist))))

  def toArray: Array[Neighbor] = buf.toArray
  def iterator: Iterator[Neighbor] = buf.iterator
  def copy(): FurthestQueue = new FurthestQueue(buf.clone())

  override def equals(o: Any): Boolean = o match {
    case q: FurthestQueue => q.buf == buf
    case _                => false
  }
  override def hashCode(): Int = buf.hashCode()
  override def toString: String = s"FurthestQueue(${buf.mkString(", ")})"
}

object FurthestQueue {
  def empty: FurthestQueue = new FurthestQueue()

  /** Wrap an already-ascending list (reference queue.rs:23-25). */
  def fromAscending(ns: Seq[Neighbor]): FurthestQueue = {
    val q = new FurthestQueue(ArrayBuffer.from(ns))
    q
  }

  /** Sort arbitrary candidates into a queue. */
  def fromUnsorted(ns: Seq[Neighbor]): FurthestQueue =
    fromAscending(ns.sortBy(n => (n.dist, n.dst)))
}

/** Distance-descending list with fast pop of the best candidate — the
  * traversal frontier of layer search (reference queue.rs:116-159). */
final class NearestQueue private (private val buf: ArrayBuffer[Neighbor]) {

  def size: Int = buf.size
  def nonEmpty: Boolean = buf.nonEmpty

  /** Ordered insert, descending (reference queue.rs:132-149).
    * Double.compare: total order, NaN greatest -> a NaN candidate sits
    * at the far (popped-last) end. */
  def insert(dst: Long, dist: Double): Unit = {
    var left = 0
    var right = buf.size
    // descending by dist, then by id descending, so pop order is (dist, id) asc
    while (left < right) {
      val mid = left + (right - left) / 2
      val m = buf(mid)
      val c = java.lang.Double.compare(m.dist, dist)
      if (c > 0 || (c == 0 && m.dst > dst)) left = mid + 1
      else right = mid
    }
    buf.insert(left, Neighbor(dst, dist))
  }

  /** Pop the best (smallest-distance) candidate (reference queue.rs:156-158). */
  def popNearest(): Option[Neighbor] =
    if (buf.isEmpty) None else Some(buf.remove(buf.size - 1))
}

object NearestQueue {
  /** Reverse a FurthestQueue into visit order (reference queue.rs:123-127). */
  def fromFurthestQueue(q: FurthestQueue): NearestQueue = {
    val b = ArrayBuffer.from(q.toArray)
    var i = 0
    val n = b.size
    while (i < n / 2) { val t = b(i); b(i) = b(n - 1 - i); b(n - 1 - i) = t; i += 1 }
    new NearestQueue(b)
  }
}
