package graft

import graft.streaming.{TimelinePoint, TransitionState}
import org.scalatest.funsuite.AnyFunSuite

/** Property proof for the streaming transition matrix: over randomized
  * event streams (random types, arrival order, batch splits, and a
  * Spark-style monotone watermark that drops late rows), the SUM of
  * emitted deltas per (from, to) equals the batch ts24 adjacency
  * counts over the admitted events after every batch, and the retained
  * timeline never exceeds the declared bound (at most ONE point below
  * the watermark — the boundary a future arrival may still follow). */
class TransitionStateSpec extends AnyFunSuite {

  test("summed deltas == batch adjacency counts over randomized admitted streams") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 300) {
      val nTypes = 1 + rnd.nextInt(4)
      val delayUs = rnd.nextInt(800).toLong
      val nEvents = 1 + rnd.nextInt(60)
      var pts = Vector.empty[TimelinePoint]
      var admitted = Vector.empty[TimelinePoint]
      val acc = scala.collection.mutable.Map.empty[(String, String), Long]
      var wUs = 0L
      var nextId = 0L
      var arrived = 0
      while (arrived < nEvents) {
        val batchSize = 1 + rnd.nextInt(6)
        val batch = (0 until batchSize).map { _ =>
          nextId += 1
          TimelinePoint(rnd.nextInt(2000).toLong, nextId, s"T${rnd.nextInt(nTypes)}")
        }
        arrived += batchSize
        // Spark drops rows with eventTime < watermark before the state fn
        val adm = batch.filter(_.us >= wUs).sortBy(p => (p.us, p.id))
        adm.foreach { e =>
          val (np, ds) = TransitionState.insert(pts, e)
          pts = np
          ds.foreach { case (f, t, d) => acc((f, t)) = acc.getOrElse((f, t), 0L) + d }
          admitted :+= e
        }
        pts = TransitionState.pruneTimeline(pts, wUs)
        // ground truth: adjacency counts over ALL admitted events
        val sorted = admitted.sortBy(p => (p.us, p.id))
        val expect = sorted.zip(sorted.drop(1))
          .groupBy { case (a, b) => (a.tpe, b.tpe) }
          .view.mapValues(_.size.toLong).toMap
        val got = acc.filter(_._2 != 0L).toMap
        assert(got == expect,
          s"trial $trial: delta sum $got != batch adjacency $expect (W=$wUs)")
        // state bound: sorted, and at most one point below the watermark
        assert(pts.count(_.us < wUs) <= 1,
          s"trial $trial: kept ${pts.count(_.us < wUs)} sub-watermark points (W=$wUs): $pts")
        assert(pts == pts.sortBy(p => (p.us, p.id)), s"trial $trial: unsorted state $pts")
        val maxT = adm.map(_.us).maxOption.getOrElse(0L)
        wUs = math.max(wUs, maxT - delayUs)
      }
    }
  }

  test("a late insert between neighbors retracts the split edge exactly") {
    val a = TimelinePoint(0L, 1L, "A")
    val c = TimelinePoint(100L, 2L, "C")
    val (p1, d1) = TransitionState.insert(Vector.empty, a)
    val (p2, d2) = TransitionState.insert(p1, c)
    assert(d1.isEmpty && d2 == Seq(("A", "C", 1L)))
    val (p3, d3) = TransitionState.insert(p2, TimelinePoint(50L, 3L, "B"))
    assert(d3 == Seq(("A", "C", -1L), ("A", "B", 1L), ("B", "C", 1L)))
    assert(p3.map(_.tpe) == Vector("A", "B", "C"))
    // equal-timestamp ties total-order by id
    val (p4, d4) = TransitionState.insert(p3, TimelinePoint(50L, 0L, "X"))
    assert(p4.map(_.tpe) == Vector("A", "X", "B", "C"))
    assert(d4 == Seq(("A", "B", -1L), ("A", "X", 1L), ("X", "B", 1L)))
  }

  test("prune keeps exactly the boundary point once the watermark passes") {
    val pts = Vector(
      TimelinePoint(0L, 1L, "A"), TimelinePoint(10L, 2L, "B"),
      TimelinePoint(20L, 3L, "C"), TimelinePoint(30L, 4L, "D"))
    assert(TransitionState.pruneTimeline(pts, 0L) == pts)
    assert(TransitionState.pruneTimeline(pts, 15L) == pts.drop(1))
    // idle user: everything below the watermark collapses to ONE point
    assert(TransitionState.pruneTimeline(pts, 1000L) == Vector(pts.last))
  }
}
