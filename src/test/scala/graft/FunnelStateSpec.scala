package graft

import graft.streaming.FunnelState
import org.scalatest.funsuite.AnyFunSuite

/** Property proof for the r9 funnelStream state bound: over randomized
  * event streams (random stage mix, arrival order, batch splits, and a
  * Spark-style monotone watermark that drops late rows), the PRUNED
  * state's resolution equals the FULL-HISTORY resolution after every
  * batch, and the retained state never exceeds the declared sufficient
  * set (stage 0 ≤ 1 candidate; stage i only inside
  * [min(watermark, t1), t1 + i·tol]). Also pins the freeze theorem:
  * once the watermark passes freezeUs, no admissible event can change
  * the resolution, and the collapsed tombstone resolves identically. */
class FunnelStateSpec extends AnyFunSuite {

  private def addEvent(st: Seq[Seq[Long]], stage: Int, t: Long): Seq[Seq[Long]] =
    st.updated(stage, st(stage) :+ t)

  test("pruned-state resolution == full-history resolution over randomized streams") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 300) {
      val nStages = 1 + rnd.nextInt(4)
      val tolUs = 1L + rnd.nextInt(500)
      val delayUs = rnd.nextInt(800).toLong
      val nEvents = 1 + rnd.nextInt(60)
      val empty: Seq[Seq[Long]] = Vector.fill(nStages)(Vector.empty[Long])
      var full = empty    // every admitted event, never pruned
      var pruned = empty  // prune() after every batch
      var wUs = 0L        // monotone watermark, Spark-style
      var arrived = 0
      while (arrived < nEvents) {
        val batchSize = 1 + rnd.nextInt(6)
        val batch = (0 until batchSize).map { _ =>
          (rnd.nextInt(nStages), rnd.nextInt(2000).toLong)
        }
        arrived += batchSize
        // Spark drops rows with eventTime < watermark before the state fn
        val admitted = batch.filter(_._2 >= wUs)
        full = admitted.foldLeft(full) { case (s, (i, t)) => addEvent(s, i, t) }
        pruned = FunnelState.prune(
          admitted.foldLeft(pruned) { case (s, (i, t)) => addEvent(s, i, t) },
          tolUs, wUs)
        val rFull = FunnelState.resolve(full, tolUs)
        val rPruned = FunnelState.resolve(pruned, tolUs)
        assert(rPruned == rFull,
          s"trial $trial: pruned $rPruned != full $rFull (state $pruned vs $full, W=$wUs)")
        // state-size bound: the declared sufficient set, nothing more
        assert(pruned.head.size <= 1, s"trial $trial: stage 0 kept ${pruned.head}")
        pruned.head.headOption.foreach { m0 =>
          pruned.zipWithIndex.drop(1).foreach { case (cands, i) =>
            assert(cands.forall(t => t >= math.min(wUs, m0) && t <= m0 + i.toLong * tolUs),
              s"trial $trial: stage $i kept out-of-horizon candidate in $cands (m0=$m0 W=$wUs)")
            assert(cands == cands.distinct.sorted)
          }
        }
        if (pruned.head.isEmpty)
          assert(pruned.forall(_.forall(_ >= wUs)),
            s"trial $trial: unanchored state kept sub-watermark candidates $pruned")
        // advance the watermark as Spark would: max seen event time - delay
        val maxT = admitted.map(_._2).maxOption.getOrElse(0L)
        wUs = math.max(wUs, maxT - delayUs)
      }
      // freeze theorem: push the watermark past freezeUs. Anchored
      // states can never change resolution again (so the tombstone is
      // sound); unanchored states prune to empty (so REMOVAL is sound:
      // a rebuilt-from-empty resolution equals full history, because
      // every held candidate sits below any future anchor).
      FunnelState.freezeUs(pruned, tolUs).foreach { fz =>
        val wFrozen = fz + 1
        val rBefore = FunnelState.resolve(pruned, tolUs)
        val empty: Seq[Seq[Long]] = Vector.fill(nStages)(Vector.empty[Long])
        for (_ <- 0 until 20) {
          val lateStage = rnd.nextInt(nStages)
          val lateT = wFrozen + rnd.nextInt(1000)
          val withLate = addEvent(pruned, lateStage, lateT)
          val got = FunnelState.resolve(FunnelState.prune(withLate, tolUs, wFrozen), tolUs)
          if (pruned.head.nonEmpty)
            assert(got == rBefore,
              s"trial $trial: post-freeze event (stage $lateStage, t=$lateT) changed an anchored resolution")
          else
            assert(got == FunnelState.resolve(addEvent(empty, lateStage, lateT), tolUs),
              s"trial $trial: unanchored post-freeze rebuild diverged from from-empty resolution")
        }
        if (pruned.head.nonEmpty) {
          val tomb = FunnelState.collapse(pruned, tolUs)
          assert(FunnelState.resolve(tomb, tolUs) == rBefore)
          assert(tomb.forall(_.size <= 1), s"tombstone not O(stages): $tomb")
        } else
          assert(FunnelState.prune(pruned, tolUs, wFrozen).forall(_.isEmpty),
            s"trial $trial: unanchored state not removable at freeze: $pruned")
      }
    }
  }

  test("unanchored users are safely removable once the watermark passes their last candidate") {
    // No stage-0 anchor: every future t1 >= watermark > every held
    // candidate, so none could ever chain — removal is batch-consistent.
    val st: Seq[Seq[Long]] = Vector(Vector.empty[Long], Vector(10L, 20L), Vector(15L))
    val fz = FunnelState.freezeUs(st, tolUs = 100L)
    assert(fz.contains(20L))
    assert(FunnelState.prune(st, 100L, watermarkUs = 21L).forall(_.isEmpty))
  }
}
