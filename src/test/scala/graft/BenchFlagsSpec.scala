package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic stress test for the query-phase contention flags (r12 verdict
  * task 1): the flags must fire on the r12 driver record's own signature —
  * long-wall / near-idle-cpu / gc~0 clusters — and must NOT fire on healthy
  * parallel queries (cpu >> wall), gc-bound queries, or sub-second noise.
  */
class BenchFlagsSpec extends AnyFunSuite {

  test("steal signature fires: wall >> cpu with gc~0 above the wall floor") {
    // modeled on the r12 record: ml_mutual_info 16.2 s wall / 20.5 cpu is
    // healthy-parallel, but 16.2 wall / 1.1 cpu / gc 0 is steal
    val wall = Seq("a_steal" -> 16.2, "b_ok" -> 2.0)
    val cpu = Map("a_steal" -> 1.1, "b_ok" -> 30.0)
    val gc = Map("a_steal" -> 0L, "b_ok" -> 0L)
    assert(BenchFlags.stealSuspects(wall, cpu, gc) == Seq("a_steal"))
  }

  test("healthy parallel query (cpu_sec > wall) is never a suspect") {
    val wall = Seq("q" -> 16.2)
    assert(BenchFlags.stealSuspects(wall, Map("q" -> 20.5), Map("q" -> 0L)).isEmpty)
  }

  test("gc-bound outlier is heap pressure, not steal") {
    val wall = Seq("q" -> 12.0)
    assert(BenchFlags.stealSuspects(wall, Map("q" -> 2.0), Map("q" -> 3500L)).isEmpty)
  }

  test("sub-second jitter stays below the wall floor") {
    val wall = Seq("q" -> 0.4)
    assert(BenchFlags.stealSuspects(wall, Map("q" -> 0.05), Map("q" -> 0L)).isEmpty)
  }

  test("missing cpu telemetry (bean unavailable, cpu=0) still flags long idle walls") {
    val wall = Seq("q" -> 5.0)
    assert(BenchFlags.stealSuspects(wall, Map.empty, Map.empty) == Seq("q"))
  }

  test("queries_contended fires when suspects hold >20% of query wall") {
    // the r12 shape: 8 outliers totalling ~114 s of a 440 s query phase
    val outliers = Seq(16.2, 15.2, 14.9, 14.5, 14.0, 13.4, 13.2, 10.1)
      .zipWithIndex.map { case (w, i) => s"steal_$i" -> w }
    val healthy = (1 to 100).map(i => s"ok_$i" -> 3.3)
    val wall = outliers ++ healthy
    val suspects = outliers.map(_._1)
    assert(BenchFlags.queriesContended(wall, suspects))
  }

  test("one isolated suspect in a long run stays a footnote") {
    val wall = Seq("steal" -> 8.0) ++ (1 to 100).map(i => s"ok_$i" -> 2.0)
    assert(!BenchFlags.queriesContended(wall, Seq("steal")))
  }

  test("failed queries (-1.0 sentinel) are excluded from the share math") {
    val wall = Seq("bad" -> -1.0, "steal" -> 8.0, "ok" -> 10.0)
    assert(BenchFlags.queriesContended(wall, Seq("steal")))
  }

  test("empty run does not divide by zero") {
    assert(!BenchFlags.queriesContended(Seq.empty, Seq.empty))
  }
}
