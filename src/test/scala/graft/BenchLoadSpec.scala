package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contamination sampler (VERDICT r11 #4): ambient cores =
  * (Δhost busy − Δthis JVM) / Δwall must SEE external load (a
  * deliberately loaded window samples high) and must NOT count this
  * JVM's own work as ambient — the failure mode that let loadavg-based
  * gating stamp a contaminated run clean (our own 32 threads dominate
  * loadavg mid-run, so the old flag could only gate the start).
  */
class BenchLoadSpec extends AnyFunSuite {

  private val spinners = 4

  test("external spin processes register as ambient load; own-JVM " +
    "spin does not") {
    assume(BenchLoad.cpuTicks().isDefined, "/proc required")

    // Baseline window: this JVM spins hard, no external load — ambient
    // must stay far below the spinner count (own work excluded by
    // construction; neighbors may add a little, hence the loose bound).
    def ownSpinWindow(): Double = {
      val c0 = BenchLoad.cpuTicks()
      val t0 = System.nanoTime()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ts = (1 to spinners).map { _ =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1 }
          if (x == -1) println(x)
        })
        t.setDaemon(true); t.start(); t
      }
      Thread.sleep(1500)
      stop.set(true); ts.foreach(_.join(1000))
      BenchLoad.ambientCores(c0, BenchLoad.cpuTicks(),
        (System.nanoTime() - t0) / 1e9)
    }

    // Loaded window: the same measurement with external spinner
    // PROCESSES running — these are exactly what the sampler exists to
    // catch.
    def externalSpinWindow(): Double = {
      val procs = (1 to spinners).map { _ =>
        new ProcessBuilder("sh", "-c", "while :; do :; done").start()
      }
      try {
        Thread.sleep(300) // let them reach steady spin
        val c0 = BenchLoad.cpuTicks()
        val t0 = System.nanoTime()
        Thread.sleep(1500)
        BenchLoad.ambientCores(c0, BenchLoad.cpuTicks(),
          (System.nanoTime() - t0) / 1e9)
      } finally procs.foreach { p =>
        p.destroyForcibly(); p.waitFor(): Unit
      }
    }

    // Up to three attempts: the two windows are measured back-to-back,
    // but a genuinely-loaded host (another build running beside the
    // suite) can inflate the baseline window and wash out the delta —
    // that is real ambient noise, not a sampler defect, so retry until
    // a comparable pair lands. On a quiet host the first attempt
    // passes.
    val ok = (1 to 3).exists { attempt =>
      val own = ownSpinWindow()
      val loaded = externalSpinWindow()
      val pass = loaded >= spinners * 0.6 &&
        loaded > own + spinners * 0.4
      if (!pass) System.err.println(
        f"[bench-load-spec] attempt $attempt: own $own%.2f, " +
          f"loaded $loaded%.2f — retrying on noisy host")
      pass
    }
    assert(ok,
      s"$spinners external spinners must register clear of the " +
        "own-spin baseline in at least one of three windows")
  }
}
