package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.StoreManifest
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Crash-window recovery contracts added round 12 (ADVICE r11):
  *
  * 1. A publish() crash between delete(LATEST) and the rename (the
  *    HDFS-semantics fallback path) must NOT make the manifest read as
  *    absent — currentVersion recovers from max(v*.list), so readers
  *    keep snapshot semantics and the next publish continues the
  *    version line instead of restarting at v1 (which would overwrite
  *    v1.list and corrupt everReferenced/gcExpired).
  * 2. A compactEpochLedger() crash between delete(.applied) and the
  *    rename must not lose the fold record: reads fall back to the
  *    surviving .applied-tmp, and the next compaction promotes it.
  * 3. Distinct raw scopes that sanitize to the same tag text must get
  *    distinct tags — otherwise one stream's applied marker silently
  *    skips the other stream's same-numbered batch.
  */
class LedgerRecoverySpec extends AnyFunSuite {

  private def fsOf(p: Path) = {
    val spark = TestSpark.spark
    p.getFileSystem(spark.sessionState.newHadoopConf())
  }

  test("manifest: losing LATEST mid-flip recovers version from " +
    "v*.list; next publish continues the line, not v1") {
    val spark = TestSpark.spark
    val root = Files.createTempDirectory("graft-man-rec").toString
    assert(StoreManifest.publish(spark, root, Seq("a.parquet")) == 1L)
    assert(StoreManifest.publish(spark, root,
      Seq("a.parquet", "b.parquet")) == 2L)
    // Simulate the crash window: LATEST deleted, replacement never
    // renamed in.
    val latest = new Path(new Path(root, "_manifest"), "LATEST")
    val fs = fsOf(latest)
    assert(fs.delete(latest, false))
    assert(StoreManifest.currentVersion(spark, root).contains(2L),
      "currentVersion must recover from max(v*.list), not read absent")
    assert(StoreManifest.files(spark, root)
      .contains(Seq("a.parquet", "b.parquet")),
      "readers must still resolve the v2 snapshot")
    // The next publish must continue at v3 — restarting at v1 would
    // overwrite v1.list and corrupt the ever-referenced history.
    assert(StoreManifest.publish(spark, root,
      Seq("a.parquet", "b.parquet", "c.parquet")) == 3L)
    assert(StoreManifest.currentVersion(spark, root).contains(3L))
    assert(StoreManifest.everReferenced(spark, root) ==
      Set("a.parquet", "b.parquet", "c.parquet"))
  }

  test("epoch ledger: a crash between delete(.applied) and the rename " +
    "keeps folded epochs applied via the tmp; the next compaction " +
    "promotes it") {
    val spark = TestSpark.spark
    val store = Files.createTempDirectory("graft-led-rec").toString
    val scope = "ckpt"
    // Three applied epochs, each staging one file.
    (0L to 2L).foreach { b =>
      StoreIntake.appendEpoch(spark, store, scope, b,
        destPrefix = "data") { sd =>
        val d = new Path(sd)
        val fs = fsOf(d)
        fs.mkdirs(d)
        val out = fs.create(new Path(d, s"part-$b.bin"), true)
        try out.write(Array[Byte](1, 2, 3)) finally out.close()
      }
    }
    // Fold all three markers into the consolidated ledger.
    assert(StoreIntake.compactEpochLedger(spark, store, keepLast = 0) == 3)
    (0L to 2L).foreach(b =>
      assert(StoreIntake.epochApplied(spark, store, scope, b)))
    val ledgerBefore = StoreIntake.ledgerFiles(spark, store).sorted
    assert(ledgerBefore.size == 3)

    // Simulate the fallback crash window: .applied deleted, the next
    // fold's tmp is the only surviving copy. (Recreate the tmp as a
    // byte-copy of the ledger, as the crashed rename would have left.)
    val epochs = new Path(new Path(store), "_epochs")
    val fs = fsOf(epochs)
    val dest = new Path(epochs, ".applied")
    val tmp = new Path(epochs, ".applied-tmp")
    val bytes = {
      val in = fs.open(dest)
      try {
        val b = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { b.write(buf, 0, n); n = in.read(buf) }
        b.toByteArray
      } finally in.close()
    }
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    assert(fs.delete(dest, false))

    // All read paths must survive on the tmp alone.
    (0L to 2L).foreach(b =>
      assert(StoreIntake.epochApplied(spark, store, scope, b),
        s"epoch $b must still read as applied from the tmp"))
    assert(StoreIntake.ledgerFiles(spark, store).sorted == ledgerBefore,
      "sweep protection must not vanish in the crash window")
    // A replay in the window must still skip (exactly-once holds).
    assert(StoreIntake.appendEpoch(spark, store, scope, 1L,
      destPrefix = "data")(_ => fail("replay must not re-stage")).isEmpty)

    // The next compaction heals: tmp promoted to .applied even with no
    // new markers to fold.
    StoreIntake.compactEpochLedger(spark, store, keepLast = 0)
    assert(fs.exists(dest) && !fs.exists(tmp),
      "compaction must promote the surviving tmp to .applied")
    assert(StoreIntake.ledgerFiles(spark, store).sorted == ledgerBefore)
  }

  test("scope sanitation: raw scopes that sanitize alike get distinct " +
    "tags; clean scopes keep their historical tag") {
    val spark = TestSpark.spark
    val store = Files.createTempDirectory("graft-scope-rec").toString
    def applyEmpty(scope: String, b: Long): Option[Seq[String]] =
      StoreIntake.appendEpoch(spark, store, scope, b)(_ => ())
    // 'job_1' applies batch 0; 'job.1' (same sanitized text) must NOT
    // read as already applied.
    assert(applyEmpty("job_1", 0L).isDefined)
    assert(StoreIntake.epochApplied(spark, store, "job_1", 0L))
    assert(!StoreIntake.epochApplied(spark, store, "job.1", 0L),
      "colliding sanitized scopes must not share epoch tags")
    assert(applyEmpty("job.1", 0L).isDefined,
      "the second stream's batch 0 must apply, not silently skip")
    // A scope already in the safe alphabet keeps its pre-round-12 tag
    // (no hash suffix) so existing ledgers stay valid.
    assert(applyEmpty("job-1", 0L).isDefined)
    val fs = fsOf(new Path(store))
    assert(fs.exists(new Path(new Path(new Path(store), "_epochs"),
      "epoch-job-1-0")),
      "clean scopes must keep their historical tag text")

    // Upgrade compatibility: a ledger written BEFORE the hash suffix
    // existed recorded dirty scopes under the bare sanitized tag. A
    // post-upgrade replay of that (scope, batch) must read as applied
    // through the legacy alias — re-staging would double-append the
    // exact rows the ledger exists to protect.
    val store2 = Files.createTempDirectory("graft-scope-legacy").toString
    val epochs2 = new Path(new Path(store2), "_epochs")
    fs.mkdirs(epochs2)
    fs.create(new Path(epochs2, "epoch-old-job-7"), true).close()
    assert(StoreIntake.epochApplied(spark, store2, "old.job", 7L),
      "legacy bare-sanitized tag must still read as applied")
    assert(StoreIntake.appendEpoch(spark, store2, "old.job", 7L)(
      _ => fail("pre-upgrade epoch must not re-stage")).isEmpty)
    // ...while a NEW batch of the same scope applies under the
    // hash-suffixed tag.
    assert(StoreIntake.appendEpoch(spark, store2, "old.job", 8L)(
      _ => ()).isDefined)
    assert(!fs.exists(new Path(epochs2, "epoch-old-job-8")),
      "new epochs must use the hash-suffixed tag, not the legacy one")

    // Provenance gate (ADVICE r12): on a V2-BORN store the legacy
    // alias must not be consulted at all — a dirty scope's alias
    // ('job.1' → 'epoch-job-1-N') equals the clean scope 'job-1''s
    // CURRENT tag, so consulting it would make 'job.1' batch N read
    // as applied the moment live stream 'job-1' applies its batch N
    // (silent data loss between two live streams). `store` above is
    // v2-born (its _epochs was created by appendEpoch post-upgrade).
    assert(fs.exists(new Path(new Path(new Path(store), "_epochs"),
      ".format-v2")), "a store born under appendEpoch must be stamped")
    assert(applyEmpty("job-1", 1L).isDefined)
    assert(!StoreIntake.epochApplied(spark, store, "job.1", 1L),
      "v2-born store: 'job-1' batch 1 must not mask 'job.1' batch 1")
    assert(applyEmpty("job.1", 1L).isDefined,
      "'job.1' batch 1 must apply, not silently skip via the alias")
    // ...while the pre-upgrade store (manually created _epochs, no
    // stamp) keeps alias reads — asserted above via 'old.job' 7.
    assert(!fs.exists(new Path(epochs2, ".format-v2")),
      "a pre-upgrade store must not acquire the stamp retroactively")
  }
}
