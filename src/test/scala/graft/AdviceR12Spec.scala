package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-12 ADVICE findings:
  *
  *   1. medium — MaskGuard detects INPUT RETIREMENT, not just mask
  *      divergence: a concurrent whole-file DELETE that drops an
  *      unmasked rewrite input leaves no mask delta (carried masks
  *      filterKeys to live names → both sides read empty), yet the
  *      rewrite's publish would resurrect the deleted rows via its
  *      outputs;
  *   2. low — the holder's validate() never observes its own renewer
  *      thread's torn truncate-then-write (renew/validate synchronize
  *      on the token);
  *   3. low — heldFor short-circuits when the thread holds no lease
  *      (behavioral: un-leased commits still work, leased still
  *      validate). */
class AdviceR12Spec extends AnyFunSuite {

  private def newLogDir(prefix: String, names: Seq[String]): String = {
    val dir = Files.createTempDirectory(prefix).toString
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    names.foreach(n => fs.create(new Path(dir, n), true).close())
    VersionLedger.enable(dir, names)
    dir
  }

  test("guarded publish aborts when a concurrent commit RETIRED a rewrite " +
      "input (no mask divergence involved)") {
    val dir = newLogDir("graft_maskguard_ret", Seq("a.seg", "b.seg"))
    // the rewrite reads a.seg + b.seg, both unmasked...
    val observed = Map.empty[String, Seq[String]]
    // ...then a concurrent whole-file DELETE retires a.seg. No masks
    // anywhere: the old guard (mask-set comparison only) read empty on
    // both sides and let the rewrite publish outputs containing a.seg's
    // rows — silently undoing the committed DELETE.
    VersionLedger.commit(dir)(names => names.filterNot(_ == "a.seg"))
    val e = intercept[VersionLedger.MaskConflictException] {
      VersionLedger.commit(dir, None, Map.empty,
        Some(VersionLedger.MaskGuard(Set("a.seg", "b.seg"), observed)))(
        names => names.filterNot(Set("a.seg", "b.seg")) :+ "out.seg")
    }
    assert(e.getMessage.contains("a.seg") && e.getMessage.contains("retired"),
      e.getMessage)
    // the DELETE's effect survived
    assert(VersionLedger.latest(dir).get._2 === Seq("b.seg"))
    // a guard over only still-live inputs publishes fine
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.create(new Path(dir, "out.seg"), true).close()
    VersionLedger.commit(dir, None, Map.empty,
      Some(VersionLedger.MaskGuard(Set("b.seg"), observed)),
      Some(n => new Path(dir, n)))(
      names => names.filterNot(_ == "b.seg") :+ "out.seg")
    assert(VersionLedger.latest(dir).get._2 === Seq("out.seg"))
  }

  test("the holder's validate never trips on its own renewer's torn write") {
    val dir = Files.createTempDirectory("graft_leasetear").toString
    val t = MaintenanceLease.acquire(dir, ttlMs = 120000L)
    try {
      // hammer renew from another thread while validating from this one;
      // without the token synchronization, validate could catch the
      // truncate-then-write window, miss its own id, and throw a
      // spurious "lease lost"
      @volatile var stop = false
      val renewer = new Thread(() => while (!stop) MaintenanceLease.renew(t))
      renewer.setDaemon(true)
      renewer.start()
      try (1 to 300).foreach(_ => MaintenanceLease.validate(t))
      finally { stop = true; renewer.join(5000) }
    } finally MaintenanceLease.release(t)
  }

  test("un-leased commits skip lease validation; leased commits keep it") {
    val dir = newLogDir("graft_heldfor", Seq("s.seg"))
    // no lease held on this thread: commit goes through (and the
    // short-circuited heldFor path is the one taken)
    LogVersions.commit(dir)(identity)
    // a lease held on this thread is still validated at publish
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    intercept[IllegalStateException] {
      MaintenanceLease.withLease(dir) {
        fs.listStatus(new Path(dir))
          .filter(_.getPath.getName.startsWith(".maintenance-lease"))
          .foreach(s => fs.delete(s.getPath, false))
        LogVersions.commit(dir)(identity)
      }
    }
  }
}
