package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Lease lifecycle around [[SwapFs.withLease]] — specifically the
  * renewal heartbeat: a LIVE writer outrunning the stale threshold
  * must never be taken over mid-protocol (the r14 design had no
  * renewal, so a long merge's lease could be stolen while the swap
  * renames were still in flight — recreating the interleaved-rename
  * data-loss window the fence exists to prevent), while a CRASHED
  * writer (no heartbeat) still ages out and is taken over. */
class SwapFsSpec extends SparkSpec {

  test("a live writer renewing past staleMs is never stolen; a crashed one still is") {
    val dir = Files.createTempDirectory("lease-renew").toString
    val target = dir + "/fact"
    val io = SwapFs.forPath(spark, target)
    val staleMs = 400L

    // long-running holder: body sleeps 4× the stale threshold — only
    // the renewal heartbeat keeps its lease young
    val done = new java.util.concurrent.CountDownLatch(1)
    val holderFailed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val holder = new Thread(() => {
      try io.withLease(target, staleMs) { Thread.sleep(4 * staleMs); done.countDown() }
      catch { case t: Throwable => holderFailed.set(t) }
    }, "lease-holder")
    holder.start()

    // wait until the holder actually has the lease, then let it age
    // well past staleMs of wall-clock
    val lock = io.path(target + SwapFs.LockSuffix)
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (!io.exists(lock) && System.nanoTime() < deadline) Thread.sleep(20)
    assert(io.exists(lock), "holder never acquired the lease")
    Thread.sleep(2 * staleMs)

    // a second writer must fail LOUD — the heartbeat kept the lease
    // younger than staleMs even though the holder acquired it 2×
    // staleMs ago
    val e = intercept[IllegalStateException] {
      io.withLease(target, staleMs) { fail("second writer must not acquire a renewed lease") }
    }
    assert(e.getMessage.contains("concurrent writer"))

    holder.join(10 * staleMs)
    assert(holderFailed.get() == null, s"holder failed: ${holderFailed.get()}")
    assert(done.getCount == 0, "holder body never completed")
    assert(!io.exists(lock), "lease released after the holder finished")

    // a CRASHED writer — a lease file nobody renews — still ages out
    // and is taken over
    val out = io.fs.create(lock, true)
    out.write("dead-writer-token".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    Thread.sleep(staleMs + 100)
    var ran = false
    io.withLease(target, staleMs) { ran = true }
    assert(ran, "stale unrenewed lease must be taken over")
    assert(!io.exists(lock))
  }
}
