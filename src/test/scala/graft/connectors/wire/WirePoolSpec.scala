package graft.connectors.wire

import graft.core.Metric
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 ADVICE: [[FramedChannelPool]] boundedness and the
  * idempotence gate on its stale-channel retry.
  *
  * The pool is JVM-global, so every test isolates on a FRESH stub
  * endpoint (its own port → its own idle queue) and measures the
  * `dials` counter as a delta. No SparkSession needed — these drive
  * the wire client directly. */
class WirePoolSpec extends AnyFunSuite {

  private def withProp[T](key: String, value: String)(body: => T): T = {
    val prev = Option(System.getProperty(key))
    System.setProperty(key, value)
    try body
    finally prev match {
      case Some(v) => System.setProperty(key, v)
      case None => System.clearProperty(key)
    }
  }

  test("sequential exchanges ride ONE channel (baseline reuse)") {
    val s = new MilvusStubServer()
    try {
      val w = MilvusWire(s.hostPort)
      val d0 = FramedChannelPool.dials.get()
      w.create("c_base", 3, Metric.Cosine)
      (1 to 10).foreach(_ => w.count("c_base"))
      assert(FramedChannelPool.dials.get() - d0 == 1)
    } finally s.stop()
  }

  test("maxIdle=0 parks nothing: every exchange dials fresh") {
    withProp("graft.wire.pool.maxIdle", "0") {
      val s = new MilvusStubServer()
      try {
        val w = MilvusWire(s.hostPort)
        val d0 = FramedChannelPool.dials.get()
        w.create("c_cap", 3, Metric.Cosine)
        (1 to 5).foreach(_ => w.count("c_cap"))
        assert(FramedChannelPool.dials.get() - d0 == 6)
      } finally s.stop()
    }
  }

  test("idle TTL evicts parked channels at borrow") {
    withProp("graft.wire.pool.idleTtlMs", "1") {
      val s = new MilvusStubServer()
      try {
        val w = MilvusWire(s.hostPort)
        val d0 = FramedChannelPool.dials.get()
        w.create("c_ttl", 3, Metric.Cosine)
        Thread.sleep(10)
        w.count("c_ttl") // parked channel outlived the 1 ms TTL
        assert(FramedChannelPool.dials.get() - d0 == 2)
      } finally s.stop()
    }
  }

  test("stale channel: idempotent count retries ONCE fresh; create propagates") {
    val s1 = new MilvusStubServer()
    val port = s1.hostPort.split(":")(1).toInt
    val w = MilvusWire(s1.hostPort)
    w.create("c_stale", 3, Metric.Cosine)
    assert(w.count("c_stale") == 0)
    s1.stop()
    Thread.sleep(50)
    val s2 = new MilvusStubServer(port)
    try {
      // reads re-send harmlessly: borrow fails on the severed socket,
      // ONE fresh dial completes the call
      val d0 = FramedChannelPool.dials.get()
      assert(w.count("c_stale") == 0) // s2's store is empty → 0
      assert(FramedChannelPool.dials.get() - d0 == 1)
      // stale it again for the non-idempotent path
      s2.stop()
      Thread.sleep(50)
      val s3 = new MilvusStubServer(port)
      try {
        // create must NOT blind-re-send a possibly-applied request:
        // the stale-channel failure propagates...
        intercept[java.io.IOException] {
          w.create("c_two", 3, Metric.Cosine)
        }
        // ...and the pool dropped the dead channel, so the caller's
        // own retry goes straight to a fresh dial
        w.create("c_two", 3, Metric.Cosine)
        assert(s3.collectionSize("c_two") == 0) // created, empty
      } finally s3.stop()
    } finally s2.stop()
  }
}
