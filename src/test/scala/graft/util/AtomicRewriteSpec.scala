package graft.util

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The stamp-guarded rewrite transaction, including the `inTxn` hook the
  * store compactions hang their tombstone clears on: a crash anywhere
  * inside the transaction — mid-swap OR mid-hook — leaves the store
  * stampless, so build-if-stale rebuilds instead of serving the exact
  * state the crash interrupted (e.g. gen-0 folded rows still shadowed by
  * gen ≥ 1 tombstones).
  */
class AtomicRewriteSpec extends AnyFunSuite {

  private def mkStore(): String = {
    val d = Files.createTempDirectory("graft-rewrite").toString
    Files.createDirectories(Paths.get(d, "data"))
    Files.writeString(Paths.get(d, "data", "v.txt"), "old")
    Files.writeString(Paths.get(d, "source_stamp.txt"), "stamp-v1")
    d
  }

  test("inTxn runs AFTER the swap and BEFORE the stamp restore; success " +
      "restores the stamp value") {
    val d = mkStore()
    var sawDuringTxn: (String, Boolean) = null
    AtomicRewrite.rewrite(d, s"$d/data", inTxn = () => {
      sawDuringTxn = (Files.readString(Paths.get(d, "data", "v.txt")),
        Files.exists(Paths.get(d, "source_stamp.txt")))
    }) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "v.txt"), "new")
    }
    assert(sawDuringTxn == ("new", false),
      "hook must observe the swapped data with the stamp still down")
    assert(Files.readString(Paths.get(d, "data", "v.txt")) == "new")
    assert(Files.readString(Paths.get(d, "source_stamp.txt")) == "stamp-v1")
  }

  test("a crash inside inTxn leaves the store STAMPLESS (rebuild-forced), " +
      "never stamped-with-stale-side-state") {
    val d = mkStore()
    intercept[RuntimeException] {
      AtomicRewrite.rewrite(d, s"$d/data",
        inTxn = () => throw new RuntimeException("crash mid-clear")) { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "v.txt"), "new")
      }
    }
    assert(!Files.exists(Paths.get(d, "source_stamp.txt")),
      "stamp must NOT be restored when the in-transaction hook dies")
    assert(Files.readString(Paths.get(d, "data", "v.txt")) == "new",
      "swap itself completed before the hook")
  }

  test("a crash during the tmp write leaves the store untouched and valid") {
    val d = mkStore()
    intercept[RuntimeException] {
      AtomicRewrite.rewrite(d, s"$d/data") { _ =>
        throw new RuntimeException("crash mid-write")
      }
    }
    assert(Files.readString(Paths.get(d, "data", "v.txt")) == "old")
    assert(Files.readString(Paths.get(d, "source_stamp.txt")) == "stamp-v1")
  }
}
