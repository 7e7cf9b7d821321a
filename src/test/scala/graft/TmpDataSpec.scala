package graft.operators

/** Invariants of the shared derived-dataset lifecycle: write-once per
  * key, retry-after-failure (never mark a failed write done), and
  * per-process/per-dataset key isolation.
  */
class TmpDataSpec extends graft.SparkSpecBase {

  test("once() runs the write exactly once per key") {
    var runs = 0
    val key = s"spec-once-${System.nanoTime}"
    TmpData.once(key) { runs += 1 }
    TmpData.once(key) { runs += 1 }
    TmpData.once(key) { runs += 1 }
    assert(runs == 1)
  }

  test("a failed write is NOT marked done — the next call retries") {
    var attempts = 0
    val key = s"spec-retry-${System.nanoTime}"
    intercept[RuntimeException] {
      TmpData.once(key) { attempts += 1; throw new RuntimeException("disk full") }
    }
    TmpData.once(key) { attempts += 1 } // succeeds
    TmpData.once(key) { attempts += 1 } // skipped
    assert(attempts == 2, s"expected retry-then-skip, got $attempts attempts")
  }

  test("tags separate datasets and stay filesystem/identifier safe") {
    val a = TmpData.tag("/root/testdata/sf0.01")
    val b = TmpData.tag("/root/testdata/sf0.1")
    assert(a != b, "different datasets must not share a tag")
    assert(a.matches("^[0-9]+_[A-Za-z0-9_]+$"), s"unsafe tag: $a")
    // same dataset → same tag within this process
    assert(TmpData.tag("/root/testdata/sf0.01") == a)
  }

  test("path() registers under tmpdir with the kind and tag") {
    val p = TmpData.path("spec_kind", "42_test")
    assert(p.startsWith(System.getProperty("java.io.tmpdir")))
    assert(p.endsWith("graft_spec_kind_42_test"))
  }

  test("a rewritten source changes the tag, so derived copies rebuild") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft_spec_src").toString
    Files.write(Paths.get(src, "a.parquet"), Array.fill[Byte](100)(1))
    val before = TmpData.tag(src)
    // same content → same tag (the copy is reused across calls)
    assert(TmpData.tag(src) == before)

    // in-place rewrite (more bytes): the fingerprint must move the tag,
    // which moves the tmp path AND the once() key for every derived copy
    Files.write(Paths.get(src, "a.parquet"), Array.fill[Byte](150)(2))
    val after = TmpData.tag(src)
    assert(after != before, "stale-copy hazard: rewritten source kept its tag")

    var writes = 0
    TmpData.once(s"spec-rw:$before") { writes += 1 }
    TmpData.once(s"spec-rw:$after") { writes += 1 }
    assert(writes == 2, "rewritten source must trigger a fresh derived write")
  }
}
