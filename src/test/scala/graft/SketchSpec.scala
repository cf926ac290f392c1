package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sketch.{BloomFilter, CuckooFilter, CuckooMerge, SeenFilter}

class SketchSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("bloom: no false negatives, FPR within 2x of configured") {
    val n = 20000
    val bf = BloomFilter.create(n, 0.01)
    val keys = (0 until n).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong))
    keys.foreach(bf.insert)
    assert(keys.forall(bf.mightContain), "bloom false negative!")
    val nonMembers = (0 until n).map(i => graft.crawl.FixtureGen.splitmix64(0xDEAD0000L + i))
    val fp = nonMembers.count(bf.mightContain)
    assert(fp.toDouble / n < 0.02, s"FPR ${fp.toDouble / n} > 2x configured 0.01")
  }

  test("bloom: serialize/deserialize roundtrip and OR-merge") {
    val a = BloomFilter.create(1000, 0.01)
    val b = BloomFilter.create(1000, 0.01)
    (0L until 500L).foreach(a.insert)
    (500L until 1000L).foreach(b.insert)
    val merged = BloomFilter.deserialize(a.serialize()).merge(BloomFilter.deserialize(b.serialize()))
    assert((0L until 1000L).forall(merged.mightContain))
  }

  test("cuckoo: insert/lookup, no false negatives at 90% load") {
    val n = 10000
    val cf = CuckooFilter.create(n)
    val keys = (0 until (n * 9 / 10)).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong + 7))
    keys.foreach(k => assert(cf.insert(k), s"insert failed at load"))
    assert(keys.forall(cf.mightContain), "cuckoo false negative!")
  }

  test("cuckoo: delete removes membership for unique items") {
    val cf = CuckooFilter.create(1000)
    val keys = (0 until 500).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong + 99))
    keys.foreach(cf.insert)
    keys.take(100).foreach(k => assert(cf.delete(k)))
    // deleted keys may still collide with another key's fingerprint, but with
    // 16-bit fps over 500 items that's ~1% — assert the overwhelming majority
    val stillThere = keys.take(100).count(cf.mightContain)
    assert(stillThere <= 3, s"$stillThere of 100 deleted keys still present")
    assert(keys.drop(100).forall(cf.mightContain), "delete broke other keys")
  }

  test("cuckoo: serialize roundtrip + fingerprint-level merge") {
    val a = CuckooFilter.create(2000)
    val b = CuckooFilter.create(2000)
    val ka = (0 until 800).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong))
    val kb = (0 until 800).map(i => graft.crawl.FixtureGen.splitmix64(0xFEEDL + i))
    ka.foreach(a.insert)
    kb.foreach(b.insert)
    val a2 = CuckooFilter.deserialize(a.serialize())
    CuckooMerge.mergeInto(a2, b)
    assert((ka ++ kb).forall(a2.mightContain))
  }

  test("cuckoo merge: high-load merge keeps every key or fails loud — never drops") {
    // two filters each at ~47% load merge to ~94% — the eviction-kick path
    // in the merge must relocate fingerprints instead of silently dropping
    val cap = 4096
    val a = CuckooFilter.create(cap)
    val b = CuckooFilter.create(cap)
    val ka = (0 until cap * 47 / 100).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong + 1))
    val kb = (0 until cap * 47 / 100).map(i => graft.crawl.FixtureGen.splitmix64(0xABCDL + i))
    ka.foreach(k => assert(a.insert(k)))
    kb.foreach(k => assert(b.insert(k)))
    try {
      CuckooMerge.mergeInto(a, b)
      // merge succeeded ⇒ the membership contract is absolute
      (ka ++ kb).foreach(k => assert(a.mightContain(k), s"merge dropped key $k"))
    } catch {
      case e: IllegalStateException =>
        assert(e.getMessage.contains("saturated") || e.getMessage.contains("stash"),
          s"unexpected failure mode: ${e.getMessage}")
    }
  }

  test("cuckoo merge: genuine saturation throws instead of dropping") {
    // tiny geometry, far over capacity: the merge MUST refuse
    val a = CuckooFilter.create(32)
    val b = CuckooFilter.create(32)
    (0 until 120).foreach(i => a.insert(graft.crawl.FixtureGen.splitmix64(i.toLong)))
    (0 until 120).foreach(i => b.insert(graft.crawl.FixtureGen.splitmix64(0xF00DL + i)))
    intercept[IllegalStateException] { CuckooMerge.mergeInto(a, b) }
  }

  test("cuckoo merge: keeps duplicate fingerprints (multiset, delete-safe)") {
    val a = CuckooFilter.create(256)
    val b = CuckooFilter.create(256)
    val k = graft.crawl.FixtureGen.splitmix64(77L)
    a.insert(k) // same key in both filters — the merged filter must keep
    b.insert(k) // two copies so one delete cannot erase the other's slot
    CuckooMerge.mergeInto(a, b)
    assert(a.delete(k))
    assert(a.mightContain(k), "second fingerprint copy must survive one delete")
    assert(a.delete(k))
    assert(!a.mightContain(k))
  }

  test("seen filter sniffing by magic") {
    val bf = BloomFilter.create(100, 0.01); bf.insert(42L)
    val cf = CuckooFilter.create(100); cf.insert(42L)
    assert(SeenFilter.deserialize(bf.serialize()).mightContain(42L))
    assert(SeenFilter.deserialize(cf.serialize()).mightContain(42L))
  }

  test("property: bloom never loses an inserted key") {
    checkProp(Prop.forAll(Gen.listOf(Gen.long)) { keys =>
      val bf = BloomFilter.create(math.max(keys.size, 16), 0.01)
      keys.foreach(bf.insert)
      keys.forall(bf.mightContain)
    })
  }

  test("property: cuckoo delete-then-query = absent for distinct keys") {
    checkProp(Prop.forAll(Gen.choose(1, 200)) { n =>
      val cf = CuckooFilter.create(1024)
      val keys = (0 until n).map(i => graft.crawl.FixtureGen.splitmix64(i.toLong * 7919 + n))
      keys.foreach(cf.insert)
      cf.delete(keys.head)
      // the head's fingerprint can survive only via collision with another key
      val collides = keys.tail.exists(k => cf.mightContain(keys.head) && k != keys.head)
      !cf.mightContain(keys.head) || collides
    })
  }
}
