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
