package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaStub

/** The multimodal queries are rows-only at the driver (decode semantics
  * aren't SQL); these specs pin the plumbing contracts instead.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q66 emits one feature row per document, deterministically") {
    val a = Registry.queries("q66_media_decode")(spark, sf).collect()
    val b = Registry.queries("q66_media_decode")(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sf).count())
    assert(a.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64)) // width/height
  }

  test("q67 frame sampling: every doc contributes ceil(nFrames/2) rows, frame 0 always present") {
    val stub = new MediaStub
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("p"))
      .collect()
      .map(r => r.getLong(0) -> stub.decode(r.getAs[Array[Byte]](1)).nFrames)
      .toMap
    val frames = Registry.queries("q67_media_frames")(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet == expected.keySet)
    frames.foreach { case (id, rows) =>
      val idxs = rows.map(_.getInt(1)).sorted
      assert(idxs.head == 0, s"doc $id missing frame 0")
      assert(idxs.sameElements(0 until expected(id) by 2), s"doc $id")
      // thumbnail bounded by 32 on the long side, aspect preserved
      assert(rows.forall(r => math.max(r.getInt(2), r.getInt(3)) == 32))
    }
  }

  test("MediaStub.resize preserves orientation and bounds") {
    assert(new MediaStub().resize(640, 480, 32) == ((32, 24)))
    assert(new MediaStub().resize(480, 640, 32) == ((24, 32)))
    assert(new MediaStub().resize(4000, 10, 32) == ((32, 1))) // never 0
  }
}
