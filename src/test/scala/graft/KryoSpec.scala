package graft

import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer
import org.scalatest.funsuite.AnyFunSuite

import graft.transe.{TransETrainer, Triple}

/** Fail-loud gate for [[GraftKryo]]: a strict registrationRequired
  * KryoSerializer (no SparkContext needed) must round-trip every class
  * the training hot path serializes — model broadcasts, collected Deltas,
  * the re-layout shuffle of Triples, membership broadcasts. A class
  * missing from GraftKryo.classes fails HERE with a clear error instead
  * of silently shipping class names on every SGD round in production. */
class KryoSpec extends AnyFunSuite {

  private def strictInstance() = {
    val conf = new SparkConf(false)
      .set("spark.serializer", classOf[KryoSerializer].getName)
      .set("spark.kryo.registrator", classOf[GraftKryo].getName)
      .set("spark.kryo.registrationRequired", "true")
    new KryoSerializer(conf).newInstance()
  }

  test("hot-path classes round-trip under registrationRequired") {
    val ser = strictInstance()
    def roundTrip[T: scala.reflect.ClassTag](v: T): T =
      ser.deserialize[T](ser.serialize(v))

    // re-layout shuffle records
    assert(roundTrip(Triple(1, 2, 3)) == Triple(1, 2, 3))
    assert(roundTrip(Array(Triple(1, 2, 3))).head == Triple(1, 2, 3))

    // per-batch model broadcast: (entity, label) matrices
    val ent = Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    val got = roundTrip((ent, ent))
    assert(got._1(1)(0) == 3.0f && got._2(0)(1) == 2.0f)

    // collected SGD deltas
    val d = TransETrainer.Delta(0, Array(1, 2), Array(0.5f, 0.5f),
      Array(3), Array(0.25f), 1.25)
    val d2 = roundTrip(d)
    assert(d2.pid == 0 && d2.loss == 1.25 && d2.entVals.head == 0.5f)
    assert(roundTrip(Array(d)).head.loss == 1.25)

    // membership broadcasts
    assert(roundTrip(Array(1L, 2L, 3L)).toSeq == Seq(1L, 2L, 3L))
  }

  test("every class in GraftKryo.classes is instantiably registered") {
    // the registrator itself must not throw, and registration must cover
    // the declared list (strict Kryo rejects unregistered writes, so a
    // drifted list surfaces in the round-trip test above; this guards the
    // registrator wiring itself)
    val kryo = new com.esotericsoftware.kryo.Kryo()
    new GraftKryo().registerClasses(kryo)
    GraftKryo.classes.foreach { c =>
      assert(kryo.getClassResolver.getRegistration(c) != null,
        s"${c.getName} not registered")
    }
  }
}
