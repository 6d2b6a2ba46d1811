package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Round-15 (r14 verdict #6): BenchFloorsSpec pins concrete ratchet cases;
  * these properties pin the ALGEBRA of the floor ratchet the way
  * CurationProps pins the gram-index merge — for arbitrary measurement
  * histories including crash rounds (-1.0 sentinels), the committed floors
  * must be a monotone non-increasing, sentinel-proof, order-insensitive
  * fold of the non-negative measurements. No Spark, no timing — pure
  * [[Bench.mergeFloors]] + the loadFloors negative-drop contract
  * (modelled as `filter(_ >= 0)`, which is exactly what loadFloors does). */
object BenchFloorProps extends Properties("graft.bench.floors") {

  private val key: Gen[String] = Gen.oneOf((1 to 8).map(i => s"q_$i"))

  /** One round's measurements: some keys, each either a real time or the
    * -1.0 crash sentinel. */
  private val measurementGen: Gen[Vector[(String, Double)]] =
    Gen.listOf(for {
      k <- key
      v <- Gen.frequency(
        4 -> Gen.chooseNum(0.001, 10.0),
        1 -> Gen.const(-1.0))
    } yield k -> v).map(_.distinctBy(_._1).toVector)

  private val floorsGen: Gen[Map[String, Double]] =
    Gen.mapOf(key.flatMap(k => Gen.chooseNum(0.001, 10.0).map(k -> _)))

  /** The cross-round round trip: merge this round's measurements into the
    * committed floors, then next round's loadFloors drops negatives. */
  private def roundTrip(floors: Map[String, Double],
                        measured: Vector[(String, Double)]): Map[String, Double] =
    (floors.toVector.filterNot { case (k, _) => measured.exists(_._1 == k) } ++
      Bench.mergeFloors(measured, floors)).toMap.filter(_._2 >= 0)

  property("merge is idempotent against the same floors") =
    Prop.forAll(measurementGen, floorsGen) { (m, f) =>
      val once = Bench.mergeFloors(m, f)
      Bench.mergeFloors(once, f) == once
    }

  property("floors are monotone non-increasing per key across any round") =
    Prop.forAll(measurementGen, floorsGen) { (m, f) =>
      val after = roundTrip(f, m)
      f.forall { case (k, v) => after.get(k).forall(_ <= v) }
    }

  property("a crash round never erases or inflates a committed floor") =
    Prop.forAll(floorsGen) { f =>
      val crashed = f.keys.toVector.map(_ -> -1.0)
      roundTrip(f, crashed) == f
    }

  property("merged floors never contain a negative for a key that ever had a committed floor") =
    Prop.forAll(measurementGen, floorsGen) { (m, f) =>
      Bench.mergeFloors(m, f).forall { case (k, v) => v >= 0 || !f.contains(k) }
    }

  property("two measurement rounds commute (final floors order-insensitive)") =
    Prop.forAll(measurementGen, measurementGen, floorsGen) { (m1, m2, f) =>
      roundTrip(roundTrip(f, m1), m2) == roundTrip(roundTrip(f, m2), m1)
    }

  property("fold over N rounds equals the min of all non-negative evidence per key") =
    Prop.forAll(Gen.listOfN(3, measurementGen), floorsGen) { (rounds, f) =>
      val folded = rounds.foldLeft(f)(roundTrip)
      val evidence = rounds.flatten.filter(_._2 >= 0)
        .groupMapReduce(_._1)(_._2)(math.min)
      val keys = f.keySet ++ rounds.flatten.map(_._1)
      keys.forall { k =>
        val want = (f.get(k).toSeq ++ evidence.get(k).toSeq).minOption
        folded.get(k) == want
      }
    }
}
