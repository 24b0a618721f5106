package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ManifestOpsSpec extends SparkSpec {

  import spark.implicits._

  /** Run a ScalaCheck property (bounded iterations: each case runs Spark
    * jobs) and assert it holds.
    */
  private def checkProp(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val stemGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
      .suchThat(_.nonEmpty)

  test("stem extraction inverts the three filename constructions (ScalaCheck)") {
    checkProp(Prop.forAll(stemGen, Gen.oneOf("png", "jpg", "jpeg")) {
      (stem, ext) =>
        val files = Seq(s"${stem}_person.$ext", s"${stem}_cloth_v2.$ext",
          s"${stem}_vton.$ext")
        val got = files.toDF("f").select(ManifestOps.stem(col("f")))
          .as[String].collect().toSet
        got == Set(stem)
    })
  }

  test("imageType routes the three roles") {
    val got = Seq("a_person.jpg", "a_cloth_front.jpg", "a_vton.png", "junk.txt")
      .toDF("f").select(ManifestOps.imageType(col("f"))).as[Option[String]]
      .collect().toSeq
    assert(got === Seq(Some("initial_image"), Some("cloth_image"),
      Some("try_on_image"), None))
  }

  test("difficulty defaults to easy like the reference") {
    val got = Seq("s3://b/easy/x", "s3://b/MEDIUM/x", "s3://b/hard/x", "s3://b/other/x")
      .map(p => s"$p/").toDF("p").select(ManifestOps.difficulty(col("p")))
      .as[String].collect().toSeq
    assert(got === Seq("easy", "medium", "hard", "easy"))
  }

  private def manifest(stems: Seq[String], dropRole: Map[String, Int]) = {
    val rows = for {
      stem <- stems
      (suffix, role) <- Seq("person" -> 0, "cloth_a" -> 1, "vton" -> 2)
      if !dropRole.get(stem).contains(role)
    } yield (stem, s"s3://b/easy/${stem}_$suffix.jpg")
    rows.toDF("s", "key")
      .withColumn("filename", ManifestOps.basename(col("key")))
      .withColumn("stem", ManifestOps.stem(col("filename")))
      .withColumn("image_type", ManifestOps.imageType(col("filename")))
      .select("stem", "image_type", "key")
  }

  test("complete ∪ incomplete = all stems, disjoint (ScalaCheck)") {
    checkProp(Prop.forAll(Gen.listOfN(8, stemGen).map(_.distinct),
      Gen.choose(0, 2)) { (stems, dropped) =>
      stems.isEmpty || {
        val drop = stems.take(dropped).map(_ -> 1).toMap
        val m = manifest(stems, drop)
        val complete = ManifestOps.tripletDiscovery(m).select("stem")
          .as[String].collect().toSet
        val incomplete = ManifestOps.incompleteStems(m)
          .as[String].collect().toSet
        (complete ++ incomplete) == stems.toSet &&
          (complete & incomplete).isEmpty &&
          incomplete == drop.keySet
      }
    }, n = 8)
  }

  test("tripletDiscovery picks the last-write-wins (max) key per role") {
    val m = Seq(
      ("s1", "initial_image", "a1"), ("s1", "initial_image", "a9"),
      ("s1", "cloth_image", "c1"), ("s1", "try_on_image", "t1"))
      .toDF("stem", "image_type", "key")
    val row = ManifestOps.tripletDiscovery(m).collect().head
    assert(row.getAs[String]("initial_image") === "a9")
  }

  test("pairsJoin fans out person/garment/composite assets") {
    val pairs = Seq(("1", "10"), ("2", "20")).toDF("person_id", "garment_id")
    val assets = Seq(
      ("person", "1", "p1.jpg"), ("person", "2", "p2.jpg"),
      ("garment", "10", "g10.jpg"),
      ("target", "1_10", "t.jpg"))
      .toDF("dir", "id", "key")
    val out = ManifestOps.pairsJoin(pairs, assets,
      Seq("person"), Seq("garment"), Seq("target"))
      .orderBy("person_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("person_key") === "p1.jpg")
    assert(out(0).getAs[String]("garment_key") === "g10.jpg")
    assert(out(0).getAs[String]("target_key") === "t.jpg")
    assert(out(1).getAs[String]("garment_key") === null)
  }
}
