package graft.ods

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlaceParserSpec extends SparkSpec {
  import spark.implicits._

  private lazy val states = spark.read.option("header", "true")
    .csv(resource("us_states.csv"))

  // FIXTURES.md §A.1 place-parser truth table
  private val cases = Seq(
    ("10km SSW of Idyllwild, CA", Some("California"), Some("USA")),
    ("5km N of Anchorage, Alaska", Some("Alaska"), Some("USA")),
    ("100 km SW of Tofino, Canada", Some("Tofino"), Some("Canada")),
    ("South Sandwich Islands region", Some("South Sandwich Islands region"), None),
    ("Fiji, Fiji Islands", Some("Fiji"), Some("Fiji Islands")),
    (null: String, None, None))

  test("P11/J2: place parser truth table") {
    val ods = cases.zipWithIndex
      .map { case ((p, _, _), i) => (i, p) }
      .toDF("i", "LB_place")
      .withColumn("LB_Region", lit(null).cast("string"))
      .withColumn("LB_Country", lit(null).cast("string"))
      .withColumn("_DT_insertion_date", lit(null).cast("timestamp"))
    val got = PlaceParser.parsePlaces(ods, states, java.sql.Timestamp.valueOf("2024-07-01 15:00:00"))
      .orderBy("i")
      .select($"LB_Region", $"LB_Country")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(got.toSeq === cases.map { case (_, reg, c) => (reg, c) })
  }

  test("P11: 'of' must be followed by whitespace and is found case-insensitively") {
    val df = Seq("Off coast OF Oregon, Canada", "Gulf stuff, Peru").toDF("p")
      .select(PlaceParser.regionExpr($"p", lit(null).cast("string")).as("r"),
        PlaceParser.countryExpr($"p", lit(null).cast("string")).as("c"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "Oregon")   // matches "OF " (ignore-case), not "Off"
    assert(rows(1).getString(0) === "Gulf stuff") // no "of " → whole left side
    assert(rows(1).getString(1) === "Peru")
  }

  test("J2: lookup keys include both full names and abbreviations") {
    val lk = PlaceParser.statesLookup(states)
    assert(lk.count() === 10)
    assert(lk.filter($"_state_key" === "TX").select("_state_name").as[String].head() === "Texas")
  }
}
