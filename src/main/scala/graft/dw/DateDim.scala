package graft.dw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date dimension attribute derivation.
  *
  * Reference behavior: `Full Load Scripts/dw_full_load2.py:41-57` — Python
  * `strftime`/`isoweekday`/`isocalendar`, i.e. ISO day-of-week (Mon=1) and
  * ISO week numbers. Spark's `dayofweek` is Sunday=1, so ISO day-of-week is
  * `weekday()+1`; `weekofyear` is already ISO 8601 (SURVEY §7.4.4).
  */
object DateDim {

  /** The 9 attribute expressions, given a date-typed column. */
  def attrs(d: Column): Seq[Column] = Seq(
    date_format(d, "yyyyMMdd").cast("int").as("ID_date_ID"),
    date_format(d, "yyyy-MM-dd").as("DT_date"),
    date_format(d, "EEEE").as("LB_DayOfWeek"),
    (weekday(d) + 1).as("ID_DayOfWeekNb"),
    weekofyear(d).as("ID_WeekNb"),
    date_format(d, "MMMM").as("LB_MonthName"),
    month(d).as("ID_MonthNb"),
    quarter(d).as("ID_Quarter"),
    year(d).as("ID_Year"))

  /** Distinct dates of `dateCol` → full date dimension
    * (`dw_full_load2.py:172-181`: distinct date parts, then formatted).
    */
  def build(src: DataFrame, dateCol: Column): DataFrame =
    src.select(dateCol.cast("date").as("_d")).distinct()
      .filter(col("_d").isNotNull)
      .select(attrs(col("_d")): _*)

  /** P13 — static category descriptions (`dw_full_load2.py:59-75`). */
  def depthDescription(name: Column): Column =
    when(name === "Shallow", "less than 70km")
      .when(name === "Intermediate", "between 70km and 300km")
      .when(name === "Deep", "more than 300km")
      .otherwise(concat(lit("Depth category: "), name))

  def magDescription(name: Column): Column =
    when(name === "Not Felt", "<3")
      .when(name === "Minor", "3 <=mag < 4")
      .when(name === "Light", "4 <=mag < 5")
      .when(name === "Moderate", "5 <=mag < 6")
      .when(name === "Strong", "6 <= mag < 7")
      .when(name === "Major", "7 <=mag < 8")
      .when(name === "Great", "8 <= mag")
      .otherwise(concat(lit("Magnitude category: "), name))
}
