package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library for the jobs-domain scalar transforms of the
  * reference (`/root/reference/src/utils.py`, `/root/reference/script.sql`).
  *
  * Everything here is pure Catalyst `Column` composition — no UDFs — so the
  * whole chain stays inside whole-stage codegen and filters on top of these
  * expressions still push down (SURVEY.md §4.3). All functions are
  * deterministic: every now()-anchored computation takes an injected anchor
  * column (SURVEY.md §7.4.3).
  *
  * Reference-bug policy (SURVEY.md §2.10): intended semantics, noted inline.
  */
object JobText {

  /** E1 — clean_title (`/root/reference/src/utils.py:8-16`).
    *
    * Extract the leading `[\w\s./-]+` run (with `/`/`-` continuations), trim,
    * keep the text before the first `" - "`. `(?U)` makes Java's `\w`/`\s`
    * Unicode-aware like Python's `re` (Vietnamese diacritics must match).
    * No-match fallback is the trimmed input.
    */
  def cleanTitle(title: Column): Column = {
    val rx = "(?U)([\\w\\s./-]+(?:\\s*(?:/|-)\\s*[\\w\\s./-]*)*)"
    val m = trim(regexp_extract(title, rx, 1))
    val base = when(m === "", trim(title)).otherwise(m)
    trim(element_at(split(base, " - "), 1))
  }

  /** E2 — clean_salary (`/root/reference/src/utils.py:18-35`) →
    * `struct(lo double, hi double, negotiable boolean)` in millions of VND.
    *
    *  - "usd"/"$": value × rate / 1e6; range iff "-" present and 2 numbers.
    *  - "triệu": values as-is; range hi uses the SECOND match (intended
    *    semantics — reference bug B1 reads `matches[0]` twice).
    *  - digits but unknown currency: null lo/hi (reference bug B2 returns
    *    Python None; we model it as a non-negotiable unparsed salary).
    *  - no digits: sentinel "Thỏa thuận" → (null, null, negotiable=true).
    */
  def cleanSalary(salary: Column, usdToVnd: Double = 23000d): Column = {
    val s = lower(trim(salary))
    val raw = regexp_extract_all(s, lit("[\\d,]+"), lit(0))
    val nums = transform(raw, x => regexp_replace(x, ",", "").cast("double"))
    val m0 = try_element_at(nums, lit(1))
    val m1 = try_element_at(nums, lit(2))
    val usd = s.contains("usd") || s.contains("$")
    val trieu = s.contains("triệu")
    val isRange = s.contains("-") && m1.isNotNull
    val toM = usdToVnd / 1e6
    val lo = when(usd, m0 * toM).when(trieu, m0)
    val hi = when(isRange, when(usd, m1 * toM).when(trieu, m1))
    val hasNum = size(raw) > 0
    struct(
      when(hasNum, lo).as("lo"),
      when(hasNum, hi).as("hi"),
      (size(raw) === 0).as("negotiable"))
  }

  /** E3 — transform_salary (`/root/reference/src/utils.py:37-41`): mean of
    * (lo, hi) when a range, else lo; null for negotiable/unparsed.
    */
  def salaryAvg(salaryStruct: Column): Column = {
    val lo = salaryStruct.getField("lo")
    val hi = salaryStruct.getField("hi")
    when(hi.isNotNull, (lo + hi) / 2).otherwise(lo)
  }

  /** E4 — caculate_seconds (`/root/reference/src/utils.py:54-60`): first
    * matching Vietnamese duration unit (ngày/giờ/phút/giây — reference dict
    * order) → total seconds. Unmatched text → null (reference bug B8 crashes
    * on TypeError; we propagate null).
    */
  def relativeSeconds(text: Column): Column = {
    val units = Seq("ngày" -> 86400L, "giờ" -> 3600L, "phút" -> 60L, "giây" -> 1L)
    units.foldRight(lit(null).cast("long")) { case ((unit, mult), acc) =>
      val d = regexp_extract(text, "(\\d+)\\s*" + unit, 1)
      when(d =!= "", d.cast("long") * mult).otherwise(acc)
    }
  }

  /** E4 — posted_date = anchor − Δ(update_text)
    * (`/root/reference/src/utils.py:62-71`). Null Δ → null timestamp. */
  def postedDate(anchor: Column, updateText: Column): Column =
    anchor - make_dt_interval(lit(0), lit(0), lit(0),
      relativeSeconds(updateText).cast("double"))

  /** E4 — due_date = anchor + Δ(deadline_text). */
  def dueDate(anchor: Column, deadlineText: Column): Column =
    anchor + make_dt_interval(lit(0), lit(0), lit(0),
      relativeSeconds(deadlineText).cast("double"))

  /** W1/E8–E10 — remaining-time formatter, the reference's stored procedure
    * (`/root/reference/script.sql:13-49`; intended semantics per
    * `/root/reference/README.md:19` — the proc as written has bug B5).
    *
    * The per-row UPDATE loop becomes one vectorized expression: bucket
    * `due − anchor` into giây/phút/giờ/ngày/expired and render the
    * Vietnamese countdown string.
    */
  def remainingTime(due: Column, anchor: Column): Column = {
    val secs = unix_timestamp(due.cast("timestamp")) -
      unix_timestamp(anchor.cast("timestamp"))
    def fmt(n: Column, unit: String): Column =
      concat(lit("Còn "), n.cast("string"), lit(" " + unit + " để ứng tuyển"))
    // null due (unparseable deadline, B8) hits the ELSE branch in the proc:
    // plpgsql `IF NULL > INTERVAL '0'` is not-true → expired
    when(secs.isNull || secs <= 0, lit("Đã hết thời gian ứng tuyển"))
      .when(secs < 60, fmt(secs, "giây"))
      .when(secs < 3600, fmt(floor(secs / 60), "phút"))
      .when(secs < 86400, fmt(floor(secs / 3600), "giờ"))
      .otherwise(fmt(floor(secs / 86400), "ngày"))
  }

  /** E6 — sentinel → NULL (`/root/reference/script.sql:1-4`). */
  def sentinelToNull(salary: Column, sentinel: String = "Thỏa thuận"): Column =
    when(salary === sentinel, lit(null)).otherwise(salary)

  /** E7 — text → numeric cast + round (`/root/reference/script.sql:6-10`). */
  def castSalary(salary: Column): Column = round(salary.cast("double"))
}
